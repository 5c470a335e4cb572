"""Command-line interface — the engine's analogue of the reference's
stdin verb REPL (/root/reference/src/node.go:59-233).

    python -m mapreduceproject_spark list
    python -m mapreduceproject_spark run word_count [--sf-dir DIR] [--limit N]
    python -m mapreduceproject_spark maple-juice --src 'DIR/*.txt' --dest OUT
    python -m mapreduceproject_spark maple --src 'DIR/*.txt' --prefix INT
    python -m mapreduceproject_spark juice --prefix INT --dest OUT --delete-input 1
    python -m mapreduceproject_spark list-nodes
    python -m mapreduceproject_spark ping
    python -m mapreduceproject_spark store ROOT put|get|delete|ls|store [a] [b]

Where the reference's verbs talked to a hand-rolled master, these drive
Spark plans; the store verbs operate the SdfsStore catalog directly.
"""

from __future__ import annotations

import argparse
import sys


def _spark(cpus: str | None = None):
    from mapreduceproject_spark.session import get_spark

    return get_spark(app_name="mapreduceproject-cli", master=f"local[{cpus}]" if cpus else None)


def cmd_list(_args) -> int:
    from mapreduceproject_spark import plans

    for name in sorted(plans.QUERIES):
        tag = "oracle" if name in plans.ORACLES else "rows-only"
        print(f"{name:32s} [{tag}]")
    return 0


def cmd_run(args) -> int:
    from mapreduceproject_spark import plans

    if args.query not in plans.QUERIES:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    spark = _spark(args.cpus)
    df = plans.QUERIES[args.query](spark, args.sf_dir)
    df.show(args.limit, truncate=False)
    return 0


def cmd_explain(args) -> int:
    """Print a registered query's optimized + physical plan — the
    plan-inspection surface (`EXPLAIN` verb) the reference's opaque
    maple/juice pipeline never had."""
    from mapreduceproject_spark import plans

    if args.query not in plans.QUERIES:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    spark = _spark(args.cpus)
    df = plans.QUERIES[args.query](spark, args.sf_dir)
    df.explain(mode=args.mode)
    return 0


def cmd_parity(args) -> int:
    """Run one registered query against its DuckDB oracle and report the
    driver-style verdict (row count + schema + order-insensitive value
    hash) — the dev loop for adding or changing a query."""
    from mapreduceproject_spark import plans
    from mapreduceproject_spark.oracle import check_query

    if args.query not in plans.QUERIES:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    spark = _spark(args.cpus)
    rep = check_query(spark, args.query, args.sf_dir)
    status = "MATCH" if rep.ok else "MISMATCH"
    print(f"{args.query}: {status} (spark_rows={rep.spark_rows} oracle_rows={rep.oracle_rows})")
    for m in rep.mismatches:
        print(f"  {m}")
    return 0 if rep.ok else 1


def cmd_maple_juice(args) -> int:
    from pyspark.sql import functions as F

    from mapreduceproject_spark.operators import mapreduce as mr

    spark = _spark(args.cpus)
    lines = mr.read_lines(spark, args.src)
    if args.maple_exe:
        kv = mr.maple_exe(lines, args.maple_exe, num_tasks=args.num_tasks)
    else:  # builtin word-count mapper
        kv = mr.maple(lines, mr.wordcount_mapper, num_tasks=args.num_tasks)
    if args.juice_exe:
        out = mr.juice_exe(kv, args.juice_exe, num_tasks=args.num_tasks)
    else:  # builtin line-count reducer (the reference's word-count exe)
        out = mr.juice_algebraic(kv, F.count("*").cast("string"), num_tasks=args.num_tasks)
    mr.write_kv_text(out, args.dest, single_file=args.single_file)
    print(f"wrote {args.dest}")
    return 0


def cmd_maple(args) -> int:
    """Standalone maple: map src lines to a ``key value`` intermediate
    prefix directory (the reference's `maple <exe> <num_maples>
    <sdfs_intermediate_filename_prefix> <sdfs_src_directory>`)."""
    from mapreduceproject_spark.operators import mapreduce as mr

    spark = _spark(args.cpus)
    lines = mr.read_lines(spark, args.src)
    if args.exe:
        kv = mr.maple_exe(lines, args.exe, num_tasks=args.num_tasks)
    else:  # builtin word-count mapper
        kv = mr.maple(
            lines, mr.wordcount_mapper, num_tasks=args.num_tasks
        )
    mr.write_kv_text(kv, args.prefix)
    print(f"wrote intermediate prefix {args.prefix}")
    return 0


def cmd_juice(args) -> int:
    """Standalone juice over an intermediate prefix — the reference's
    `juice <exe> <num_juices> <prefix> <dest> delete_input={0,1}`."""
    from mapreduceproject_spark.operators import mapreduce as mr

    spark = _spark(args.cpus)
    mr.run_juice_job(
        spark,
        args.prefix,
        args.dest,
        exe=args.exe,
        num_tasks=args.num_tasks,
        delete_input=bool(args.delete_input),
        single_file=args.single_file,
    )
    print(f"wrote {args.dest}" + (" (intermediates deleted)" if args.delete_input else ""))
    return 0


def cmd_list_nodes(args) -> int:
    """Membership introspection — the engine's analogue of the reference's
    List/Self membership verbs (/root/reference/README.md:17).  Spark's
    runtime owns membership (SURVEY §2.5), so this surfaces what the
    scheduler actually sees via sc.statusTracker + executor infos."""
    spark = _spark(args.cpus)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    infos = sc._jsc.sc().statusTracker().getExecutorInfos()
    print(
        f"self: appId={sc.applicationId} master={sc.master} "
        f"parallelism={sc.defaultParallelism}"
    )
    for info in infos:
        print(
            f"node host={info.host()} port={info.port()} "
            f"running_tasks={info.numRunningTasks()} cache_bytes={info.cacheSize()}"
        )
    print(f"active_jobs={len(tracker.getActiveJobsIds())} active_stages={len(tracker.getActiveStageIds())}")
    return 0


def cmd_ping(args) -> int:
    """Liveness probe — the reference's ping membership verb
    (/root/reference/README.md:17).  There a UDP round-trip to a peer;
    here a minimal end-to-end scheduler round-trip (one 1-row job), which
    is the meaningful liveness check for a Spark deployment: it proves
    driver, scheduler and at least one executor slot are all responsive.
    """
    import time

    spark = _spark(args.cpus)
    sc = spark.sparkContext
    t0 = time.perf_counter()
    n = spark.range(1).count()
    ms = (time.perf_counter() - t0) * 1000.0
    ok = n == 1
    print(f"ping {'ok' if ok else 'FAILED'} appId={sc.applicationId} rtt_ms={ms:.1f}")
    return 0 if ok else 1


def cmd_store(args) -> int:
    from mapreduceproject_spark.sources.store import SdfsStore, WriteConflict

    store = SdfsStore(args.root)
    verb = args.verb
    # per-verb operand validation: a missing positional otherwise reaches
    # shutil/Path with None and dies in a raw traceback instead of the
    # argparse-style usage error every other subcommand gives
    needed = {"put": 2, "get": 2, "delete": 1, "ls": 1, "store": 0}[verb]
    got = sum(x is not None for x in (args.a, args.b))
    if got < needed:
        print(
            f"store {verb}: expected {needed} operand(s) "
            f"(put/get take <sdfsname> <localname>; delete/ls take <name>)",
            file=sys.stderr,
        )
        return 2
    if verb == "put":  # reference arg order: PUT <sdfsname> <localname>
        try:
            store.put(args.b, args.a)
        except WriteConflict as wc:
            if not args.force:
                print(f"{wc} (pass --force to confirm)", file=sys.stderr)
                return 1
            store.put(args.b, args.a, confirm=wc.token)
    elif verb == "get":  # GET <sdfsname> <localname>
        store.get(args.a, args.b)
    elif verb == "delete":
        store.delete(args.a)
    elif verb == "ls":
        print("\n".join(store.ls(args.a)))
    elif verb == "store":
        print("\n".join(store.store()))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mapreduceproject_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    runp = sub.add_parser("run", help="run a registered query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--cpus", default=None)

    exp = sub.add_parser("explain", help="print a registered query's plan")
    exp.add_argument("query")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    exp.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "codegen", "cost", "formatted"],
    )
    exp.add_argument("--cpus", default=None)

    par = sub.add_parser("parity", help="run a query against its DuckDB oracle")
    par.add_argument("query")
    par.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    par.add_argument("--cpus", default=None)

    mj = sub.add_parser("maple-juice", help="run a maple+juice job")
    mj.add_argument("--src", required=True, help="input path/glob of text files")
    mj.add_argument("--dest", required=True, help="output dir (key SPACE value lines)")
    mj.add_argument("--maple-exe", default=None)
    mj.add_argument("--juice-exe", default=None)
    mj.add_argument("--num-tasks", type=int, default=None)
    mj.add_argument("--single-file", action="store_true")
    mj.add_argument("--cpus", default=None)

    mp = sub.add_parser("maple", help="standalone maple: src lines -> kv intermediate prefix")
    mp.add_argument("--src", required=True, help="input path/glob of text files")
    mp.add_argument("--prefix", required=True, help="intermediate output dir (key SPACE value lines)")
    mp.add_argument("--exe", default=None, help="mapper executable (argv = input file)")
    mp.add_argument("--num-tasks", type=int, default=None)
    mp.add_argument("--cpus", default=None)

    jp = sub.add_parser("juice", help="standalone juice: kv intermediate prefix -> dest")
    jp.add_argument("--prefix", required=True, help="intermediate path/glob/dir of kv files")
    jp.add_argument("--dest", required=True, help="output dir (key SPACE value lines)")
    jp.add_argument("--exe", default=None, help="reducer executable (argv = key-group file)")
    jp.add_argument("--num-tasks", type=int, default=None)
    jp.add_argument(
        "--delete-input", type=int, choices=[0, 1], default=0,
        help="1 = delete the intermediate prefix files after the result is written",
    )
    jp.add_argument("--single-file", action="store_true")
    jp.add_argument("--cpus", default=None)

    sub.add_parser("list-nodes", help="membership introspection (executors via statusTracker)").add_argument(
        "--cpus", default=None
    )

    sub.add_parser("ping", help="liveness probe (1-row scheduler round-trip)").add_argument(
        "--cpus", default=None
    )

    stp = sub.add_parser("store", help="SDFS-verb catalog operations")
    stp.add_argument("root", help="store root directory")
    stp.add_argument("verb", choices=["put", "get", "delete", "ls", "store"])
    stp.add_argument("a", nargs="?", default=None)
    stp.add_argument("b", nargs="?", default=None)
    stp.add_argument("--force", action="store_true", help="override write-conflict window")

    args = p.parse_args(argv)
    return {
        "list": cmd_list,
        "run": cmd_run,
        "explain": cmd_explain,
        "parity": cmd_parity,
        "maple-juice": cmd_maple_juice,
        "maple": cmd_maple,
        "juice": cmd_juice,
        "list-nodes": cmd_list_nodes,
        "ping": cmd_ping,
        "store": cmd_store,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
