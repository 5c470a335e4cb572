"""Command-line interface — the engine's analogue of the reference's
stdin verb REPL (/root/reference/src/node.go:59-233).

    python -m mapreduceproject_spark list
    python -m mapreduceproject_spark run word_count [--sf-dir DIR] [--limit N]
    python -m mapreduceproject_spark maple-juice --src 'DIR/*.txt' --dest OUT
    python -m mapreduceproject_spark store put|get|delete|ls|store ...

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


def cmd_maple_juice(args) -> int:
    from pyspark.sql import functions as F

    from mapreduceproject_spark.operators import mapreduce as mr

    spark = _spark(args.cpus)
    lines = mr.read_lines(spark, args.src)
    if args.maple_exe:
        kv = mr.maple_exe(lines, args.maple_exe, num_tasks=args.num_tasks)
    else:  # builtin word-count mapper
        kv = mr.maple(lines, lambda ln: ((w, "1") for w in ln.split()), num_tasks=args.num_tasks)
    if args.juice_exe:
        out = mr.juice_exe(kv, args.juice_exe, num_tasks=args.num_tasks)
    else:  # builtin line-count reducer (the reference's word-count exe)
        out = mr.juice_algebraic(kv, F.count("*").cast("string"), num_tasks=args.num_tasks)
    mr.write_kv_text(out, args.dest, single_file=args.single_file)
    print(f"wrote {args.dest}")
    return 0


def cmd_store(args) -> int:
    from mapreduceproject_spark.sources.store import SdfsStore, WriteConflict

    store = SdfsStore(args.root)
    verb = args.verb
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

    mj = sub.add_parser("maple-juice", help="run a maple+juice job")
    mj.add_argument("--src", required=True, help="input path/glob of text files")
    mj.add_argument("--dest", required=True, help="output dir (key SPACE value lines)")
    mj.add_argument("--maple-exe", default=None)
    mj.add_argument("--juice-exe", default=None)
    mj.add_argument("--num-tasks", type=int, default=None)
    mj.add_argument("--single-file", action="store_true")
    mj.add_argument("--cpus", default=None)

    stp = sub.add_parser("store", help="SDFS-verb catalog operations")
    stp.add_argument("root", help="store root directory")
    stp.add_argument("verb", choices=["put", "get", "delete", "ls", "store"])
    stp.add_argument("a", nargs="?", default=None)
    stp.add_argument("b", nargs="?", default=None)
    stp.add_argument("--force", action="store_true", help="override write-conflict window")

    args = p.parse_args(argv)
    return {"list": cmd_list, "run": cmd_run, "maple-juice": cmd_maple_juice, "store": cmd_store}[
        args.cmd
    ](args)


if __name__ == "__main__":
    sys.exit(main())
