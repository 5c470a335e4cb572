"""Pre-flight for the driver's correctness gate: run the first-N registry
window against the DuckDB oracles at the DRIVER's scale factor (sf0.01 —
tests/test_oracle_parity.py covers the full surface at sf0.001, but the
"auto" knobs resolve to different values per corpus size, so the window
deserves a check at the exact sf the driver uses).

Usage: python scripts/window_check.py [N|all] [sf_dir] [out.json]
       python scripts/window_check.py name1,name2,... [sf_dir] [out.json]
The first argument is either a window size (first-N registry entries in
driver order), the literal ``all`` (the full registered surface), or a
comma-separated list of registry names (targeted re-check after touching
specific queries).  Prints one line per query and a final summary; exit 1
on any mismatch or unknown name.  An optional third argument writes the
per-query results as a JSON artifact (committed under measurements/ as
the round's full-surface parity evidence — the driver's own window only
covers 50 entries per round)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "50"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from mapreduceproject_spark import plans
    from mapreduceproject_spark.oracle import check_query
    from mapreduceproject_spark.session import get_spark

    registered = list(plans.queries())
    if arg == "all":
        names = registered
    elif arg.isdigit():
        names = registered[: int(arg)]
    else:
        names = [n.strip() for n in arg.split(",") if n.strip()]
        unknown = [n for n in names if n not in registered]
        if unknown:
            sys.exit(f"unknown registry names: {unknown}")
    spark = get_spark(app_name="window_check")
    bad = []
    results: dict[str, dict] = {}
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        try:
            rep = check_query(spark, name, sf_dir)
            ok = rep.ok
            note = "" if ok else f" {rep.mismatches[:2]}"
        except Exception as e:  # a crash is a failure, not a stop
            ok, note = False, f" raised {e!r:.150}"
        if not ok:
            bad.append(name)
        dt = time.perf_counter() - t0
        results[name] = {"ok": ok, "seconds": round(dt, 2)}
        if note:
            results[name]["note"] = note.strip()
        print(
            f"[{i + 1:2}/{len(names)}] {'ok  ' if ok else 'FAIL'} "
            f"{name} ({dt:.1f}s){note}",
            flush=True,
        )
        spark.catalog.clearCache()
    print(f"window_check: {len(names) - len(bad)}/{len(names)} ok"
          + (f"; FAILED: {bad}" if bad else ""))
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_checked": len(names),
                    "n_ok": len(names) - len(bad),
                    "failed": bad,
                    "queries": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {out_path}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
