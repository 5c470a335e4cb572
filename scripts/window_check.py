"""Pre-flight for the driver's correctness gate: run the first-N registry
window against the DuckDB oracles at the DRIVER's scale factor (sf0.01 —
tests/test_oracle_parity.py covers the full surface at sf0.001, but the
"auto" knobs resolve to different values per corpus size, so the window
deserves a check at the exact sf the driver uses).

Usage: python scripts/window_check.py [N] [sf_dir]
       python scripts/window_check.py name1,name2,... [sf_dir]
The first argument is either a window size (first-N registry entries in
driver order) or a comma-separated list of registry names (targeted
re-check after touching specific queries).  Prints one line per query
and a final summary; exit 1 on any mismatch or unknown name.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "50"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from mapreduceproject_spark import plans
    from mapreduceproject_spark.oracle import check_query
    from mapreduceproject_spark.session import get_spark

    registered = list(plans.queries())
    if arg.isdigit():
        names = registered[: int(arg)]
    else:
        names = [n.strip() for n in arg.split(",") if n.strip()]
        unknown = [n for n in names if n not in registered]
        if unknown:
            sys.exit(f"unknown registry names: {unknown}")
    spark = get_spark(app_name="window_check")
    bad = []
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
        print(
            f"[{i + 1:2}/{len(names)}] {'ok  ' if ok else 'FAIL'} "
            f"{name} ({time.perf_counter() - t0:.1f}s){note}",
            flush=True,
        )
        spark.catalog.clearCache()
    print(f"window_check: {len(names) - len(bad)}/{len(names)} ok"
          + (f"; FAILED: {bad}" if bad else ""))
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
