"""Dump .explain('formatted') for registry queries to plans/<round>/ files.

Usage: python scripts/explain_dump.py name1,name2,... suffix [sf_dir] [round_dir]

Writes plans/<round_dir>/<name>_<suffix>.txt per query (suffix: before|after;
round_dir defaults to r11).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    suffix = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    round_dir = sys.argv[4] if len(sys.argv) > 4 else "r11"

    from mapreduceproject_spark import plans
    from mapreduceproject_spark.session import get_spark

    out_dir = Path(__file__).resolve().parent.parent / "plans" / round_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="explain_dump")
    for name in names:
        df = plans.QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(txt)
        print(
            f"wrote plans/{round_dir}/{name}_{suffix}.txt ({len(txt)} chars)",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
