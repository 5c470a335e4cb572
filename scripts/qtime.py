"""Micro-bench individual registry queries: wall-clock per query with the
bench's exact methodology (warm session, noop sink, min over N passes).

Usage: python scripts/qtime.py name1,name2,... [passes] [sf_dir]

Prints one line per query: min / all-pass timings.  The session mirrors
bench.py (same get_spark + warmup) so numbers are comparable to the
bench artifact, without paying a 195-query sweep to probe one operator.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from mapreduceproject_spark import plans
    from mapreduceproject_spark.session import get_spark

    spark = get_spark(app_name="qtime", master=f"local[{cpus}]")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        fn = plans.QUERIES[name]
        ts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: min={min(ts)}  passes={ts}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
