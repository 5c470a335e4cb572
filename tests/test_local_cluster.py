"""Multi-JVM execution proof: local-cluster mode spawns REAL separate
worker JVMs (own executors, own Python workers) — unlike local[n], which
runs everything in-process.  A query that shuffles and a query whose
kernel is Arrow-batched Python both completing here proves the package's
executor self-containment story (bootstrap.py zip + addPyFile): the same
code runs on an actual multi-node cluster, README "workers are
self-contained" made testable."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from mapreduceproject_spark.session import get_spark
from mapreduceproject_spark.plans import QUERIES
spark = get_spark(app_name="lc-test", master="local-cluster[2,2,2048]")
shuffle_rows = QUERIES["word_count"](spark, {sf!r}).limit(5).collect()
arrow_rows = QUERIES["mm_feature_extract"](spark, {sf!r}).limit(3).collect()
execs = spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
print("RESULT", len(shuffle_rows), len(arrow_rows), len(execs))
spark.stop()
"""


def test_queries_run_on_separate_worker_jvms(sf_dir):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=str(REPO), sf=sf_dir)],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT"))
    _, n_shuffle, n_arrow, n_execs = line.split()
    assert int(n_shuffle) == 5 and int(n_arrow) == 3
    # driver + 2 workers => at least 3 executor infos
    assert int(n_execs) >= 3, f"expected separate worker JVMs, saw {n_execs}"
