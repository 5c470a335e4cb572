"""Ship this package to Spark Python workers.

Queries that cross into Python on executors (mapInPandas kernels,
applyInPandas reducers) need ``mapreduceproject_spark`` importable in the
*worker* interpreter, not just the driver.  The driver harness loads
``__spark_entry__.py`` by file path from an arbitrary cwd, so workers
can't rely on cwd-relative imports — instead we zip the package once and
``sc.addPyFile`` it, which distributes the zip and puts it on every
worker's sys.path (works identically on a real cluster, where workers are
remote JVMs with no shared filesystem).
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_DONE: set[str] = set()


def ensure_worker_imports(spark: SparkSession) -> None:
    """Idempotently attach this package as a pyfile to the session."""
    sc = spark.sparkContext
    # key on applicationId, not id(sc): after stop()+rebuild in the same
    # process CPython can hand the new context a recycled object address,
    # which would silently skip addPyFile and strand every Arrow-kernel
    # query on workers with ModuleNotFoundError.  applicationId is unique
    # per context (local-<epoch-ms> locally, cluster-assigned on YARN/k8s).
    key = sc.applicationId
    if key in _DONE:
        return
    pkg_root = Path(__file__).resolve().parent
    zip_path = Path(tempfile.gettempdir()) / f"mapreduceproject_spark_{os.getpid()}.zip"
    if not zip_path.exists():
        with zipfile.ZipFile(zip_path, "w") as zf:
            for py in sorted(pkg_root.rglob("*.py")):
                zf.write(py, arcname=str(py.relative_to(pkg_root.parent)))
    sc.addPyFile(str(zip_path))
    _DONE.add(key)
