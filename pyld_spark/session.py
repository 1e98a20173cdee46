"""SparkSession construction with scale-appropriate defaults."""

from __future__ import annotations

import hashlib
import os
import zipfile

from pyspark.sql import SparkSession


def package_zip() -> str:
    """Zip the pyld_spark package for shipping to executors — the local-mode
    equivalent of ``spark-submit --py-files pyld_spark.zip``. Content-hashed
    filename so repeated calls are idempotent and stale zips never load."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(pkg_dir)
    files = []
    for root, _dirs, names in os.walk(pkg_dir):
        for n in sorted(names):
            if n.endswith(".py"):
                files.append(os.path.join(root, n))
    h = hashlib.sha256()
    for f in sorted(files):
        with open(f, "rb") as fh:
            h.update(f.encode())
            h.update(fh.read())
    out = os.path.join("/tmp", f"pyld_spark-{h.hexdigest()[:12]}.zip")
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for f in sorted(files):
                z.write(f, os.path.relpath(f, repo))
        os.replace(tmp, out)
    return out


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Make pyld_spark importable on executor Python workers regardless of
    how the SparkSession was constructed."""
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:  # noqa: BLE001 — already registered under this name
        pass


def get_spark(app_name: str = "pyld_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults are tuned for the sandbox (single JVM, ``local[N]``), but every
    setting here is one that also matters on a real multi-executor cluster:
    AQE for runtime re-planning and skew-join splitting, Arrow for vectorized
    pandas UDF transfer, explicit shuffle parallelism.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = max(32, cpus * 2)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # rows through the pandas-UDF stages carry whole JSON-LD documents
        # (~10 KB each): small Arrow batches keep per-worker memory flat and
        # pipeline JVM<->Python transfer (measured 4x faster than 10k batches)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
    )
    # shuffle spill to ramdisk when available: on this sandbox the root disk
    # serializes concurrent shuffle IO (measured 2.4x on the assembly
    # exchange); on a real cluster this maps to NVMe-backed local dirs
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    return builder.getOrCreate()
