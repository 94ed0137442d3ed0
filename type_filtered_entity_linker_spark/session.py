"""SparkSession factory with the scale-hygiene defaults this engine
assumes everywhere: AQE (runtime re-plan + skew-join splitting), Arrow
for pandas UDFs, and bounded shuffle partitioning.

On a real cluster this module is the single place to attach the
Iceberg runtime (``spark.jars.packages=org.apache.iceberg:...`` +
catalog conf). The sandbox has no Iceberg jar (SURVEY.md §7.0), so
``sources.tableio`` provides the same checkpoint/lineage contract over
Parquet + JSON manifests.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def spark_session(
    app_name: str = "type-filtered-entity-linker-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    inherit_cluster_conf: bool = False,
) -> SparkSession:
    """``inherit_cluster_conf=True`` (job entry points run via
    spark-submit): do NOT set master or driver memory — builder-level
    values would override the submitted ``--master``/``--driver-memory``
    and silently run the whole job local[N] inside the driver. A bare
    ``getOrCreate()`` inherits the submitted conf, and falls back to
    local[*] for standalone ``python -m`` invocations (verified both
    ways)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if not inherit_cluster_conf:
        master = master or f"local[{cpus}]"
    if shuffle_partitions is None and not inherit_cluster_conf:
        # local mode: ~1x cores; on a cluster this should be
        # 2-3x total executor cores (AQE coalesces small partitions).
        # Under inherit_cluster_conf the default stays UNSET: builder
        # conf overrides spark-submit --conf, so sizing it here would
        # cap every shuffle on a real cluster at this local guess
        # (AQE can coalesce but never split). Callers that really want
        # a specific value pass it explicitly.
        n = (
            master[len("local[") : -1]
            if master and master.startswith("local[")
            else str(cpus)
        )
        shuffle_partitions = cpus if n == "*" else int(n)
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    if shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: ALL concurrent tasks share this one JVM heap —
        # size it for the task count or 32-way runs spill/GC-thrash
        .config("spark.ui.enabled", "false")
    )
    if not inherit_cluster_conf:
        # static confs, only meaningful when THIS process launches the
        # JVM (under spark-submit they're set by --driver-memory etc.)
        b = b.config(
            "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g")
        )
        # shuffle/spill to tmpfs: 32 concurrent shuffle writers on the
        # VM's ext4 disk serialize on writeback (measured 10x cold-run
        # penalty at local[32]); on a real cluster this is NVMe-backed
        # spark.local.dir per executor
        b = b.config(
            "spark.local.dir",
            os.environ.get("SPARK_LOCAL_DIR", "/dev/shm/spark-local"),
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
