"""SparkSession factory.

Local-mode defaults are tuned for the test harness (local[N] on a
32-core box); the same builder settings are what we would ship to a
real cluster — AQE on (runtime partition coalescing + skew-join
handling), dynamic partition overwrite (idempotent per-partition
re-runs, SURVEY.md §2.6 O3/O4), Arrow for any pandas exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "de_project_airflow_etl_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster you would size this to ~2-3x total executor cores or simply
    let AQE coalesce from a higher initial number; locally a value that
    matches cores avoids tiny-partition overhead at test scale.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testdata events.parquet carries TIMESTAMP(NANOS); read as long,
        # tables.load converts to a microsecond timestamp (matching what
        # DuckDB's ns->us truncation yields for the oracle).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if os.path.isdir("/dev/shm"):
        # local-mode only: tmpfs-backed ephemeral checkpoints for
        # streaming queries that don't pass their own location. A real
        # cluster points this at durable storage (HDFS/S3) instead —
        # recoverability is the point of a checkpoint there.
        builder = builder.config(
            "spark.sql.streaming.checkpointLocation",
            f"/dev/shm/spark_graft_ckpt_{os.getpid()}")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
