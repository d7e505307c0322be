"""SparkSession factory.

The reference's "session" is an Azure Batch job bound to a pool with task
dependencies enabled (``Program.cs:299-309``); here a session is a
SparkSession configured for correctness-vs-oracle (UTC timestamps, Arrow)
and for scale (AQE on, skew-join handling, sane shuffle parallelism).

Local testing runs ``local[N]`` in one JVM; the same configuration is what
we would ship to a 1000-executor cluster — partition/shuffle sizing is
driven by config, not code, so the plan shape survives the scale-up.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "azure-batch-map-reduce-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    Defaults follow ``$SPARK_GRAFT_CPUS`` (driver contract) for local
    parallelism. Shuffle partitions default to the core count: at local
    test scale 200 default partitions would be pure overhead, and on a
    real cluster AQE coalesces post-shuffle partitions anyway.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Correctness / oracle alignment: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas-UDF path and fast toPandas.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Adaptive execution: runtime re-planning, skew-join splitting,
        # post-shuffle coalescing — the 100 TB posture is config-driven.
        .config("spark.sql.adaptive.enabled", "true")
        # events.parquet stores ns-precision timestamps, which Spark 4
        # refuses by default; read as long and convert in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # µs timestamps with isAdjustedToUTC=false must read as plain
        # TimestampType (UTC instants), matching DuckDB's naive read —
        # not TIMESTAMP_NTZ (see catalog.normalize_event_ts).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Keep broadcast threshold at default 10MB; dimension tables
        # (region/nation/supplier/part at fixture SF) broadcast freely.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Quieter, faster local runs.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.pyspark.udf.simplifiedTraceback", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
