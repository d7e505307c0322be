"""Fixture catalog: load the TPC-H-ish tables from an sf directory.

The reference's "catalog" is App.config appSettings naming containers and
directories (``App.config:4-23``, loaded ``Program.cs:44-61``); here the
catalog is the set of parquet tables under one scale-factor directory
(see TESTDATA.md / FIXTURES.md), registered as temp views so both the
DataFrame API and ``spark.sql`` can reach them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def scratch_dir(prefix: str) -> str:
    """A scratch directory whose removal is REGISTERED at creation
    (atexit), for operators that must return a LAZY frame still
    reading from it — round-trip sinks, versioned stream-upsert
    ledgers — and therefore can't rmtree inline the way q402/q405/q406
    do after materializing. Before this helper those sites leaked one
    dir per run into $TMPDIR (~680 dirs across six rounds of
    differential sweeps); now every scratch tree dies with the
    process while staying readable for the process's whole life."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def ensure_nanos_readable(spark: SparkSession) -> None:
    """events.parquet stores ns-precision INT64 timestamps, which Spark 4
    refuses outright unless ``nanosAsLong`` is on. Our session factory
    sets it at build time, but the catalog must also work under a
    CALLER-OWNED session (the driver contract hands us one) — the conf is
    runtime-settable, so set it defensively here."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # read-only conf on some runtimes; the factory already set it


def align_session_for_oracle(spark: SparkSession) -> None:
    """Runtime-settable confs the oracle parity depends on, applied
    defensively for caller-owned sessions: UTC session timezone (DuckDB
    timestamps are UTC-naive — a local-TZ session would shift every
    collected timestamp by the UTC offset) and ns-as-long parquet reads
    (see :func:`ensure_nanos_readable`)."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    try:
        # Parquet µs timestamps with isAdjustedToUTC=false would otherwise
        # infer as TIMESTAMP_NTZ, which unix_micros/window functions reject
        # and which diverges from DuckDB's naive-UTC read. Read them as
        # plain TimestampType (UTC instants) instead.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    try:
        # Keep ranks.bounded_order's declared constant partition key
        # (see session.py) under caller-owned sessions too — purely a
        # warning-hygiene conf, values are identical either way.
        spark.conf.set(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.EliminateWindowPartitions",
        )
    except Exception:
        pass
    ensure_nanos_readable(spark)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events timestamp to µs ``TimestampType`` (UTC
    instant) whatever physical shape the fixture generation produced:

    - ns-precision INT64 (+ ``nanosAsLong``) reads as LongType nanos →
      integer-divide to µs (float division would round-to-nearest and
      drift ±1µs off DuckDB's truncation);
    - µs with ``isAdjustedToUTC=false`` may infer as TIMESTAMP_NTZ under
      caller-owned sessions that captured the inference conf before we
      could flip it — the stored wall-clock IS the UTC instant, so
      ``to_utc_timestamp(ts, 'UTC')`` relabels it without shifting
      (a bare cast would re-interpret in session-local time).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn(col, F.expr(f"to_utc_timestamp({col}, 'UTC')"))
    return df


def _load_one(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    align_session_for_oracle(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_event_ts(df)
    return df


# (session, sf_dir) → (session ref, tables). Building a parquet
# DataFrame costs ~75 ms of driver-side setup (file listing + footer
# schema read) per table; re-resolving all 10 tables on every query
# invocation would tax each query ~0.8 s that has nothing to do with its
# plan. DataFrames are immutable logical plans, so reuse is safe. The
# session object is held strongly in the value so a dead session's id()
# can't be recycled into a false cache hit. The cached plan pins the
# file listing — call :func:`clear_table_cache` after rewriting fixture
# files in place.
_TABLE_CACHE: dict[tuple[int, str], tuple[SparkSession, dict[str, DataFrame]]] = {}


def clear_table_cache() -> None:
    _TABLE_CACHE.clear()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a DataFrame (lazy parquet scans),
    memoized per (session, sf_dir)."""
    key = (id(spark), os.path.abspath(sf_dir))
    hit = _TABLE_CACHE.get(key)
    if hit is None:
        hit = (spark, {name: _load_one(spark, sf_dir, name) for name in TABLES})
        _TABLE_CACHE[key] = hit
    else:
        # Still re-assert the runtime confs: a caller-owned session may
        # have flipped timezone/parquet confs between queries.
        align_session_for_oracle(spark)
    return dict(hit[1])


def rebalance_for_cpu(df: DataFrame, min_ratio: float = 0.5) -> DataFrame:
    """Round-robin-repartition a PROJECTED (narrow) frame to the core
    count when its scan under-provisions the CPUs — only then.

    Why: per-row hash/digest work (CMS/HLL/MinHash) is compute-bound,
    and Spark's scan parallelism is capped by input-split structure —
    a single-row-group parquet file (exactly what the fixtures are,
    and a real hazard in lakes written by one-shot jobs) yields ONE
    productive task no matter how small ``maxPartitionBytes`` goes, so
    31 of 32 local cores idle through the hash stage. The gate keeps
    the exchange out of well-split inputs: at cluster scale input
    splits ≫ cores and this is a no-op decision, not a corpus shuffle.
    Callers must project down to the needed columns FIRST so the
    rebalanced payload is bytes-per-row-minimal (the exchange then
    costs less than the digests it parallelizes)."""
    sess = df.sparkSession
    cores = sess.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1, int(cores * min_ratio)):
        return df
    return df.repartition(cores)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view named after the table."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
