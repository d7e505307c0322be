"""Incremental streaming sinks: foreachBatch merge-upsert into a
versioned parquet target.

The reference's sink is upload-on-task-completion into a flat container
(``Program.cs:339-345``); its reduce slot is a user-pluggable
consolidation (``App.config:17``). The streaming engine's analog is
``foreachBatch``: arbitrary batch logic applied transactionally per
micro-batch — here, MERGE-by-argmax into a keyed target table, the
standard CDC/materialized-view maintenance pattern.

Scale notes: per batch, the work is one window argmax over the BATCH
(small by construction — micro-batches are bounded by trigger sizing)
plus one union+argmax against the target keyed state. On a table format
(Delta/Iceberg) the rewrite becomes a real MERGE INTO with file-level
pruning; on bare parquet we version directories and atomically advance a
pointer, which is exactly the commit-protocol shape those formats
implement properly. State per key is one row — bounded like q84's
sessionization state.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from azure_batch_map_reduce_spark.registry import query


def latest_per_user(df: DataFrame) -> DataFrame:
    """Argmax by (ts, event_id) per user — deterministic under any
    row order, so the merged result is independent of how the stream
    was split into micro-batches."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


@query(
    "q122_streaming_upsert",
    oracle="""
    SELECT user_id,
           event_type AS last_event_type,
           round(value, 2) AS last_value,
           ts AS last_ts
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id
            ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC
        ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    tags=("streaming", "sink", "upsert", "cdc"),
)
def q122_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming merge-upsert sink, run as a REAL stream: the events
    fixture is fragmented into 8 files, consumed one file per
    micro-batch (``maxFilesPerTrigger=1``), and each batch is MERGEd
    into a per-user latest-state table via ``foreachBatch`` —
    union + argmax, so a batch carrying older events than the current
    state never regresses it. After ``availableNow`` drains the
    source, the final state must equal the batch argmax over ALL
    events regardless of the file/batch split — which is exactly what
    the oracle checks."""
    import glob
    import os

    from azure_batch_map_reduce_spark.catalog import (
        align_session_for_oracle,
        normalize_event_ts,
    )

    align_session_for_oracle(spark)  # caller-owned sessions may be non-UTC
    d = tempfile.mkdtemp(prefix="abmr-stream-upsert-")
    src = os.path.join(d, "src")
    tgt = os.path.join(d, "target")

    # Fragment the fixture so availableNow yields MULTIPLE micro-batches.
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    raw.repartition(8).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream = normalize_event_ts(stream)

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        incoming = latest_per_user(batch)
        versions = sorted(glob.glob(f"{tgt}_v*"))
        if versions:
            current = batch.sparkSession.read.parquet(versions[-1])
            merged = latest_per_user(current.unionByName(incoming))
        else:
            merged = incoming
        # New version dir per commit: readers never see a half-written
        # overwrite (the bare-parquet stand-in for a table-format commit).
        merged.write.mode("errorifexists").parquet(f"{tgt}_v{batch_id:05d}")

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(d, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    final = sorted(glob.glob(f"{tgt}_v*"))[-1]
    return spark.read.parquet(final).select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 2).alias("last_value"),
        F.col("ts").alias("last_ts"),
    )
