"""Document chunking via a Python UDTF (table function).

The one LLM-pipeline operator that is genuinely one-row-in/many-rows-out
with per-row logic too stateful for ``explode``: split each document into
overlapping fixed-size token windows (the standard pre-training /
RAG-ingest chunker). Implemented as a registered Python UDTF
(Spark 3.5+/4.x) consumed through SQL ``LATERAL`` — the table-function
surface of SURVEY.md §2.2j, complementing ``mapInPandas``
(:mod:`.multimodal`) and ``rdd.pipe`` (:mod:`..plans.mapreduce`).

Scale notes: a UDTF runs row-parallel inside each task — no shuffle; the
LATERAL join is a per-partition flat-map, so chunking 100 TB is
embarrassingly parallel and the output inherits the input partitioning.
Chunk ids are per-document ordinals (deterministic), never global ids —
a global counter would serialize the pipeline.

Reference contract: the per-file map slot (``Program.cs:332-349``) is the
closest analog — an arbitrary per-record expansion; here it is typed,
vectorless, and optimizable instead of an opaque executable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import udtf

from azure_batch_map_reduce_spark.catalog import register_views
from azure_batch_map_reduce_spark.registry import query

CHUNK_SIZE, OVERLAP = 32, 8
STEP = CHUNK_SIZE - OVERLAP


@udtf(returnType="chunk_id int, chunk string, n_tokens int")
class ChunkText:
    """Yield overlapping word windows: start positions 0, STEP, 2·STEP, …
    each chunk is CHUNK_SIZE words (the trailing chunk may be shorter)."""

    def eval(self, text: str, size: int, overlap: int):
        if text is None:
            return
        words = text.split(" ")
        step = size - overlap
        for chunk_id, start in enumerate(range(0, len(words), step)):
            piece = words[start : start + size]
            yield chunk_id, " ".join(piece), len(piece)


def register_chunker(spark: SparkSession) -> None:
    spark.udtf.register("chunk_text", ChunkText)


@query(
    "q49_chunk_udtf",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    starts AS (
        SELECT doc_id, ws,
               unnest(generate_series(1, length(ws), {STEP})) AS start
        FROM w
    ),
    c AS (
        SELECT doc_id,
               CAST((start - 1) / {STEP} AS INT)                       AS chunk_id,
               array_to_string(ws[start:least(start + {CHUNK_SIZE - 1}, length(ws))], ' ')
                                                                       AS chunk,
               CAST(least({CHUNK_SIZE}, length(ws) - start + 1) AS INT) AS n_tokens
        FROM starts
    )
    SELECT doc_id, chunk_id, chunk, n_tokens FROM c
    """,
    tags=("udtf", "chunking", "text"),
)
def q49_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document into {CHUNK_SIZE}-word windows overlapping by
    {OVERLAP} via the registered UDTF in a LATERAL join; the oracle
    replays the same windowing with generate_series over the word list."""
    register_views(spark, sf_dir)
    register_chunker(spark)
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_id, c.chunk, c.n_tokens
        FROM documents d, LATERAL chunk_text(d.text, {CHUNK_SIZE}, {OVERLAP}) c
        """
    )
