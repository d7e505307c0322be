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


# --- q464: TABLE-argument UDTF (polymorphic per-partition analysis) -------


@udtf(returnType="source string, n_docs int, longest_inc_run int, n_runs int")
class SourceRunStats:
    """Per-partition table function: consumes one SOURCE's rows in
    doc_id order (Spark feeds partitions defined by the call site's
    ``PARTITION BY source ORDER BY doc_id``) and emits the longest
    strictly-increasing n_chars run plus the count of maximal runs —
    an ORDER-DEPENDENT per-group computation that exercises the
    table-argument contract: a fresh UDTF instance per partition,
    ``eval`` per row in order, ``terminate`` emitting the summary."""

    def __init__(self) -> None:
        self._source = None
        self._n = 0
        self._cur = 0
        self._longest = 0
        self._runs = 0
        self._prev = None

    def eval(self, row):
        self._source = row["source"]
        self._n += 1
        v = row["n_chars"]
        if self._prev is None or v <= self._prev:
            self._runs += 1
            self._cur = 1
        else:
            self._cur += 1
        self._longest = max(self._longest, self._cur)
        self._prev = v

    def terminate(self):
        if self._n:
            yield self._source, self._n, self._longest, self._runs


@query(
    "q464_table_argument_udtf",
    oracle="""
    WITH mark AS (
        SELECT source, doc_id, n_chars,
               CASE WHEN lag(n_chars) OVER w IS NULL
                         OR n_chars <= lag(n_chars) OVER w
                    THEN 1 ELSE 0 END AS brk
        FROM documents
        WINDOW w AS (PARTITION BY source ORDER BY doc_id)
    ),
    isl AS (
        SELECT source,
               sum(brk) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM mark
    ),
    sizes AS (
        SELECT source, island, count(*) AS sz FROM isl GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(sz) AS INTEGER) AS n_docs,
           CAST(max(sz) AS INTEGER) AS longest_inc_run,
           CAST(count(*) AS INTEGER) AS n_runs
    FROM sizes
    GROUP BY source
    ORDER BY source
    """,
    tags=("udtf", "table-argument", "partition-by", "source"),
)
def q464_table_argument_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE-ARGUMENT Python UDTF (Spark 4's polymorphic table
    function call: ``fn(TABLE(t) PARTITION BY k ORDER BY o)``) — the
    §2.2j row q49's scalar-argument LATERAL form doesn't cover: the
    engine hands the UDTF WHOLE PARTITIONS in a declared order, the
    user code holds per-partition state across ``eval`` calls and
    emits on ``terminate`` — the reference's pluggable reduce slot
    (``Program.cs:351-363``) with engine-managed partitioning instead
    of a hand-built gather. The statistic is deliberately
    ORDER-DEPENDENT (longest strictly-increasing n_chars run per
    source, plus the maximal-run count) so a broken ORDER BY or a
    partition split corrupts it immediately; the oracle recomputes it
    relationally as gaps-and-islands.

    Determinism: pure integer run accounting over a total
    (source, doc_id) order; ties in n_chars BREAK runs (strict
    increase) so no float or ordering ambiguity exists.

    Scale posture: partitions stream through the Python worker
    row-by-row with O(1) state per partition — no materialized
    per-group arrays; the PARTITION BY is one hash exchange (the same
    shuffle the relational form pays) and the result is
    source-grain. Reference contract: per-partition fold = reduce
    slot (``App.config:17``); the engine's partition feed replaces
    the hand-built SAS-splice gather (``Program.cs:365-378``)."""
    register_views(spark, sf_dir)
    spark.udtf.register("source_run_stats", SourceRunStats)
    return spark.sql(
        """
        SELECT * FROM source_run_stats(
            TABLE(documents) PARTITION BY source ORDER BY doc_id)
        ORDER BY source
        """
    )
