"""Spark 4 Python Data Source API — a user-defined source as a
first-class scan node.

The reference's only extension point is a pluggable EXECUTABLE per file
(``App.config:16-17``); its "source" is whatever bytes those programs
read. Spark 4's Python Data Source API is the engine-native form of
that pluggability on the SCAN side: a pure-Python class declares the
schema, plans input partitions, and streams Arrow record batches from
inside the executors — with predicate pushdown crossing the Python
boundary (``pushFilters``, Spark 4.1). This module implements one such
source over the documents fixture and registers q428 as its verified
scan: the differential proves a user-defined Python source produces
byte-identical relational results to the built-in parquet reader.

Scale posture: ``partitions()`` plans ONE partition per parquet row
group (the same split unit the native reader uses), so executor
parallelism scales with the file layout, and ``read()`` yields Arrow
batches (zero-copy into Spark's columnar pipeline — never per-row
Python tuples). Supported filters are applied INSIDE the source via
pyarrow compute before rows ever reach the JVM.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
)

from azure_batch_map_reduce_spark.registry import query

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

_DOCS_SCHEMA = "doc_id bigint, lang string, source string, n_chars bigint"
_DOCS_COLUMNS = ["doc_id", "lang", "source", "n_chars"]


class DocumentsMetaSource(DataSource):
    """Python data source exposing the documents table's metadata
    columns (everything but the text payload) via pyarrow.

    Registered under the short name ``abmr_docs_meta``; the one
    required option is ``path`` (the parquet file to serve).
    """

    @classmethod
    def name(cls) -> str:
        return "abmr_docs_meta"

    def schema(self) -> str:
        return _DOCS_SCHEMA

    def reader(self, schema) -> "DocumentsMetaReader":
        return DocumentsMetaReader(self.options)


class DocumentsMetaReader(DataSourceReader):
    """Row-group-partitioned reader with EqualTo pushdown on the
    string columns.

    ``pushFilters`` accepts ``EqualTo`` on ``lang``/``source`` and
    keeps them on ``self`` (the API contract: mutations here are
    visible to ``partitions()``/``read()``); everything else is
    returned for Spark to evaluate above the scan. ``read()`` applies
    the accepted filters with pyarrow compute, so filtered rows never
    cross into the JVM — the Python-source analog of parquet
    PushedFilters.
    """

    def __init__(self, options) -> None:
        self._path = options["path"]
        self._pushed: list[tuple[str, object]] = []

    def pushFilters(self, filters):  # noqa: N802 (API name)
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute in (
                ("lang",),
                ("source",),
            ):
                self._pushed.append((f.attribute[0], f.value))
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self._path).metadata.num_row_groups
        return [InputPartition(i) for i in range(max(1, n))]

    def read(self, partition: InputPartition) -> Iterator["pa.RecordBatch"]:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(self._path)
        tbl = pf.read_row_group(partition.value, columns=_DOCS_COLUMNS)
        for col, val in self._pushed:
            tbl = tbl.filter(pc.equal(tbl[col], val))
        yield from tbl.to_batches()


@query(
    "q428_python_datasource_scan",
    oracle="""
    SELECT lang,
           source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM documents
    WHERE source = 'src1' AND lang <> 'zh'
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    tags=("source", "python-datasource", "arrow", "pushdown"),
)
def q428_python_datasource_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """User-defined PYTHON data source on the verified path — the
    source-matrix row beside parquet/CSV/JSON/ORC/XML/binaryFile
    (q96/q97/q39/q408/q90) that no built-in covers: the scan itself is
    user code (Spark 4's Python Data Source API), planned into one
    input partition per parquet row group and streamed to the JVM as
    Arrow record batches (never per-row tuples). ``EqualTo`` predicates
    on the string columns push INTO the source (``pushFilters``, 4.1)
    and are applied with pyarrow compute before rows cross the
    boundary; the query's conjunction splits exactly there:
    ``source = 'src1'`` pushes into pyarrow, ``lang <> 'zh'`` stays
    residual above the scan — both routes exercised in one plan
    (pinned in tests/test_plans.py). The differential
    proves the whole arrangement returns byte-identical results to
    DuckDB reading the same file natively.

    Determinism: pure relational math over exact integers.

    Scale posture: partition planning follows the file's row-group
    layout (the native reader's split unit), so a 100 TB directory
    fans out identically; Arrow batches keep the Python crossing
    columnar; pushed filters cut the transfer before it happens.
    The aggregation is one partial+final rollup on a 10-cell grain.
    Reference contract: the pluggable scan IS the map slot
    (``App.config:16``, per-file fan-out ``Program.cs:332-349``);
    rollup = reduce slot (``App.config:17``)."""
    # Runtime-settable planner flag (verified): without it Spark 4.1
    # REFUSES any reader that implements pushFilters. Set here (not
    # only in the session factory) so caller-owned sessions — the
    # driver's — plan the pushdown too.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(DocumentsMetaSource)
    df = (
        spark.read.format("abmr_docs_meta")
        .option("path", f"{sf_dir}/documents.parquet")
        .load()
    )
    return (
        df.where((F.col("source") == "src1") & (F.col("lang") != "zh"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("lang", "source")
    )
