"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`azure_batch_map_reduce_spark.registry` — every engine
operator registers itself there with a PySpark builder and (when
SQL-expressible) a DuckDB oracle; this module just exposes the registry in
the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from azure_batch_map_reduce_spark.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    registry = load_all()
    return registry["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; rows-only checks omit their entry."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
