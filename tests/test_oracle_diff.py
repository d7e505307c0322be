"""Differential test: every registered query with an oracle must match
DuckDB at sf0.001 — the local mirror of the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from azure_batch_map_reduce_spark.oracle import compare_query, duckdb_connection
from azure_batch_map_reduce_spark.registry import load_all

REGISTRY = load_all()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = REGISTRY[name]
    res = compare_query(spark, q, sf_dir, con)
    assert res.ok, f"{name}: {res.detail}"
    if q.oracle is not None:
        assert res.spark_rows == res.oracle_rows
