"""Local differential harness: run a registered query on Spark AND its
DuckDB oracle SQL, compare row count + schema (column names) + an
order-insensitive value comparison. This mirrors the driver's
CORRECTNESS check so regressions surface locally before a round ends.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from pyspark.sql import SparkSession

from azure_batch_map_reduce_spark.catalog import TABLES, table_path
from azure_batch_map_reduce_spark.registry import Query


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int
    oracle_rows: int


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _normalize(df: pd.DataFrame, float_tol_digits: int = 6) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            if math.isnan(v):
                return "∅"
            # Deliberately sign-SENSITIVE: -0.0 formats as "-0.000000"
            # and mismatches "+0.0", mirroring the driver's value hash.
            # Round-2's q247 failure (Spark +0.0 vs DuckDB -0.0 after
            # round()) passed locally only because this line used to
            # collapse signed zeros; queries must normalize at the
            # source instead (operators/ranks.py round_nz + oracle-side
            # `+ 0.0`).
            return f"{round(v, float_tol_digits):.{float_tol_digits}f}"
        if isinstance(v, (pd.Timestamp,)):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)

    out = df.map(canon)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare_query(
    spark: SparkSession, q: Query, sf_dir: str, con: duckdb.DuckDBPyConnection | None = None
) -> CompareResult:
    try:
        sdf = q.fn(spark, sf_dir).toPandas()
    finally:
        # Queries that persist() intermediates (q239/q246 word-type
        # histograms) must not leak cached blocks across the hundreds of
        # queries a differential session runs.
        spark.catalog.clearCache()
    if q.oracle is None:
        ok = len(sdf) >= 0
        return CompareResult(q.name, ok, "rows-only (no oracle)", len(sdf), -1)
    own_con = con is None
    if own_con:
        con = duckdb_connection(sf_dir)
    try:
        # Table functions (read_blob/glob) only accept constant paths,
        # so path-dependent oracles carry a __SF_DIR__ placeholder
        # (q90); `oracle_sql()` substitutes the driver's sf0.01 grain.
        odf = con.sql(q.oracle.replace("__SF_DIR__", sf_dir)).df()
    finally:
        if own_con:
            con.close()

    if sorted(sdf.columns) != sorted(odf.columns):
        return CompareResult(
            q.name,
            False,
            f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}",
            len(sdf),
            len(odf),
        )
    if len(sdf) != len(odf):
        return CompareResult(
            q.name, False, f"row count mismatch: spark={len(sdf)} oracle={len(odf)}", len(sdf), len(odf)
        )
    if len(sdf) == 0:
        # Two empty frames with matching columns are equal — pandas
        # .equals would still compare (and fail on) residual dtypes.
        return CompareResult(q.name, True, "ok (both empty)", 0, 0)
    # Driver-comparator hazard check (CORRECTNESS_r04 q274/q281): the
    # driver sorts the RAW pandas frame — no cell stringification — so
    # list/dict cells crash its factorize with "unhashable type". Any
    # output that cannot survive a raw sort_values locally would be a
    # driver-RED even if the canonicalized comparison below passes.
    for frame, side in ((sdf, "spark"), (odf, "oracle")):
        try:
            frame.sort_values(by=list(frame.columns), kind="mergesort")
        except TypeError as e:
            return CompareResult(
                q.name,
                False,
                f"driver-comparator hazard: raw sort_values on {side} frame "
                f"raised {e!r} — output schema must be flat/hashable",
                len(sdf),
                len(odf),
            )
    a, b = _normalize(sdf), _normalize(odf)
    if not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        sample = pd.concat(
            [a[diff_mask].head(3).assign(_side="spark"), b[diff_mask].head(3).assign(_side="oracle")]
        )
        return CompareResult(
            q.name, False, f"value mismatch on {int(diff_mask.sum())} rows:\n{sample}", len(sdf), len(odf)
        )
    return CompareResult(q.name, True, "ok", len(sdf), len(odf))
