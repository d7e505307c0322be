"""The three Arrow-vectorized Python UDF surfaces (SURVEY.md §2.2j):
scalar ``pandas_udf`` (Series→Series), grouped-map ``applyInPandas``
(pdf→pdf per group — the idiomatic "pluggable reduce" slot of the
reference, ``Program.cs:351-363``), and grouped-agg ``pandas_udf``
(Series→scalar inside ``agg``).

Every computation here is *deliberately also expressible JVM-side* (the
oracle proves it) — these queries exist to pin the UDF plumbing: Arrow
batch transfer, schema contracts, group iteration. The engine's policy
stays "built-ins first" (UDFs forfeit codegen and pay serialization);
when Python is genuinely required (a model, a tokenizer, a codec), these
are the shapes it must take — batched, never row-at-a-time.

Scale notes: scalar/grouped-agg UDFs stream Arrow batches through a
fixed-size pipe — memory is O(batch), any corpus size works. Grouped-map
materializes ONE GROUP per call in pandas; it is safe only when groups
are bounded (here: customers per segment at fixture scale; in production
key the group finer, or use mapInPandas/iterator UDFs for unbounded
groups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from azure_batch_map_reduce_spark.catalog import load_tables
from azure_batch_map_reduce_spark.registry import query


@pandas_udf(DoubleType())
def _l2_norm(emb: pd.Series) -> pd.Series:
    """Vectorized L2 norm over array<double> — one Arrow batch in, one
    numpy pass, one batch out."""
    return pd.Series([float(np.sqrt(np.dot(v, v))) for v in emb])


@query(
    "q93_scalar_pandas_udf",
    oracle="""
    SELECT vec_id, label,
           round(sqrt(list_dot_product(
               list_transform(embedding, x -> CAST(x AS DOUBLE)),
               list_transform(embedding, x -> CAST(x AS DOUBLE)))), 4) AS l2_norm
    FROM embeddings
    """,
    tags=("udf", "pandas", "scalar"),
)
def q93_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF surface: embedding L2 norms. The JVM-side
    equivalent (`sqrt(aggregate(zip_with(...)))`, see q70) is what
    production code uses; this pins the Arrow path."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        "label",
        F.round(_l2_norm(as_double), 4).alias("l2_norm"),
    )


_ZSCORE_SCHEMA = "c_custkey long, c_mktsegment string, zscore double"


def _zscore(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["c_acctbal"].mean()
    sd = pdf["c_acctbal"].std(ddof=1)  # sample stddev = SQL stddev_samp
    return pd.DataFrame(
        {
            "c_custkey": pdf["c_custkey"],
            "c_mktsegment": pdf["c_mktsegment"],
            "zscore": ((pdf["c_acctbal"] - mu) / sd).round(4),
        }
    )


@query(
    "q94_grouped_map_zscore",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - avg(c_acctbal) OVER w)
                 / stddev_samp(c_acctbal) OVER w, 4) AS zscore
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment)
    """,
    tags=("udf", "pandas", "grouped-map"),
)
def q94_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas surface: per-segment z-score
    normalization — each market segment arrives as one pandas frame, the
    group-level statistics are computed in Python, and the normalized
    frame comes back under a declared schema. This is the schema-aware
    rebuild of the reference's pluggable per-group consolidation slot."""
    cust = load_tables(spark, sf_dir)["customer"]
    return (
        cust.select("c_custkey", "c_mktsegment", "c_acctbal")
        .groupBy("c_mktsegment")
        .applyInPandas(_zscore, _ZSCORE_SCHEMA)
    )


@pandas_udf(DoubleType())
def _weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    return float(np.sum(price * qty) / np.sum(qty))


@query(
    "q95_grouped_agg_pandas_udf",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
               AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("udf", "pandas", "grouped-agg"),
)
def q95_grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF surface: quantity-weighted mean price per
    returnflag, a custom aggregate Spark lacks as a builtin composed the
    way a real UDAF (a quantile sketch, a model update) would be. Note
    the plan shape: grouped-agg UDFs do NOT get partial aggregation —
    all rows of a group cross to Python after the shuffle — which is
    exactly why hot-path aggregates stay JVM-side (q01) and UDAFs are
    reserved for logic SQL cannot express."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(
            _weighted_avg_price(F.col("l_extendedprice"), F.col("l_quantity")), 4
        ).alias("wavg_price")
    )
