"""Skew mitigation: salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (one returnflag, one mega-customer) can
pin an entire stage on one reducer. Two deliberate counters, both pure
DataFrame compositions (no Catalyst changes):

- **Salted aggregation** — split each hot group into ``n_salt``
  sub-groups on a salt derived from the aggregated column, partially
  aggregate per (key, salt), then merge. For ``count(DISTINCT x)`` the
  salt MUST be a function of ``x`` itself so each distinct value lands
  in exactly one sub-group and the partial distinct-counts are disjoint
  (summable).
- **Salted join** — the large skewed side gets a salt in [0, n); the
  smaller side is exploded ×n so every (key, salt) pair exists; join on
  (key, salt). Trades n× replication of the small side for an n-way
  split of each hot key's rows.

Spark's AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``, on in
:mod:`..session`) handles most join skew at runtime by splitting
oversized partitions; these helpers are for the cases AQE can't see —
aggregation skew and deliberate layout control.

The reference has no analog: its unit of parallelism is one file = one
task (``Program.cs:332-335``), so a skewed input *file* is unsplittable
by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from azure_batch_map_reduce_spark.catalog import load_tables
from azure_batch_map_reduce_spark.registry import query


def salted_distinct_count(
    df: DataFrame,
    group_keys: list[str],
    distinct_col: str,
    n_salt: int = 16,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """count(DISTINCT distinct_col) per group_keys via salted two-phase
    aggregation. Phase 1 groups on (keys, hash(distinct_col) % n_salt):
    every distinct value belongs to exactly one salt bucket, so phase-2
    sums of the bucket-local distinct counts are exact."""
    salt = F.pmod(F.hash(F.col(distinct_col)), F.lit(n_salt)).alias("_salt")
    phase1 = df.groupBy(*group_keys, salt).agg(
        F.count_distinct(distinct_col).alias("_partial_distinct"),
        *(extra_aggs or []),
    )
    merge = [F.sum("_partial_distinct").alias(f"n_{distinct_col}")]
    for c in phase1.columns:
        if c.startswith("_sum_"):
            merge.append(F.sum(c).alias(c[5:]))
    return phase1.groupBy(*group_keys).agg(*merge)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salt: int = 8,
    salt_basis: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (large, skewed) side salted and the right
    side exploded ×n_salt. ``salt_basis`` is any left column with
    per-row variation (defaults to a stable hash of the key row id via
    ``spark_partition_id`` — prefer passing a real column)."""
    basis = F.col(salt_basis) if salt_basis else F.spark_partition_id()
    l_salted = left.withColumn("_salt", F.pmod(F.hash(basis), F.lit(n_salt)))
    r_exploded = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return l_salted.join(r_exploded, on=[key, "_salt"], how=how).drop("_salt")


@query(
    "q18_salted_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey)                         AS n_l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("skew", "aggregation"),
)
def q18_salted_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers + revenue per returnflag — 3 giant groups, the
    worst-case aggregation skew — via salted two-phase aggregation. Each
    (flag, salt) partial fits one reducer; the final merge handles 3×16
    rows. Result is exactly the plain GROUP BY (oracle)."""
    li = load_tables(spark, sf_dir)["lineitem"]
    out = salted_distinct_count(
        li,
        ["l_returnflag"],
        "l_suppkey",
        n_salt=16,
        extra_aggs=[
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "_sum_revenue"
            )
        ],
    )
    return out.select(
        "l_returnflag", "n_l_suppkey", F.round("revenue", 2).alias("revenue")
    )


@query(
    "q19_salted_join",
    oracle="""
    SELECT o_orderpriority,
           count(*)                                          AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
    tags=("skew", "join"),
)
def q19_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders with the fact side salted 8 ways on
    l_linenumber (per-row variation within each hot orderkey) and orders
    exploded ×8 — a hot orderkey's rows now spread over 8 reducers.
    Identical result to the unsalted join (oracle). AQE's skew-join
    handles this automatically when partition-size stats reveal the
    skew; the explicit form is for known-hot keys and for engines where
    the salt must live in the storage layout."""
    t = load_tables(spark, sf_dir)
    # salted_join joins on a shared column name; rename orders' key first.
    li = t["lineitem"]
    orders = t["orders"].select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, key="l_orderkey", n_salt=8, salt_basis="l_linenumber")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


@query(
    "q105_key_skew_profile",
    oracle="""
    WITH per_key AS (
        SELECT l_suppkey AS key, count(*) AS cnt
        FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total, count(*) AS n_keys FROM per_key)
    SELECT p.key, p.cnt,
           round(p.cnt / t.total, 6) AS share,
           round(p.cnt * t.n_keys / t.total, 6) AS skew_factor
    FROM per_key p CROSS JOIN tot t
    ORDER BY p.cnt DESC, p.key ASC
    LIMIT 20
    """,
    tags=("skew", "profiling", "diagnostics"),
)
def q105_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic: the 20 heaviest l_suppkey hitters
    with their share of all rows and skew factor (count ÷ mean count —
    1.0 is perfectly uniform). This is the profiling pass you run
    BEFORE choosing a salting factor for q19-style salted joins: the
    max skew_factor bounds the useful salt fan-out.

    Scale posture: one partial→final count per key, then a 1-row total
    aggregate broadcast back via cross join (never a global window,
    which would funnel every key through one task). The top-20 is
    TakeOrdered — per-partition heaps, no global sort materialization.
    """
    li = load_tables(spark, sf_dir)["lineitem"]
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = per_key.agg(
        F.sum("cnt").cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6).alias("share"),
            F.round(F.col("cnt") * F.col("n_keys") / F.col("total"), 6).alias(
                "skew_factor"
            ),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(20)
    )


@query(
    "q229_salting_plan",
    oracle="""
    WITH counts AS (
        SELECT 63 - (length(bin((o_orderkey % 65536) + 1)) - 1) AS key,
               count(*) AS n
        FROM orders GROUP BY 1
    ),
    stats AS (
        SELECT CAST(ceil(avg(n) * 2) AS BIGINT) AS target FROM counts
    )
    SELECT c.key,
           CAST(c.n AS BIGINT) AS n_rows,
           CAST(max(s.target) AS BIGINT) AS target_per_salt,
           CAST(CASE WHEN c.n > max(s.target)
                     THEN (c.n + max(s.target) - 1) // max(s.target)
                     ELSE 1 END AS INTEGER) AS salt_factor
    FROM counts c CROSS JOIN stats s
    GROUP BY c.key, c.n
    HAVING CASE WHEN c.n > max(s.target)
                THEN (c.n + max(s.target) - 1) // max(s.target)
                ELSE 1 END > 1
    ORDER BY n_rows DESC, c.key
    """,
    tags=("skew", "salting", "planning", "aggregation"),
)
def q229_salting_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting-plan generation: from per-key row counts, emit the salt
    factor each hot key needs (⌈n / target⌉ for keys above 2× the mean
    key size) — the PLAN that q19's salted join and q18's salted
    distinct consume (the key here is a bit-length bucketing of the
    order key, giving the exponential key-frequency shape real hot-key
    columns exhibit), produced as data so it can be broadcast, stored
    with the table, and refreshed as skew drifts. AQE handles skew it
    can observe at runtime; a persisted plan handles the skew you know
    about at design time (the one mega-customer) without replanning
    every query. Integer ceiling division everywhere — no float in
    any factor.

    Scale posture: one partial+final count per key; the threshold is a
    1-row aggregate broadcast back; output is only the hot tail."""
    orders = load_tables(spark, sf_dir)["orders"]
    # Exponentially skewed derived key (bit-length bucketing of the
    # order key): bucket j holds ~2^-j of the rows — the Zipf-shaped
    # distribution a real hot-key column exhibits. length(bin(v))-1 is
    # floor(log2 v) EXACTLY on both engines (no libm).
    counts = orders.select(
        (63 - (F.length(F.bin((F.col("o_orderkey") % 65536) + 1)) - 1)).alias(
            "key"
        )
    ).groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.ceil(F.avg("n") * 2).cast("long").alias("target")
    )
    planned = counts.crossJoin(F.broadcast(stats)).select(
        "key",
        F.col("n").cast("long").alias("n_rows"),
        F.col("target").alias("target_per_salt"),
        F.when(
            F.col("n") > F.col("target"),
            F.expr("(n + target - 1) div target"),
        )
        .otherwise(1)
        .cast("int")
        .alias("salt_factor"),
    )
    return planned.where(F.col("salt_factor") > 1).orderBy(
        F.desc("n_rows"), F.asc("key")
    )


@query(
    "q404_hot_key_skew_join",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN l_orderkey % 10 <> 0 THEN 1 ELSE l_suppkey END
                   AS account,
               l_extendedprice * (1 - l_discount) AS rev
        FROM lineitem
    )
    SELECT s.s_nationkey AS nation_key,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(count(DISTINCT f.account) AS BIGINT) AS n_accounts,
           round(sum(f.rev), 2) AS revenue
    FROM fact f JOIN supplier s ON f.account = s.s_suppkey
    GROUP BY s.s_nationkey
    ORDER BY nation_key
    """,
    tags=("skew", "join", "aqe", "hot-key", "stress"),
)
def q404_hot_key_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial hot-key join — the one-mega-customer shape: ~90% of
    line items collapse onto a single account (account 1), the rest
    spread over the supplier key space, then the fact joins the
    supplier dim on that account key. The deliberately-unsalted engine
    plan is the STRESS FIXTURE for Spark's runtime skew handling: at
    fixture scale the dim broadcasts (hash join — immune to skew); at
    100 TB with a non-broadcastable dim the same plan becomes a
    shuffle join whose hot partition AQE's OptimizeSkewedJoin splits
    at runtime —
    ``tests/test_plans.py::test_aqe_skew_join_splits_hot_key`` forces
    that regime (broadcast off, skew thresholds at test scale) and
    asserts the split actually fires (``skew=true`` in the final
    adaptive plan) AND that :func:`salted_join` — the design-time
    counter for skew AQE can't see — produces the identical result on
    the same fixture.

    Determinism: the hot-key mapping is integer modulus; counts exact;
    revenue is one rounded double sum at nation grain (25 groups,
    sub-ulp stable on this fixture — same expression as q19).

    Scale posture: no manual salt in the query itself — runtime skew
    mitigation is the point; the salted variant is pinned equivalent
    in the plan test. Reference contract: per-item account mapping =
    map slot (``App.config:16``); account rollup = reduce slot
    (``App.config:17``)."""
    t = load_tables(spark, sf_dir)
    fact = t["lineitem"].select(
        F.when(F.col("l_orderkey") % 10 != 0, F.lit(1))
        .otherwise(F.col("l_suppkey"))
        .alias("account"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    dim = t["supplier"].select("s_suppkey", "s_nationkey")
    return (
        fact.join(dim, fact["account"] == dim["s_suppkey"])
        .groupBy(F.col("s_nationkey").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.countDistinct("account").cast("long").alias("n_accounts"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
        .orderBy("nation_key")
    )
