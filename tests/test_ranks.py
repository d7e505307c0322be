"""Unit tests for the window-free rank/running-sum primitives
(operators/ranks.py): value-parity with the global-window forms across
sizes, tie shapes, and tile counts — including k > n and the
single-partition degenerate case."""

from __future__ import annotations

import pytest

from pyspark.sql import Window, functions as F

from azure_batch_map_reduce_spark.operators.ranks import (
    distributed_row_number,
    distributed_running_sum,
    ntile_from_rank,
)


def _toy(spark, n=997, seed_mod=131):
    # Deterministic, collision-rich values (mod compresses the range so
    # ties exist); id is the tie-break.
    return spark.range(n).select(
        F.col("id"),
        (F.hash(F.col("id").cast("string")) % seed_mod).alias("v"),
    )


def test_row_number_matches_window(spark):
    df = _toy(spark)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = distributed_row_number(df, order, out="rn")
    want = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_row_number_desc_and_few_partitions(spark):
    df = _toy(spark, n=53)
    order = [F.col("v").desc(), F.col("id").desc()]
    got = distributed_row_number(df, order, out="rn", num_partitions=7)
    want = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_row_number_single_partition_and_empty(spark):
    df = _toy(spark, n=9)
    order = [F.col("id").asc()]
    got = distributed_row_number(df, order, out="rn", num_partitions=1)
    assert [r.rn for r in got.orderBy("id").collect()] == list(range(1, 10))
    empty = distributed_row_number(df.where(F.lit(False)), order, out="rn")
    assert empty.count() == 0


@pytest.mark.parametrize("k", [1, 2, 5, 7, 10, 150, 2000])
def test_ntile_from_rank_matches_ntile(spark, k):
    df = _toy(spark, n=150)
    order = [F.col("v").asc(), F.col("id").asc()]
    ranked = distributed_row_number(df, order, out="rn")
    nrow = df.agg(F.count(F.lit(1)).alias("_n"))
    got = (
        ranked.crossJoin(F.broadcast(nrow))
        .select("id", ntile_from_rank(F.col("rn"), F.col("_n"), k).alias("t"))
    )
    want = df.select(
        "id", F.ntile(k).over(Window.orderBy(*order)).cast("long").alias("t")
    )
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_running_sum_matches_window(spark):
    df = _toy(spark, n=400).groupBy("v").agg(
        F.count(F.lit(1)).alias("a"), F.sum("id").alias("b")
    )
    got = distributed_running_sum(
        df, [F.asc("v")], {"ca": "a", "cb": "b"}, num_partitions=6
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "v", F.sum("a").over(w).alias("ca"), F.sum("b").over(w).alias("cb")
    )
    assert (
        got.select("v", "ca", "cb").orderBy("v").collect()
        == want.orderBy("v").collect()
    )


def test_rank_small_matches_window_row_number(spark):
    from azure_batch_map_reduce_spark.operators.ranks import desc_key, rank_small

    df = _toy(spark, n=200)
    got = rank_small(
        df,
        key=[desc_key(F.col("v").cast("double")).alias("_nv"), F.col("id").alias("_i")],
        payload=["id", "v"],
        out="rnk",
    )
    want = df.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy(F.col("v").desc(), F.col("id").asc())),
    ).select("rnk", "id", "v")
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_rank_small_empty_and_singleton(spark):
    from azure_batch_map_reduce_spark.operators.ranks import rank_small

    df = _toy(spark, n=1)
    got = rank_small(df, key=[F.col("id").alias("_i")], payload=["id"], out="rnk")
    assert [(r.rnk, r.id) for r in got.collect()] == [(1, 0)]
    empty = rank_small(
        df.where(F.lit(False)), key=[F.col("id").alias("_i")], payload=["id"]
    )
    assert empty.count() == 0


def test_desc_key_normalizes_signed_zero(spark):
    from azure_batch_map_reduce_spark.operators.ranks import desc_key, rank_small

    # round(-1e-9, 6) is IEEE -0.0; a naive unary-minus key would order
    # it apart from +0.0 inside array_sort's struct comparison. desc_key
    # must collapse both to the same key so the id tie-break decides.
    df = spark.createDataFrame([(1, -1e-9), (2, 0.0)], "id long, x double").select(
        "id", F.round("x", 6).alias("x")
    )
    got = rank_small(
        df,
        key=[desc_key(F.col("x")).alias("_nx"), F.col("id").alias("_i")],
        payload=["id"],
        out="rnk",
    )
    assert [(r.rnk, r.id) for r in got.orderBy("rnk").collect()] == [(1, 1), (2, 2)]


@pytest.mark.parametrize("fn", ["max", "min"])
@pytest.mark.parametrize("inclusive", [True, False])
def test_running_extremum_matches_window(spark, fn, inclusive):
    from azure_batch_map_reduce_spark.operators.ranks import (
        distributed_running_extremum,
    )

    df = _toy(spark, n=400).groupBy("v").agg(
        F.max("id").alias("a"), F.min("id").alias("b")
    )
    got = distributed_running_extremum(
        df,
        [F.asc("v")],
        {"ra": "a", "rb": "b"},
        fn=fn,
        inclusive=inclusive,
        num_partitions=6,
    )
    agg = F.max if fn == "max" else F.min
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0 if inclusive else -1
    )
    want = df.select(
        "v", agg("a").over(w).alias("ra"), agg("b").over(w).alias("rb")
    )
    assert (
        got.select("v", "ra", "rb").orderBy("v").collect()
        == want.orderBy("v").collect()
    )


def test_running_extremum_degenerates(spark):
    from azure_batch_map_reduce_spark.operators.ranks import (
        distributed_running_extremum,
    )

    df = _toy(spark, n=5).select("id", "v")
    # Exclusive frame on the first row must be NULL (empty frame),
    # matching the window form, even with a single partition.
    got = (
        distributed_running_extremum(
            df, [F.asc("id")], {"pm": "v"}, fn="max",
            inclusive=False, num_partitions=1,
        )
        .orderBy("id")
        .collect()
    )
    assert got[0].pm is None
    vals = [r.v for r in got]
    run = None
    for i, r in enumerate(got[1:], start=1):
        run = max(vals[:i])
        assert r.pm == run
    empty = distributed_running_extremum(
        df.where(F.lit(False)), [F.asc("id")], {"pm": "v"}
    )
    assert empty.count() == 0


def test_bounded_order_keeps_constant_partition(spark):
    """The session must exclude Catalyst's EliminateWindowPartitions so
    bounded_order's declared constant key survives optimization —
    otherwise WindowExec logs 'No Partition Defined' for every audited
    bounded-grain frame and the zero-warning bench signal dies."""
    from pyspark.sql import functions as F

    from azure_batch_map_reduce_spark.operators.ranks import bounded_order

    df = spark.range(10).withColumn(
        "r", F.row_number().over(bounded_order("id"))
    )
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(0," in opt


def test_half_up_ratio_matches_exact_rational_half_up(spark):
    """half_up_ratio / half_up_ratio_signed vs the exact Fraction
    definition of round-half-away-from-zero, including exact-half
    boundary cases (power-of-two denominators — the q345 class) and
    the DuckDB oracle form on identical operands."""
    from fractions import Fraction

    import duckdb

    from azure_batch_map_reduce_spark.operators.ranks import (
        half_up_ratio,
        half_up_ratio_signed,
    )

    cases = [
        # (num, den, digits) — halves, near-halves, big operands
        (1, 128, 6),       # 0.0078125 → exact half at 6dp
        (2, 64, 4),        # 0.03125   → exact half at 4dp
        (3, 8, 2),         # 0.375     → exact half at 2dp
        (1, 3, 6),
        (7, 3, 4),
        (0, 5, 6),
        (999_999, 1_000_000, 6),
        (10**12 + 7, 60_000_000, 6),   # micros-average magnitude
        (123456789, 128, 2),
    ]

    def exact(n, d, k):
        x = Fraction(n, d) * 10**k
        q, r = divmod(abs(x.numerator), x.denominator)
        m = q + (1 if 2 * r >= x.denominator else 0)
        return (m if x >= 0 else -m) / 10**k

    rows = spark.range(1).select(
        *[
            half_up_ratio(F.lit(n), F.lit(d), k).alias(f"p{i}")
            for i, (n, d, k) in enumerate(cases)
        ],
        *[
            half_up_ratio_signed(F.lit(-n), F.lit(d), k).alias(f"m{i}")
            for i, (n, d, k) in enumerate(cases)
        ],
    ).first()
    con = duckdb.connect()
    for i, (n, d, k) in enumerate(cases):
        want = exact(n, d, k)
        assert rows[f"p{i}"] == want, (n, d, k, rows[f"p{i}"], want)
        assert rows[f"m{i}"] == exact(-n, d, k), (n, d, k)
        # -0.0 never escapes the signed variant (hash is sign-sensitive)
        if exact(-n, d, k) == 0:
            assert str(rows[f"m{i}"]) == "0.0"
        got = con.execute(
            f"SELECT ((2 * CAST({n} AS HUGEINT) * {10**k} + {d})"
            f" // (2 * {d})) / {10**k}.0"
        ).fetchone()[0]
        assert got == want, (n, d, k, got, want)
    con.close()


def test_half_up_ratio_int64_quotient_boundary(spark):
    """Pin the documented int64 limit of half_up_ratio (ADVICE r6):
    operands are decimal(38,0) but Spark's ``div`` (IntegralDivide)
    returns LONG, so the QUOTIENT ``ratio * 10^k`` must fit int64
    (~9.22e18). At the last safe magnitude the helper is exact; one
    decade beyond it the quotient silently WRAPS to a negative long —
    there is no null and no ANSI error — so any future call site whose
    ratio can exceed ~9.2e18 / 10^k must rescale first. Every current
    repo site is a bounded ratio (rates, averages, shares ≤ micros
    scale), verified when added per the rounding-contract test."""
    from azure_batch_map_reduce_spark.operators.ranks import half_up_ratio

    row = spark.range(1).select(
        # quotient = 9_223_372_036_854 * 10^6 ≈ 9.223e18 < 2^63-1: safe
        half_up_ratio(F.lit(9_223_372_036_854), F.lit(1), 6).alias("safe"),
        # quotient = 10^13 * 10^6 = 10^19 > 2^63-1: wraps, goes negative
        half_up_ratio(F.lit(10**13), F.lit(1), 6).alias("wrapped"),
    ).first()
    assert row["safe"] == 9_223_372_036_854.0
    assert row["wrapped"] < 0, (
        "int64 quotient overflow no longer wraps silently — if Spark "
        "changed IntegralDivide semantics, revisit the half_up_ratio "
        "docstring contract"
    )
