"""Property-based algebraic invariants (SURVEY.md §5.4), via hypothesis.

Each property is the contract a distributed engine must keep under ANY
partitioning: filters commute, union counts add, semi/anti partition the
left side, partial+final aggregation ≡ single-pass (the reference's
L7-L9 map/reduce contract itself), dedup is idempotent, salting is
result-invariant, and connected components label consistently. Inputs
are tiny literal row sets; every example also re-runs under a different
repartitioning to catch partition-sensitivity.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import Row, functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),       # key
        st.integers(min_value=-100, max_value=100),  # value
        st.sampled_from(["a", "b", "c"]),            # tag
    ),
    min_size=0,
    max_size=30,
)


def _df(spark, rows, parts=1):
    schema = "k int, v int, tag string"
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        [Row(k=k, v=v, tag=t) for k, v, t in rows], schema
    ).repartition(parts)


@given(rows=rows_st)
@settings(**SETTINGS)
def test_filters_commute(spark, rows):
    df = _df(spark, rows, parts=3)
    p, q = F.col("v") > 0, F.col("tag") != "b"
    a = df.filter(p).filter(q)
    b = df.filter(q).filter(p)
    c = df.filter(p & q)
    assert a.count() == b.count() == c.count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, c.collect()))


@given(rows=rows_st, rows2=rows_st)
@settings(**SETTINGS)
def test_union_counts_add(spark, rows, rows2):
    a, b = _df(spark, rows, 2), _df(spark, rows2, 3)
    assert a.union(b).count() == a.count() + b.count()


@given(rows=rows_st, keys=st.lists(st.integers(0, 5), max_size=6))
@settings(**SETTINGS)
def test_semi_anti_partition_left(spark, rows, keys):
    left = _df(spark, rows, 2)
    right = spark.createDataFrame([Row(k=k) for k in keys] or [], "k int")
    semi = left.join(right, "k", "left_semi").count()
    anti = left.join(right, "k", "left_anti").count()
    assert semi + anti == left.count()


@given(rows=rows_st, parts=st.integers(1, 6))
@settings(**SETTINGS)
def test_agg_partitioning_invariant(spark, rows, parts):
    """Partial+final aggregation must give the same answer for every
    physical partitioning — the L7-L9 contract."""
    base = _df(spark, rows, 1)
    re = base.repartition(parts)
    g1 = {(r["k"], r["s"], r["n"]) for r in
          base.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()}
    g2 = {(r["k"], r["s"], r["n"]) for r in
          re.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()}
    assert g1 == g2


@given(rows=rows_st)
@settings(**SETTINGS)
def test_distinct_idempotent(spark, rows):
    df = _df(spark, rows, 3)
    once = df.distinct()
    assert once.count() == once.distinct().count()


@given(rows=rows_st, k=st.integers(0, 10))
@settings(**SETTINGS)
def test_limit_bounded(spark, rows, k):
    df = _df(spark, rows, 2)
    assert df.limit(k).count() == min(k, df.count())


@given(rows=rows_st, n_salt=st.integers(1, 5))
@settings(**SETTINGS)
def test_salted_distinct_count_invariant(spark, rows, n_salt):
    """Salted two-phase count(DISTINCT) is exactly the plain one for any
    salt width."""
    from azure_batch_map_reduce_spark.operators.skew import salted_distinct_count

    df = _df(spark, rows, 3)
    plain = {
        (r["k"], r["n"])
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    salted = {
        (r["k"], r["n_v"])
        for r in salted_distinct_count(df, ["k"], "v", n_salt=n_salt).collect()
    }
    assert plain == salted


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=12
    )
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_consistent(spark, edges):
    """Every edge's endpoints share a label, and each label is the min
    node id of its component (spot-checked: label ≤ node)."""
    from azure_batch_map_reduce_spark.functions.dedup import connected_components

    e = spark.createDataFrame([Row(u=u, v=v) for u, v in edges], "u int, v int")
    labels = {r["node"]: r["label"] for r in connected_components(e).collect()}
    for u, v in edges:
        assert labels[u] == labels[v]
    assert all(lbl <= n for n, lbl in labels.items())


vec_st = st.lists(
    st.floats(min_value=-10.0, max_value=10.0, allow_nan=False, width=32),
    min_size=2,
    max_size=16,
)


@given(vec=vec_st)
@settings(**SETTINGS)
def test_quantization_error_bounded_by_half_step(spark, vec):
    # Int8 min/max-range quantization (q76) guarantees per-dimension
    # reconstruction error ≤ scale/2 where scale = (max-min)/255 —
    # round-to-nearest can be off by at most half a level.
    df = spark.createDataFrame([Row(e=vec)], "e array<double>")
    sc = (F.array_max("e") - F.array_min("e")) / 255.0
    recon_err = F.transform(
        F.col("e"),
        lambda x: F.abs(
            (F.round((x - F.array_min("e")) / sc) * sc + F.array_min("e")) - x
        ),
    )
    row = df.select(
        F.when(sc == 0, F.lit(0.0)).otherwise(F.array_max(recon_err)).alias("err"),
        F.when(sc == 0, F.lit(0.0)).otherwise(sc).alias("sc"),
    ).collect()[0]
    assert row["err"] <= row["sc"] / 2 + 1e-12


@given(ids=st.lists(st.integers(min_value=0, max_value=10**6), max_size=25))
@settings(**SETTINGS)
def test_md5_split_stable_under_reorder_and_growth(spark, ids):
    # The q55 split assignment depends only on the id — shuffling row
    # order or adding new rows never moves an existing id's bucket.
    def buckets(id_list, parts):
        if not id_list:
            return {}
        df = spark.createDataFrame(
            [Row(doc_id=i) for i in id_list], "doc_id long"
        ).repartition(parts)
        b = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 100
        )
        return dict(
            df.select("doc_id", b.alias("b")).distinct().rdd.map(tuple).collect()
        )

    base = buckets(ids, parts=1)
    grown = buckets(ids + [10**6 + 1, 10**6 + 2], parts=4)
    assert all(grown[i] == b for i, b in base.items())


@given(
    ids=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),   # doc_id
            st.integers(min_value=1, max_value=10**4),   # weight (n_chars)
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=1, max_value=8),
)
@settings(**SETTINGS)
def test_priority_sample_consistent_under_growth(spark, ids, k):
    # q112's Duffield-Lund-Thorup property: the k smallest priorities of
    # a SUBSET contain every subset member that made the superset's
    # top-k — growing the corpus can only evict, never reorder, so
    # incremental re-samples agree wherever they overlap.
    def topk(pairs, parts):
        df = spark.createDataFrame(
            [Row(doc_id=i, n_chars=w) for i, w in pairs], "doc_id long, n_chars long"
        ).repartition(parts)
        u = (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 17, 8), 16, 10)
            .cast("double")
        )
        prio = u / F.col("n_chars")
        return [
            r["doc_id"]
            for r in df.select("doc_id", prio.alias("p"))
            .orderBy(F.asc("p"), F.asc("doc_id"))
            .limit(k)
            .collect()
        ]

    subset = ids[: max(1, len(ids) // 2)]
    sub_ids = {i for i, _ in subset}
    full_top = topk(ids, parts=3)
    sub_top = topk(subset, parts=1)
    # Every subset member that survives the full-corpus cut must appear
    # in the subset's own sample.
    assert set(full_top) & sub_ids <= set(sub_top)


@given(keys=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40, unique=True))
@settings(**SETTINGS)
def test_bloom_filter_has_no_false_negatives(spark, keys):
    """q196's Bloom construction: every inserted key must test present —
    false positives are allowed, false negatives never (the property
    that makes a Bloom prefilter safe for anti-join pruning)."""
    from pyspark.sql import functions as F

    def pos(i, col):
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bloom{i}|"), col.cast("string"))), 1, 8),
                16, 10,
            ).cast("long") % 256
        )

    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    bits = None
    for i in range(1, 5):
        b = kdf.select(pos(i, F.col("k")).alias("pos"))
        bits = b if bits is None else bits.unionAll(b)
    words = bits.groupBy((F.col("pos") / 32).cast("long").alias("w")).agg(
        F.expr("bit_or(shiftleft(cast(1 as bigint), cast(pos % 32 as int)))").alias("mask")
    )
    probe_bits = None
    for i in range(1, 5):
        b = kdf.select(F.col("k").alias("probe_key"), pos(i, F.col("k")).alias("pos"))
        probe_bits = b if probe_bits is None else probe_bits.unionAll(b)
    checked = (
        probe_bits.join(F.broadcast(words), (F.col("pos") / 32).cast("long") == F.col("w"), "left")
        .select(
            "probe_key",
            (F.coalesce(F.expr("shiftright(mask, cast(pos % 32 as int)) & 1"), F.lit(0)) == 1).alias("bit_set"),
        )
        .groupBy("probe_key")
        .agg(F.bool_and("bit_set").alias("predicted"))
    )
    assert checked.where(~F.col("predicted")).count() == 0


@given(rows=rows_st)
@settings(**SETTINGS)
def test_debounce_leaders_bound_burst_count(spark, rows):
    """q198's lag-threshold debounce, algebraically: leaders per key are
    at least 1 (any nonempty key has a first event) and at most the
    event count; and with a 0-second threshold EVERY event leads (the
    identity edge case)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not rows:
        return
    df = spark.createDataFrame(
        [Row(k=k, sec=abs(v), eid=i) for i, (k, v, _t) in enumerate(rows)],
        "k int, sec int, eid int",
    )
    w = Window.partitionBy("k").orderBy("sec", "eid")
    gap = F.col("sec") - F.lag("sec").over(w)
    for threshold, expect_all in ((0, True), (5, False)):
        flagged = df.select(
            "k",
            F.when(F.lag("sec").over(w).isNull() | (gap >= threshold), 1)
            .otherwise(0)
            .alias("lead"),
        )
        agg = flagged.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("lead").alias("leaders")
        )
        bad = agg.where(
            (F.col("leaders") < 1) | (F.col("leaders") > F.col("n"))
        ).count()
        assert bad == 0
        if expect_all:
            assert agg.where(F.col("leaders") != F.col("n")).count() == 0


# ---------------------------------------------------------------------------
# Signed-zero discipline (round-2 q247 regression class)
# ---------------------------------------------------------------------------

def test_comparator_is_signed_zero_sensitive():
    """The local comparator must mismatch -0.0 vs +0.0 exactly like the
    driver's value hash does — otherwise a DuckDB round() emitting -0.0
    against Spark's +0.0 passes locally and fails on the driver (the
    round-2 q247 failure mode)."""
    import pandas as pd

    from azure_batch_map_reduce_spark.oracle import _normalize

    a = _normalize(pd.DataFrame({"x": [-0.0]}))
    b = _normalize(pd.DataFrame({"x": [0.0]}))
    assert not a.equals(b)
    # And identical signed zeros still agree with themselves.
    assert a.equals(_normalize(pd.DataFrame({"x": [-0.0]})))


def test_round_nz_collapses_negative_zero(spark):
    """round_nz (Spark side) and `round(...) + 0.0` (DuckDB side) must
    agree on +0.0 for every epsilon input; plain round() would not —
    DuckDB preserves the sign while Spark's BigDecimal path drops it."""
    import duckdb

    from azure_batch_map_reduce_spark.operators.ranks import round_nz

    eps = [-1e-9, -0.0, 0.0, 1e-9, -0.00004, 0.00004]
    sdf = spark.createDataFrame([(v,) for v in eps], "x double").select(
        round_nz(F.col("x"), 4).alias("r")
    )
    spark_vals = [r.r for r in sdf.collect()]
    duck_vals = [
        duckdb.sql(f"SELECT round({v!r}::DOUBLE, 4) + 0.0").fetchone()[0]
        for v in eps
    ]
    for s, d in zip(spark_vals, duck_vals):
        assert s == d == 0.0
        # copysign is the sign-sensitive check repr/format would apply
        import math

        assert math.copysign(1.0, s) == 1.0, f"spark kept -0.0 for {s}"
        assert math.copysign(1.0, d) == 1.0, f"duckdb kept -0.0 for {d}"


def test_duckdb_round_preserves_negative_zero_without_nz():
    """Pin the underlying engine divergence round_nz exists to fix: if a
    DuckDB upgrade ever stops emitting -0.0 from round(), this test
    flags that the normalization (and this trap note) can be retired."""
    import math

    import duckdb

    v = duckdb.sql("SELECT round((-1e-9)::DOUBLE, 4)").fetchone()[0]
    assert v == 0.0 and math.copysign(1.0, v) == -1.0


def test_q409_raking_matches_marginal_targets(spark, sf_dir):
    """IPF invariants: the final (nation-side) scaling makes every
    nation's raked mass EXACTLY total/25 (up to float round), so total
    mass is preserved; the segment axis — scaled one half-round
    earlier — must sit within 1% of total/5 (convergence behavior of
    3 alternating rounds on this grid, not a theoretical bound)."""
    from azure_batch_map_reduce_spark.registry import load_all

    df = load_all()["q409_ipf_raking_weights"].fn(spark, sf_dir).toPandas()
    total = df.n_customers.sum()
    nat_mass = df.groupby("c_nationkey").raked_mass.sum()
    assert (nat_mass - total / 25.0).abs().max() < 1e-4
    seg_mass = df.groupby("c_mktsegment").raked_mass.sum()
    assert (seg_mass / (total / 5.0) - 1.0).abs().max() < 0.01
    assert abs(df.raked_mass.sum() - total) < 1e-3
    assert (df.raked_weight > 0).all()


@given(
    st.lists(
        st.tuples(st.integers(10, 400), st.integers(0, 400)).map(
            lambda t: (t[0], min(t[1], t[0]))
        ),
        min_size=1,
        max_size=8,
        unique=True,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_q422_pass_at_k_matches_exact_combinatorics(spark, ncs):
    """The PRODUCTION pass@k column chain (the exact expressions q422
    releases, via the shared ``pass_at_k_columns`` builder) must equal
    1 − C(n−c,k)/C(n,k) computed with arbitrary-precision math.comb
    and half-up rounded at 6 — for arbitrary (n, c), not just the
    fixture's. Catches any widening or guard mistake in the decimal
    product chain."""
    import math
    from fractions import Fraction

    from pyspark.sql import functions as F

    from azure_batch_map_reduce_spark.functions.curation import (
        pass_at_k_columns,
    )

    df = spark.createDataFrame(
        [Row(n=n, c=c) for n, c in ncs], "n long, c long"
    )
    got = {
        (r.n, r.c): (r.pass_at_1, r.pass_at_5, r.pass_at_10)
        for r in df.select(
            F.col("n"), F.col("c"), *pass_at_k_columns()
        ).collect()
    }
    for n, c in ncs:
        want = []
        for k in (1, 5, 10):
            frac = Fraction(1) - Fraction(math.comb(n - c, k), math.comb(n, k))
            # half-up at 6 digits, exactly
            scaled = frac * 10**6
            ip = scaled.numerator // scaled.denominator
            rem2 = 2 * (scaled.numerator - ip * scaled.denominator)
            want.append((ip + (1 if rem2 >= scaled.denominator else 0)) / 1e6)
        assert got[(n, c)] == tuple(want), (n, c, got[(n, c)], want)


@given(
    st.lists(
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=12),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_q426_soundex_fold_matches_spark_builtin(spark, words):
    """The from-scratch DuckDB Soundex character fold (q426's oracle)
    must agree with Spark's builtin on ARBITRARY lowercase words, not
    just the fixture vocabulary — pins the H/W-transparency and
    vowel-reset rules of both implementations against each other."""
    import duckdb
    import pandas as pd

    from azure_batch_map_reduce_spark.functions.dedup import _SDX_SQL

    sdf = spark.createDataFrame([Row(w=w) for w in words], "w string")
    got_spark = {r.w: r.sx for r in sdf.select("w", F.soundex("w").alias("sx")).collect()}
    con = duckdb.connect()
    con.register("wv", pd.DataFrame({"w": words}))
    expr = _SDX_SQL.format(w="w")
    got_duck = dict(con.execute(f"SELECT w, {expr} FROM wv").fetchall())
    assert got_spark == got_duck


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_star_contraction_equals_label_propagation(spark, raw_edges):
    """star_contraction_components and the pointer-jumping variant
    must produce the identical (node → component-min) labeling as
    plain connected_components on
    ARBITRARY graphs — chains, self-loops, duplicates, multi-component
    shapes hypothesis generates — not just the fixture's near-dup
    pairs. This is the O(log²)-rounds swap's correctness contract."""
    edges = [(u, v) for u, v in raw_edges if u != v]
    if not edges:
        return
    from azure_batch_map_reduce_spark.functions.dedup import (
        connected_components,
        star_contraction_components,
    )

    df = spark.createDataFrame(edges, "u long, v long")
    a = {
        (r.node, r.label)
        for r in star_contraction_components(df).collect()
    }
    b = {(r.node, r.label) for r in connected_components(df).collect()}
    c = {
        (r.node, r.label)
        for r in connected_components(df, shortcut=True).collect()
    }
    assert a == b == c
