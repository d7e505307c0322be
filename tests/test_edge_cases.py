"""Edge cases from SURVEY.md §5.3: empty input (the reference would
submit zero mappers and a reducer depending on nothing,
``Program.cs:332,355``), single row, null keys, duplicate keys, and
ties in top-k."""

from __future__ import annotations

from pyspark.sql import Row, functions as F, Window


def _empty(spark, schema="k int, v double"):
    return spark.createDataFrame([], schema)


def test_empty_input_aggregate(spark):
    out = _empty(spark).groupBy("k").agg(F.sum("v").alias("s")).collect()
    assert out == []


def test_empty_input_global_agg_yields_one_row(spark):
    # Ungrouped aggregate over nothing = one row of neutral elements —
    # the reducer-depending-on-zero-mappers case, made well-defined.
    row = _empty(spark).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).collect()[0]
    assert row["n"] == 0 and row["s"] is None


def test_empty_input_join_and_window(spark):
    e = _empty(spark)
    other = spark.createDataFrame([Row(k=1, w=2.0)], "k int, w double")
    assert e.join(other, "k").collect() == []
    w = Window.partitionBy("k").orderBy("v")
    assert e.withColumn("rn", F.row_number().over(w)).collect() == []


def test_null_keys_group_together_but_dont_join(spark):
    df = spark.createDataFrame(
        [Row(k=None, v=1.0), Row(k=None, v=2.0), Row(k=1, v=3.0)],
        "k int, v double",
    )
    groups = {r["k"]: r["s"] for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert groups[None] == 3.0  # SQL GROUP BY: nulls form one group
    # ...but equi-join null keys never match (SQL null semantics).
    assert df.join(df.select(F.col("k").alias("k")), "k").filter(
        F.col("k").isNull()
    ).count() == 0


def test_topk_tie_determinism(spark):
    df = spark.createDataFrame(
        [Row(g="a", score=1.0, id=i) for i in range(5)], "g string, score double, id int"
    )
    w = Window.partitionBy("g").orderBy(F.col("score").desc(), F.col("id").asc())
    top2 = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    # All scores tie: the unique-key tiebreak must make the answer stable.
    assert sorted(r["id"] for r in top2.collect()) == [0, 1]
    again = df.repartition(5).withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 2
    )
    assert sorted(r["id"] for r in again.collect()) == [0, 1]


def test_duplicate_keys_join_multiplicity(spark):
    l = spark.createDataFrame([Row(k=1), Row(k=1)], "k int")
    r = spark.createDataFrame([Row(k=1), Row(k=1), Row(k=1)], "k int")
    assert l.join(r, "k").count() == 6  # bag semantics: 2×3


def test_single_file_single_row_pipeline(spark):
    df = spark.createDataFrame([Row(k=1, v=2.0)], "k int, v double")
    out = df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    assert out == [Row(k=1, s=2.0)]


def test_mapreduce_empty_dir(spark, tmp_path):
    """Zero input files → zero map tasks → empty (not failing) result:
    strictly better-defined than the reference's reducer-on-nothing."""
    from azure_batch_map_reduce_spark.plans.mapreduce import file_source

    d = tmp_path / "empty"
    d.mkdir()
    try:
        n = file_source(spark, str(d)).count()
    except Exception as ex:  # binaryFile on an empty dir may refuse schema
        assert "schema" in str(ex).lower() or "path" in str(ex).lower()
    else:
        assert n == 0


def test_ts_queries_match_oracle_under_non_utc_session(spark, sf_dir):
    """Caller-owned sessions are a real driver scenario and may carry a
    non-UTC timezone; every table-load path must defensively re-align
    (catalog.align_session_for_oracle). Pin it for the timestamp-heavy
    operators: gap-fill, TWAP, streaming upsert, interpolation."""
    from azure_batch_map_reduce_spark.oracle import compare_query, duckdb_connection
    from azure_batch_map_reduce_spark.registry import load_all

    reg = load_all()
    con = duckdb_connection(sf_dir)
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for name in (
            "q104_gapfill_resample",
            "q108_time_weighted_avg",
            "q122_streaming_upsert",
            "q126_linear_interpolation",
        ):
            spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
            res = compare_query(spark, reg[name], sf_dir, con)
            assert res.ok, f"{name} under non-UTC session: {res.detail}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
        con.close()
