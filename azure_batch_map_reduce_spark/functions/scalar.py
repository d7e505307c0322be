"""Scalar-function surface: string / regex / hash / date / math / JSON /
array / map / explode (SURVEY.md §2.2h).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python UDFs anywhere on this path, so the same
expressions run unchanged over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from azure_batch_map_reduce_spark.catalog import load_tables
from azure_batch_map_reduce_spark.registry import query


@query(
    "q40_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           substring(p_name, 1, 5)                         AS name_prefix,
           concat_ws('|', p_brand, p_type)                 AS brand_type,
           CAST(length(p_name) AS INTEGER)                 AS name_len,
           trim(p_name)                                    AS name_trim,
           replace(p_name, ' ', '_')                       AS name_snake,
           CAST(levenshtein(p_type, 'PROMO') AS INTEGER)   AS dist_promo
    FROM part
    WHERE p_partkey < 100
    """,
    tags=("scalar", "string"),
)
def q40_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string functions: case, substring, concat_ws, length, trim,
    replace, levenshtein."""
    part = load_tables(spark, sf_dir)["part"]
    return part.filter(F.col("p_partkey") < 100).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.trim("p_name").alias("name_trim"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.levenshtein("p_type", F.lit("PROMO")).alias("dist_promo"),
    )


@query(
    "q41_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '#([0-9]+)', 1)            AS brand_num,
           regexp_replace(p_name, '[aeiou]', '*', 'g')        AS name_devowel,
           CASE WHEN regexp_matches(p_name, '^(small|large)') THEN TRUE ELSE FALSE END AS sized
    FROM part
    WHERE p_partkey < 200
    """,
    tags=("scalar", "regex"),
)
def q41_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike. Spark regexp_replace is
    global by default; DuckDB needs the 'g' flag to match."""
    part = load_tables(spark, sf_dir)["part"]
    return part.filter(F.col("p_partkey") < 200).select(
        "p_partkey",
        F.regexp_extract("p_brand", "#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_devowel"),
        F.col("p_name").rlike("^(small|large)").alias("sized"),
    )


@query(
    "q42_hash_funcs",
    oracle="""
    SELECT doc_id,
           sha256(text)                 AS content_sha,
           md5(text)                    AS content_md5,
           substring(sha256(text), 1, 8) AS short_fp
    FROM documents
    WHERE doc_id < 50
    """,
    tags=("scalar", "hash"),
)
def q42_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashing: sha2-256 and md5 hex digests (the exact-dedup
    fingerprint primitives) — identical hex in Spark and DuckDB."""
    docs = load_tables(spark, sf_dir)["documents"]
    return docs.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.sha2("text", 256).alias("content_sha"),
        F.md5("text").alias("content_md5"),
        F.substring(F.sha2("text", 256), 1, 8).alias("short_fp"),
    )


@query(
    "q43_date_funcs",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate)                  AS order_month,
           CAST(year(o_orderdate)  AS INTEGER)               AS yr,
           CAST(month(o_orderdate) AS INTEGER)               AS mo,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER)       AS dow,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INTEGER) AS days_to_2002,
           strftime(o_orderdate, '%Y-%m-%d')                 AS order_date,
           CAST(epoch(o_orderdate) AS BIGINT)                AS epoch_s,
           CAST((2002 - year(o_orderdate)) * 12 + 1 - month(o_orderdate) AS DOUBLE)
                                                             AS months_to_2002
    FROM orders
    WHERE o_orderkey < 100
    """,
    tags=("scalar", "datetime"),
)
def q43_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: truncation, field extraction, diffs, casts,
    epoch. DuckDB dayofweek is 0-based Sunday, Spark 1-based — aligned
    with +1 in the oracle."""
    orders = load_tables(spark, sf_dir)["orders"]
    return orders.filter(F.col("o_orderkey") < 100).select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        # date_format (not to_date): a raw DATE surfaces as python
        # datetime.date from Spark but datetime64 from DuckDB — string
        # rendering is the hash-stable cross-engine form.
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        # Both sides truncated to month-start ⇒ months_between is exact
        # (integral), sidestepping Spark's 31-day-month fractional
        # convention which DuckDB has no analog for.
        F.months_between(
            F.lit("2002-01-01").cast("timestamp"),
            F.date_trunc("month", "o_orderdate"),
        ).alias("months_to_2002"),
    )


@query(
    "q44_math_funcs",
    oracle="""
    SELECT s_suppkey,
           round(abs(s_acctbal), 2)                   AS abs_bal,
           CAST(floor(s_acctbal / 1000) AS BIGINT)    AS bal_k_floor,
           CAST(ceil(s_acctbal / 1000)  AS BIGINT)    AS bal_k_ceil,
           round(pow(s_acctbal / 1000, 2), 4)         AS bal_k_sq,
           round(ln(abs(s_acctbal) + 1), 4)           AS log_bal,
           TRUE                                       AS rand_ok,
           round(sqrt(abs(s_acctbal)), 4)             AS sqrt_bal,
           CAST(s_suppkey % 7 AS BIGINT)              AS mod7,
           greatest(s_acctbal, 1000.0)                AS floor_1k,
           least(s_acctbal, 9000.0)                   AS cap_9k
    FROM supplier
    """,
    tags=("scalar", "math"),
)
def q44_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: abs/floor/ceil/pow/ln/sqrt/mod/greatest/least."""
    s = load_tables(spark, sf_dir)["supplier"]
    return s.select(
        "s_suppkey",
        F.round(F.abs("s_acctbal"), 2).alias("abs_bal"),
        F.floor(F.col("s_acctbal") / 1000).alias("bal_k_floor"),
        F.ceil(F.col("s_acctbal") / 1000).alias("bal_k_ceil"),
        F.round(F.pow(F.col("s_acctbal") / 1000, 2), 4).alias("bal_k_sq"),
        F.round(F.log(F.abs(F.col("s_acctbal")) + 1), 4).alias("log_bal"),
        # rand(seed) values differ across engines by construction; the
        # checkable property is the [0,1) contract.
        F.rand(42).between(0.0, 0.9999999999).alias("rand_ok"),
        F.round(F.sqrt(F.abs(F.col("s_acctbal"))), 4).alias("sqrt_bal"),
        (F.col("s_suppkey") % 7).alias("mod7"),
        F.greatest(F.col("s_acctbal"), F.lit(1000.0)).alias("floor_1k"),
        F.least(F.col("s_acctbal"), F.lit(9000.0)).alias("cap_9k"),
    )


@query(
    "q45_json",
    oracle="""
    SELECT event_type,
           count(*)                                              AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 2)       AS avg_k
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json"),
)
def q45_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (`from_json` with an explicit schema — no schema
    inference job) feeding an aggregate."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.withColumn("k", F.from_json("props", "k INT").getField("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.round(F.avg("k"), 2).alias("avg_k"),
        )
    )


@query(
    "q58_json_apis",
    oracle="""
    SELECT event_type,
           min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           max(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN '{}'
                    ELSE concat('{"k":', json_extract_string(props, '$.k'), '}')
               END)                                                AS max_kjson,
           'STRUCT<k: BIGINT>'                                     AS inferred_schema
    FROM events
    GROUP BY event_type
    """,
    tags=("scalar", "json"),
)
def q58_json_apis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the JSON surface, kept OUT of the benched q45 so the
    hot path parses each document once: get_json_object (schemaless path
    extraction), to_json (struct → text round-trip), schema_of_json
    (one-sample schema discovery — the step BEFORE a production
    from_json with the schema pinned; never infer per-query at 100 TB)."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.withColumn("k2", F.get_json_object("props", "$.k").cast("int"))
        .withColumn("kjson", F.to_json(F.struct(F.col("k2").alias("k"))))
        .groupBy("event_type")
        .agg(
            F.min("k2").alias("min_k"),
            F.max("kjson").alias("max_kjson"),
        )
        .withColumn("inferred_schema", F.schema_of_json(F.lit('{"k":1}')))
    )


@query(
    "q46_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)  AS dim,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4) AS sq_norm,
           round(CAST(embedding[1] AS DOUBLE), 6)  AS first_val,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'max'), 6) AS max_val,
           CAST(length(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           list_contains(embedding, embedding[1])                      AS has_first
    FROM embeddings
    WHERE vec_id < 100
    """,
    tags=("scalar", "array", "higher-order"),
)
def q46_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over embedding vectors: transform /
    aggregate (fold) / filter / element_at — the JVM-side primitives the
    similarity operators build on (no UDF)."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(sq, 4).alias("sq_norm"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.array_max(F.transform(F.col("embedding"), lambda x: x.cast("double"))), 6
        ).alias("max_val"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
        F.array_contains("embedding", F.element_at("embedding", 1)).alias("has_first"),
    )


@query(
    "q47_map_funcs",
    oracle="""
    SELECT n_nationkey, k AS attr, v AS val,
           CAST(2 AS INTEGER) AS n_keys,
           'name,region'      AS key_csv,
           vcsv               AS val_csv
    FROM (
        SELECT n_nationkey, 'name' AS k, n_name AS v,
               concat(n_name, ',', CAST(n_regionkey AS VARCHAR)) AS vcsv
        FROM nation
        UNION ALL
        SELECT n_nationkey, 'region' AS k, CAST(n_regionkey AS VARCHAR) AS v,
               concat(n_name, ',', CAST(n_regionkey AS VARCHAR)) AS vcsv
        FROM nation
    )
    """,
    tags=("scalar", "map"),
)
def q47_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + explosion to key/value rows (create_map →
    explode), plus map introspection (map_keys/map_values) — the
    long-format rendering of struct-ish data."""
    nation = load_tables(spark, sf_dir)["nation"]
    m = F.create_map(
        F.lit("name"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return nation.select(
        "n_nationkey",
        F.explode(m).alias("attr", "val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.concat_ws(",", F.map_keys(m)).alias("key_csv"),
        F.concat_ws(",", F.map_values(m)).alias("val_csv"),
    )


@query(
    "q48_explode_split",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word ASC
    LIMIT 20
    """,
    tags=("scalar", "explode"),
)
def q48_explode_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical word count: split → explode → groupBy → top-N, all
    JVM-side (generator + partial agg + TakeOrdered)."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(20)
    )


@query(
    "q101_corrupt_tolerant_json",
    oracle="""
    WITH seeded AS (
        SELECT source, doc_id,
               CASE WHEN doc_id % 7 = 3
                    THEN '{"id":' || CAST(doc_id AS VARCHAR) || ' OOPS'
                    ELSE '{"id":' || CAST(doc_id AS VARCHAR)
                         || ',"lang":"' || lang || '"}'
               END AS payload
        FROM documents
    )
    SELECT source,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN json_valid(payload) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_parsed,
           CAST(sum(CASE WHEN NOT json_valid(payload) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_corrupt,
           CAST(sum(CASE WHEN json_valid(payload)
                    THEN CAST(json_extract(payload, '$.id') AS BIGINT) END) AS BIGINT)
               AS id_checksum
    FROM seeded
    GROUP BY source
    """,
    tags=("json", "robustness", "ingest"),
)
def q101_corrupt_tolerant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record-tolerant JSON ingestion: a deterministic ~14% of
    payloads are malformed (truncated mid-object, seeded by doc_id so
    the oracle reconstructs the exact same corruption); ``from_json``
    in its default PERMISSIVE mode yields NULL for those rows instead of
    failing the job, and the query accounts for every record — parsed
    count, corrupt count, and a checksum over successfully-parsed ids
    proving the good rows parsed *correctly*, not just non-null. This is
    the expression-level twin of ``spark.read.json``'s
    PERMISSIVE/_corrupt_record file path: at 100 TB a single bad record
    must never kill a 1000-executor ingest, and the corrupt count is the
    data-quality metric ops teams alert on."""
    docs = load_tables(spark, sf_dir)["documents"]
    payload = F.when(
        F.col("doc_id") % 7 == 3,
        F.concat(F.lit('{"id":'), F.col("doc_id").cast("string"), F.lit(" OOPS")),
    ).otherwise(
        F.concat(
            F.lit('{"id":'),
            F.col("doc_id").cast("string"),
            F.lit(',"lang":"'),
            F.col("lang"),
            F.lit('"}'),
        )
    )
    seeded = docs.select("source", payload.alias("payload"))
    # PERMISSIVE from_json yields a struct with null fields for corrupt
    # input (never a null struct); the _corrupt_record column carries the
    # raw text for exactly the malformed rows — the same contract as
    # spark.read.json's columnNameOfCorruptRecord.
    parsed = seeded.withColumn(
        "p",
        F.from_json(
            "payload",
            "id BIGINT, lang STRING, _corrupt_record STRING",
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    bad = F.col("p._corrupt_record").isNotNull()
    return parsed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((~bad).cast("bigint")).alias("n_parsed"),
        F.sum(bad.cast("bigint")).alias("n_corrupt"),
        F.sum(F.when(~bad, F.col("p.id"))).alias("id_checksum"),
    )


@query(
    "q207_try_functions",
    oracle="""
    WITH t AS (
        SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
               CASE WHEN l_discount = 0 THEN NULL
                    ELSE l_extendedprice / l_discount END          AS per_disc,
               TRY_CAST('x' || CAST(l_linenumber AS VARCHAR) AS INTEGER) AS bad_parse,
               TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER)  AS good_parse
        FROM lineitem
        WHERE l_orderkey < 200
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_rows,
           CAST(count(per_disc) AS BIGINT)                AS n_divisible,
           CAST(count(bad_parse) AS BIGINT)               AS n_bad_parsed,
           CAST(count(good_parse) AS BIGINT)              AS n_good_parsed,
           round(sum(CAST(round(per_disc * 100) AS BIGINT)) / 100.0, 2)
                                                          AS sum_per_disc
    FROM t
    """,
    tags=("scalar", "ansi", "error-handling", "try"),
)
def q207_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error containment with the ``try_*`` family: under
    Spark 4's ANSI default, division by zero and bad casts ABORT the
    job (the right default at 100 TB — a wrapped overflow is silent
    corruption); ``try_divide``/``try_cast`` opt individual
    expressions back into NULL-on-error semantics, so one dirty value
    poisons one cell, not the batch. The discount=0 rows and the
    unparseable strings are the in-fixture dirty values; counts prove
    exactly which cells nulled out.

    DuckDB divides to NULL differently (it errors too; its oracle uses
    an explicit NULLIF guard and TRY_CAST), so the oracle documents
    the portable SQL equivalent of each try_ function.

    The sum rounds each per-row quotient to integer cents BEFORE
    accumulating (both engines): each quotient is one IEEE division of
    identical inputs, so the cents are bit-determined per row, and the
    accumulation is exact integer addition — summing the raw doubles
    instead would let accumulation-order ulps flip the 2-decimal
    rounding at larger scale factors.

    Scale posture: all map-side scalar work; the containment property
    is what matters — a quarantine filter on ``per_disc IS NULL``
    routes dirty rows aside exactly as q197 does for corrupt CSV."""
    li = load_tables(spark, sf_dir)["lineitem"].where(F.col("l_orderkey") < 200)
    t = li.select(
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "per_disc"
        ),
        F.try_to_number(
            F.concat(F.lit("x"), F.col("l_linenumber").cast("string")),
            F.lit("999"),
        ).cast("int").alias("bad_parse"),
        F.try_to_number(
            F.col("l_linenumber").cast("string"), F.lit("999")
        ).cast("int").alias("good_parse"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("per_disc").alias("n_divisible"),
        F.count("bad_parse").alias("n_bad_parsed"),
        F.count("good_parse").alias("n_good_parsed"),
        F.round(
            F.sum(F.round(F.col("per_disc") * 100).cast("long")) / 100.0, 2
        ).alias("sum_per_disc"),
    )


@query(
    "q210_variant_semistructured",
    oracle="""
    WITH v AS (
        SELECT event_type,
               TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT)  AS n_events,
           CAST(count(k) AS BIGINT)  AS n_with_k,
           CAST(sum(k) AS BIGINT)    AS sum_k,
           CAST(min(k) AS INTEGER)   AS min_k,
           CAST(max(k) AS INTEGER)   AS max_k
    FROM v
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("scalar", "json", "variant", "semistructured"),
)
def q210_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured handling (Spark 4): ``parse_json``
    ingests the raw JSON string ONCE into the binary variant encoding,
    and typed paths come out via ``try_variant_get`` — no up-front
    schema, unlike q45's ``from_json(schema)``, and no re-parse per
    extracted field, unlike chained ``get_json_object`` calls. This is
    the schema-flexible lane for payloads whose shape drifts; q45/q58
    remain the schema-pinned fast lane.

    Scale posture: variant parse+extract is map-side columnar work;
    at 100 TB the win is storing the PARSED variant column so every
    downstream query skips string parsing entirely (shred-on-write).
    The rollup is bounded-key partial+final."""
    ev = load_tables(spark, sf_dir)["events"]
    v = ev.select(
        "event_type",
        F.try_variant_get(F.parse_json(F.col("props")), "$.k", "int").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "q224_json_key_drift",
    oracle="""
    WITH seeded AS (
        SELECT event_id, ts,
               CASE WHEN event_id % 3 = 0 THEN
                   '{"k": ' || CAST(event_id % 100 AS VARCHAR)
                   || ', "retry": ' || CAST(event_id % 5 AS VARCHAR) || '}'
               WHEN event_id % 7 = 0 THEN
                   '{"k": ' || CAST(event_id % 100 AS VARCHAR)
                   || ', "trace_id": "t' || CAST(event_id AS VARCHAR) || '"}'
               ELSE '{"k": ' || CAST(event_id % 100 AS VARCHAR) || '}'
               END AS payload,
               CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                    THEN 'early' ELSE 'late' END AS half
        FROM events
    ),
    keys AS (
        SELECT half, unnest(json_keys(payload)) AS key FROM seeded
    )
    SELECT key,
           CAST(sum(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_early,
           CAST(sum(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late
    FROM keys
    GROUP BY key
    ORDER BY key
    """,
    tags=("scalar", "json", "schema-drift", "map"),
)
def q224_json_key_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-key JSON profiling: payloads parse into a MAP type
    (``from_json(.., "map<string,string>")`` — no schema pinned, keys
    discovered per row via ``map_keys``) and key frequencies are
    compared between the early and late halves of the stream — the
    drift detector that notices an upstream service started emitting a
    new field (or dropped one) before any schema-pinned job breaks.
    The fixture props carry one fixed key, so payloads are seeded with
    deterministic conditional extra keys (q54's seeding pattern); the
    oracle replays the construction with ``json_keys``.

    Completes the JSON lanes: q45/q58 schema-pinned structs, q210
    variant paths, and now schema-free map discovery.

    Scale posture: parse + explode of keys is map-side; the rollup is
    bounded by the distinct key universe. In production this runs on a
    sample tail of the stream, not the full corpus."""
    ev = load_tables(spark, sf_dir)["events"]
    payload = (
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(
                F.lit('{"k": '),
                (F.col("event_id") % 100).cast("string"),
                F.lit(', "retry": '),
                (F.col("event_id") % 5).cast("string"),
                F.lit("}"),
            ),
        )
        .when(
            F.col("event_id") % 7 == 0,
            F.concat(
                F.lit('{"k": '),
                (F.col("event_id") % 100).cast("string"),
                F.lit(', "trace_id": "t'),
                F.col("event_id").cast("string"),
                F.lit('"}'),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('{"k": '),
                (F.col("event_id") % 100).cast("string"),
                F.lit("}"),
            )
        )
    )
    half = F.when(
        F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"), "early"
    ).otherwise("late")
    keys = ev.select(
        half.alias("half"),
        F.explode(
            F.map_keys(F.from_json(payload, "map<string,string>"))
        ).alias("key"),
    )
    return (
        keys.groupBy("key")
        .agg(
            F.sum((F.col("half") == "early").cast("long")).alias("n_early"),
            F.sum((F.col("half") == "late").cast("long")).alias("n_late"),
        )
        .orderBy("key")
    )
