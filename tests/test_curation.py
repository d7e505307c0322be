"""Unit edge cases for the corpus-curation operators
(``functions/curation.py``): bigram construction on degenerate
documents, PII-scrub completeness/idempotence, quantization on constant
vectors, and split/shard-key independence."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from azure_batch_map_reduce_spark.functions.curation import (
    EMAIL_RE,
    IPV4_RE,
    _bigrams,
)


def test_bigrams_degenerate_docs(spark):
    df = spark.createDataFrame(
        [Row(id=1, text=""), Row(id=2, text="one"), Row(id=3, text="a b c")],
        "id int, text string",
    )
    out = {
        r["id"]: r["bg"]
        for r in df.select(
            "id", _bigrams(F.split("text", " ")).alias("bg")
        ).collect()
    }
    # <2 words must give an EMPTY list (Spark's sequence(1, 0) would
    # otherwise produce a descending [1, 0] and wrong bigrams).
    assert out[1] == [] and out[2] == []
    assert out[3] == ["a b", "b c"]


def test_pii_scrub_removes_and_is_idempotent(spark):
    raw = "mail bob.smith+x@corp.example.org then 192.168.0.1 end"
    df = spark.createDataFrame([Row(s=raw)])
    clean = F.regexp_replace(
        F.regexp_replace(F.col("s"), EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    once = df.select(clean.alias("s"))
    got = once.collect()[0]["s"]
    assert got == "mail <EMAIL> then <IP> end"
    # Idempotent: scrubbing already-scrubbed text changes nothing.
    assert once.select(clean.alias("s")).collect()[0]["s"] == got


def test_quantize_constant_vector_has_zero_error(spark):
    df = spark.createDataFrame([Row(e=[3.0, 3.0, 3.0])])
    sc = (F.array_max("e") - F.array_min("e")) / 255.0
    err = F.when(sc == 0, F.lit(0.0)).otherwise(F.lit(None))
    assert df.select(err.alias("err")).collect()[0]["err"] == 0.0


def test_split_and_shard_keys_are_independent(spark):
    # q55 uses md5 bytes 1-8, q75 uses bytes 9-16: a document's train/
    # valid/test membership must not correlate with its export shard.
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    md5 = F.md5(F.col("doc_id").cast("string"))
    bucket = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long") % 100
    shard = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long") % 16
    got = (
        df.select(
            (bucket >= 90).cast("int").alias("is_test"), shard.alias("shard")
        )
        .groupBy("shard")
        .agg(F.avg("is_test").alias("test_frac"))
        .collect()
    )
    assert len(got) == 16
    # Every shard contains test docs at roughly the global 10% rate.
    for r in got:
        assert 0.0 < r["test_frac"] < 0.35
