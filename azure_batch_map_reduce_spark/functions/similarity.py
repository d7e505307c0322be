"""Similarity search over embedding vectors: brute-force cosine top-k
(the exact baseline) and an LSH-bucketed approximate variant (the scale
path), plus aggregate similarity statistics.

Dot products use JVM-side higher-order functions (``zip_with`` +
``aggregate``) — no Python UDF, so the arithmetic runs inside codegen and
is byte-identical to the DuckDB oracle's ``list_dot_product`` after
rounding to 6 decimals.

100 TB posture: brute-force top-k against one query is a map + TakeOrdered
(no shuffle of the corpus). The LSH variant buckets by a sign-bit
signature so candidate generation is an equi-join on the bucket key;
recall/latency trades off via the number of signature bits. For
corpus×corpus knn you'd pre-partition by bucket and only cross bucket
mates — the q71 shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from azure_batch_map_reduce_spark.catalog import load_tables
from azure_batch_map_reduce_spark.registry import query


def _dot(u: Column, v: Column) -> Column:
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


@query(
    "q70_cosine_topk",
    oracle="""
    WITH q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
        FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
        SELECT e.vec_id, e.label,
               round(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qe)
                     / sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                                             list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
                            * list_dot_product(q.qe, q.qe)), 6) AS cosine
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, label, cosine
    FROM scored
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
    """,
    tags=("similarity", "knn"),
)
def q70_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against a fixed query vector (vec_id 0).
    The query vector is broadcast (scalar subquery → literal); the corpus
    scan is embarrassingly parallel and top-k is TakeOrdered — no corpus
    shuffle at any scale."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    q = emb.filter(F.col("vec_id") == 0).select(
        _as_double(F.col("embedding")).alias("qe")
    )
    e = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("e")
    )
    scored = e.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        F.round(
            _dot(F.col("e"), F.col("qe"))
            / F.sqrt(_dot(F.col("e"), F.col("e")) * _dot(F.col("qe"), F.col("qe"))),
            6,
        ).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(10)


@query(
    "q71_lsh_bucketed_ann",
    oracle="""
    WITH n AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
               concat_ws('', CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
                             CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
                             CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
                             CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END,
                             CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END,
                             CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END) AS sig
        FROM embeddings
    ),
    pairs AS (
        SELECT a.sig, a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_dot_product(a.e, b.e)
                     / sqrt(list_dot_product(a.e, a.e) * list_dot_product(b.e, b.e)), 6) AS cosine
        FROM n a JOIN n b ON a.sig = b.sig AND a.vec_id < b.vec_id
    )
    SELECT sig, vec_a, vec_b, cosine
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY sig ORDER BY cosine DESC, vec_a ASC, vec_b ASC) AS rn
        FROM pairs
    ) WHERE rn <= 5
    """,
    tags=("similarity", "lsh", "ann"),
)
def q71_lsh_bucketed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via sign-bit LSH: a 6-bit signature
    (signs of the first 6 dimensions ≡ random-hyperplane hashes for
    axis-aligned planes) buckets the corpus; candidate pairs form only
    inside buckets; top-5 per bucket by cosine. The equi-join on `sig`
    replaces the all-pairs cross product — this is the 100 TB path."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    sig = F.concat_ws(
        "",
        *[
            F.when(F.element_at("embedding", i) >= 0, "1").otherwise("0")
            for i in range(1, 7)
        ],
    )
    n = emb.select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("e"), sig.alias("sig")
    )
    a = n.select("sig", F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"))
    b = n.select(
        F.col("sig").alias("sig_b"), F.col("vec_id").alias("vec_b"), F.col("e").alias("eb")
    )
    pairs = a.join(
        b, (F.col("sig") == F.col("sig_b")) & (F.col("vec_a") < F.col("vec_b"))
    ).select(
        "sig",
        "vec_a",
        "vec_b",
        F.round(
            _dot(F.col("ea"), F.col("eb"))
            / F.sqrt(_dot(F.col("ea"), F.col("ea")) * _dot(F.col("eb"), F.col("eb"))),
            6,
        ).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("sig").orderBy(
        F.col("cosine").desc(), F.col("vec_a").asc(), F.col("vec_b").asc()
    )
    return pairs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).drop("rn")


@query(
    "q72_label_centroid_similarity",
    oracle="""
    WITH n AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ),
    dims AS (
        SELECT label, i, avg(e[i]) AS c
        FROM n, generate_series(1, 64) AS t(i)
        GROUP BY label, i
    ),
    centroids AS (
        SELECT label, list(c ORDER BY i) AS centroid FROM dims GROUP BY label
    )
    SELECT n.label,
           count(*) AS n_vecs,
           round(avg(list_dot_product(n.e, c.centroid)
                 / sqrt(list_dot_product(n.e, n.e) * list_dot_product(c.centroid, c.centroid))), 4)
               AS avg_cos_to_centroid
    FROM n JOIN centroids c ON n.label = c.label
    GROUP BY n.label
    """,
    tags=("similarity", "centroid"),
)
def q72_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (dimension-wise mean, the k-means/IVF training
    step) and each vector's cosine to its centroid — computed by
    exploding (vec, dim) then re-assembling, the distributed layout for
    vector aggregate math."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    n = emb.select("vec_id", "label", _as_double(F.col("embedding")).alias("e"))
    dims = (
        n.select(
            "label",
            F.posexplode("e").alias("i0", "val"),
        )
        .withColumn("i", F.col("i0") + 1)
        .groupBy("label", "i")
        .agg(F.avg("val").alias("c"))
    )
    centroids = dims.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s.getField("c")
        ).alias("centroid")
    )
    joined = n.join(F.broadcast(centroids), "label")
    cos = F.round(
        F.avg(
            _dot(F.col("e"), F.col("centroid"))
            / F.sqrt(
                _dot(F.col("e"), F.col("e"))
                * _dot(F.col("centroid"), F.col("centroid"))
            )
        ),
        4,
    )
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"), cos.alias("avg_cos_to_centroid")
    )
