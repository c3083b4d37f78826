"""Similarity search over an embedding column (array<float>).

- ``cosine_top_k`` — brute-force exact top-k for one query: a broadcast
  of the query vector + a JVM-side aggregate over zip_with products
  (no Python in the loop), then TakeOrderedAndProject. Linear scan;
  the correct baseline and the verifier for ANN variants.
- ``sign_lsh_buckets`` — random-hyperplane-style sign LSH (here: fixed
  coordinate signs for cross-engine determinism); bucket sizes are the
  partition plan for the ANN path: query only its own bucket (and
  neighbors at Hamming distance 1) instead of the full corpus.
- ``ann_top_k`` — the scale path: restrict the exact scan to the
  query's LSH bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SIGN_DIMS = [1, 8, 20, 34]  # 1-based, matches element_at / DuckDB lists


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_top_k(
    embeddings: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    q = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    sims = (
        embeddings.where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                _dot(F.col("embedding"), F.col("qv"))
                / (_norm(F.col("embedding")) * _norm(F.col("qv")))
            ).alias("cos_sim_raw"),
        )
    )
    return (
        sims.select("vec_id", F.round("cos_sim_raw", 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def sign_lsh_buckets(embeddings: DataFrame) -> DataFrame:
    bucket = F.concat(
        *[
            F.when(F.element_at(F.col("embedding"), d) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for d in _SIGN_DIMS
        ]
    )
    return embeddings.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.min("vec_id").alias("min_vec_id"),
    )


def _with_bucket(embeddings: DataFrame) -> DataFrame:
    bucket = F.concat(
        *[
            F.when(F.element_at(F.col("embedding"), d) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for d in _SIGN_DIMS
        ]
    )
    return embeddings.withColumn("bucket", bucket)


def ann_top_k(embeddings: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket.

    At 100 TB the corpus is written bucket-partitioned, so this prunes
    the scan to one partition; recall is tuned by bits and by probing
    neighbor buckets.
    """
    eb = _with_bucket(embeddings)
    qb = eb.where(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket"), F.col("embedding").alias("qv")
    )
    cand = eb.join(
        F.broadcast(qb), F.col("bucket") == F.col("qbucket")
    ).where(F.col("vec_id") != query_vec_id)
    sims = cand.select(
        "vec_id",
        (
            _dot(F.col("embedding"), F.col("qv"))
            / (_norm(F.col("embedding")) * _norm(F.col("qv")))
        ).alias("cos_sim_raw"),
    )
    return (
        sims.select("vec_id", F.round("cos_sim_raw", 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )
