"""Similarity search over the ``embeddings`` table (array<float> column).

- Brute-force cosine (baseline): dot/norm via ``F.aggregate``/``F.zip_with``
  higher-order functions — JVM-side, no Python.  Elements are cast to
  double first so results are engine-portable to 1e-15.
- LSH-bucketed ANN (scale path): deterministic sign-bit bucket on 8 fixed
  dimensions; the candidate join is an equi-join on the bucket key, so at
  cluster scale the shuffle is keyed and bounded instead of a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("emb"),
        "label",
    )


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def cosine_neighbors(
    spark: SparkSession, sf_dir: str, threshold: float = 0.25, n_queries: int = 20
) -> DataFrame:
    """Threshold-based neighbor set for the first ``n_queries`` vectors
    (set semantics — robust to float ordering across engines)."""
    e = embeddings(spark, sf_dir)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    pairs = F.broadcast(q).crossJoin(e.select(F.col("vec_id").alias("neighbor_id"), "emb"))
    sim = _cosine(F.col("qe"), F.col("emb"))
    return (
        pairs.filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(sim, 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def knn_topk(
    spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 10
) -> DataFrame:
    """Brute-force cosine top-k per query vector (rank by sim desc,
    neighbor_id asc tie-break)."""
    e = embeddings(spark, sf_dir)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    pairs = F.broadcast(q).crossJoin(
        e.select(F.col("vec_id").alias("neighbor_id"), "emb")
    )
    sim = _cosine(F.col("qe"), F.col("emb"))
    scored = pairs.filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"),
            F.round("sim", 4).alias("cosine"),
        )
    )


def _bucket(emb):
    """Deterministic 8-bit sign bucket on dimensions 0..7 (0-based)."""
    b = F.lit(0)
    for j in range(8):
        b = b + F.when(F.element_at(emb, j + 1) > 0, F.lit(1 << j)).otherwise(0)
    return b


def ann_lsh(
    spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 10
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates restricted to the query's
    sign-bit bucket (equi-join, not cross join), then exact cosine + rank.
    The 100TB-scale pattern: bucket key partitions the corpus."""
    e = embeddings(spark, sf_dir).withColumn("bucket", _bucket(F.col("emb")))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"), "bucket"
    )
    cand = q.join(
        e.select(F.col("vec_id").alias("neighbor_id"), "emb", "bucket"), "bucket"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    sim = _cosine(F.col("qe"), F.col("emb"))
    scored = cand.select("query_id", "neighbor_id", sim.alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"), F.round("sim", 4).alias("cosine"))
    )
