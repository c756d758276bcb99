"""Similarity search over embedding columns (SURVEY.md §7 M7).

Two tiers, mirroring how ANN systems scale:
- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  The query side is tiny and broadcast, so the corpus is scanned once
  with no shuffle of the corpus itself; per-query top-k is a window
  over (query, score).
- ``lsh_topk``: sign-LSH bucketed search — queries only meet corpus
  vectors in their hyperplane bucket. At 100 TB the bucket join
  replaces the full scan-per-query with an equality shuffle on the
  bucket key; recall is tunable via the number of planes.

Scores fold in double precision (functions.vectors) and are rounded to
6dp *before* ranking so the top-k cut is reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.functions.partitioning import spread
from evidence_images_etl_airflow_spark.functions.vectors import (
    cosine,
    hyperplane_signature,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for each query vector (self-matches
    excluded). Returns (query_id, neighbor_id, cos_sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = spread(corpus, F.col(id_col)).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, exact cosine within. Same output shape as brute_force_topk;
    rows may be fewer than k when a bucket is small (the approximate
    trade)."""
    sig = lambda df, idname, vecname: df.select(  # noqa: E731
        F.col(id_col).alias(idname),
        F.col(vec_col).alias(vecname),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = sig(queries, "query_id", "qvec")
    c = sig(spread(corpus, F.col(id_col)), "neighbor_id", "cvec")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
