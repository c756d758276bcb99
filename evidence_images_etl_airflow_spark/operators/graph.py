"""Iterative graph algorithms on DataFrames (beyond the label
propagation in operators/dedup.connected_components): PageRank by
power iteration.

Scale shape per iteration: one join of the rank vector to the edge
list (both partitioned on the join key — AQE keeps the exchange
reused across iterations) plus one aggregation onto destinations.
State between iterations is materialized (persist + eager count) so
the lineage doesn't grow by two joins per round — the same
localCheckpoint discipline as connected_components. Iteration count
is fixed (power iteration converges geometrically; fixed rounds keep
the result deterministic and oracle-comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark import caching


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)`` — pass both
    directions for an undirected graph. Every node is assumed to have
    out-degree ≥ 1 (true for undirected graphs; add self-loops or a
    dangling-mass term otherwise). Returns ``(node, rank)`` with the
    uniform 1/N start and ``iterations`` fixed power steps."""
    edges = edges.select("src", "dst").distinct()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__in"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.lit(damping) * F.col("__in")).alias("rank"),
        )
        ranks = caching.materialize(ranks)
    return ranks
