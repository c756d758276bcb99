"""Shuffle-reduction join patterns beyond broadcast (J1 extensions).

The reference's only join is a two-frame pandas merge
(`dags/evidence_images_processing.py:131-140`); at 100 TB the join
COST is dominated by shuffling non-matching big-side rows. Spark's
AQE injects runtime bloom filters for some shapes
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), but an EXPLICIT
operator matters when the filter must persist across queries/batches
(build once, reuse for a day of loads) or when the build side is a
prior pipeline stage AQE cannot see. This module composes the
DataFrame-native Bloom bitmap from `operators/dedup.py`
(`bloom_build` / `bloom_might_contain` — bit_or-mergeable rows, no
UDF) into join pre-filters.

Scale shape: the small side's KEY SET bloom is ~num_bits/64 rows
(~128 KiB at 2^23 bits) no matter how many rows the small side has —
broadcastable even when the small side itself is NOT. The big side is
pre-filtered entirely map-side (k broadcast word-lookups + bit
tests), so only might-match rows enter the join shuffle; false
positives (~0.1% at default sizing) are eliminated by the exact join
itself, so results are exact, never approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.operators.dedup import (
    bloom_build,
    bloom_might_contain,
)


def build_key_bloom(
    small: DataFrame, key: str, num_bits: int = 1 << 23
) -> DataFrame:
    """Bloom bitmap over ``small``'s distinct join keys — a tiny
    ``(word, bits)`` table to persist and broadcast into any number of
    later probe plans (the cross-batch reuse AQE's runtime filters
    cannot give you). Build cost: one pass over the small side's key
    column only."""
    return bloom_build(
        small.select(F.col(key).cast("string").alias("__k")).distinct(),
        "__k",
        num_bits=num_bits,
    )


def bloom_prefiltered_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    num_bits: int = 1 << 23,
    bloom: DataFrame | None = None,
) -> DataFrame:
    """Join ``big`` to ``small`` on ``key`` with the big side Bloom
    pre-filtered before any shuffle: rows whose key definitively is
    not in ``small`` drop map-side, so the join exchange carries only
    might-match rows. The exact join then removes Bloom false
    positives — output is identical to ``big.join(small, key, how)``
    (the oracle property the workload query pins). Pass a prebuilt
    ``bloom`` (from :func:`build_key_bloom`) to amortize the build
    across many probe queries/batches. Supported ``how``: inner /
    left_semi (shapes where dropped big-side rows cannot appear in
    the result)."""
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(f"bloom prefilter is only sound for inner/semi, got {how}")
    if bloom is None:
        bloom = build_key_bloom(small, key, num_bits)
    probed = bloom_might_contain(
        big.withColumn("__k", F.col(key).cast("string")),
        "__k",
        bloom,
        num_bits=num_bits,
    )
    survivors = probed.filter(F.col("__might_contain")).drop(
        "__k", "__might_contain"
    )
    return survivors.join(small, key, how)


def join_size_by_degree(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_n: int = 5,
) -> DataFrame:
    """EXACT equi-join output size + per-key skew attribution WITHOUT
    executing the join — the pre-flight check before any fact-fact
    join at 100 TB. |A join B| = sum over keys of n_a(k) * n_b(k), so
    aggregating each side to per-key degrees and joining THOSE (one
    row per distinct key, not per output row) prices the join and
    names the keys that dominate it. The report is what decides the
    strategy: a handful of keys carrying most of the output means
    salting / AQE skew-join; a bounded total means just run it; an
    astronomical total means the join predicate is wrong — discovered
    for the cost of two aggregates instead of an executor-killing
    shuffle. Returns the top_n heaviest keys:
    (key, n_left, n_right, pairs, pct_of_total, total_pairs, rank).

    Scale shape: two map-side-combinable groupBy counts (partial aggs
    shrink each side to its distinct keys before the shuffle), one
    join on the degree tables, a 1-row total broadcast back, and a
    global top-n window over the degree table (WindowGroupLimit keeps
    n rows per partition map-side). Nothing here is ever the size of
    the join output."""
    da = left.groupBy(F.col(key)).agg(F.count("*").cast("bigint").alias("n_left"))
    db = right.groupBy(F.col(key)).agg(F.count("*").cast("bigint").alias("n_right"))
    deg = da.join(db, key).select(
        key, "n_left", "n_right", (F.col("n_left") * F.col("n_right")).alias("pairs")
    )
    total = deg.agg(F.sum("pairs").cast("bigint").alias("total_pairs"))
    w = Window.orderBy(F.col("pairs").desc(), F.col(key))
    return (
        deg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .crossJoin(F.broadcast(total))
        .select(
            key,
            "n_left",
            "n_right",
            "pairs",
            F.round(
                F.col("pairs").cast("double") / F.col("total_pairs").cast("double"), 6
            ).alias("pct_of_total"),
            "total_pairs",
            "rank",
        )
    )
