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

from pyspark.sql import DataFrame
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
