"""Skew-mitigation join (salting) — the manual fallback when AQE's
skew-join splitting isn't available or the skew is in a broadcast-
ineligible dimension.

At 100 TB a single hot key (one viral session, one null-ish default
UUID) can put an entire shuffle partition on one executor. Salting
rewrites ``A ⋈ B on k`` as ``A' ⋈ B' on (k, salt)``:

- the large/skewed side gets a RANDOM salt in [0, n)
- the small side is EXPLODED n ways (every salt value per row)

so the hot key spreads over n partitions at the cost of replicating
the small side n times. AQE's runtime skew splitting
(``spark.sql.adaptive.skewJoin``, on in our session factory) is
preferred when it applies; this operator is for engineered pipelines
that must not depend on runtime re-planning (e.g. deterministic
partition layouts before a bucketed write).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the ``skewed`` side.

    ``rand()`` seeds the salt per-row on the skewed side (values in
    [0, num_salts)); the small side is exploded across every salt so
    every (key, salt) pair finds its match. Output columns match a
    plain ``skewed.join(small, on, how)``.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted = skewed.withColumn(
        SALT_COL, (F.rand(seed=42) * num_salts).cast("int")
    )
    exploded = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return salted.join(exploded, [*on, SALT_COL], how).drop(SALT_COL)


def key_skew_profile(df: DataFrame, keys: Sequence[str], top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts for the heaviest keys plus their
    share of the table — how you decide whether to salt, and with how
    many salts (aim: hottest_key_rows / num_salts <= rows_per_partition
    budget)."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top)
    )
