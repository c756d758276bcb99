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
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join robust to hot keys on the ``skewed`` side.

    The salt is CONTENT-BASED — ``pmod(xxhash64(salt_cols), n)`` — not
    ``rand()``: rand's output depends on partition layout and changes
    under repartition or task retry, which contradicts this operator's
    whole reason to exist (deterministic layouts that must not depend on
    runtime re-planning). A content hash is retry-stable, just as
    uniform, and reproducible across runs.

    ``salt_cols`` are the columns the salt hashes — they must VARY
    WITHIN a join key (a row id, an event timestamp), since salting on
    the join key itself would land every row of the hot key in one salt
    bucket. Defaults to all non-key columns. The small side is exploded
    across every salt so every (key, salt) pair finds its match. Output
    columns match a plain ``skewed.join(small, on, how)``.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    hash_cols = list(salt_cols) if salt_cols else [
        c for c in skewed.columns if c not in set(on)
    ]
    if not hash_cols:
        raise ValueError(
            "no salt_cols: every column is a join key, so a content salt "
            "cannot spread the hot key — add a row-varying column"
        )
    salted = skewed.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in hash_cols]), F.lit(num_salts)).cast("int"),
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
