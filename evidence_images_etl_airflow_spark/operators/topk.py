"""Skew-safe top-k per group (two-phase salted ranking).

The plain pattern — one ranking window per group key — puts each
group's ENTIRE row set into one task. A hot key (one customer with
10^9 orders, one domain with most of a crawl) becomes a straggler the
partition-count dial can't fix. The two-phase rewrite bounds it:

  phase 1: rank within (group, salt) — the hot group's rows split
           across ``num_salts`` tasks; keep each salt's local top-k.
  phase 2: rank the ≤ k·num_salts survivors per group — tiny.

Correct because any row in the true top-k is also in the top-k of its
own salt bucket (ranks only shrink when rows are removed), so phase 1
never discards a final answer. The result is row-identical to the
one-window form — same oracle verifies both.

The salt is content-derived (xxhash64 of the ordering columns mod
num_salts), so the plan is deterministic and retry-stable — no
``rand()``, same rule as operators/skew.salted_join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group_salted(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    num_salts: int = 8,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-``k`` rows per group under ``order_cols`` (end with a
    unique tie-break for deterministic results), hot-group-safe. The
    salt hashes every input column (order_cols may carry sort
    direction, which is not hashable), so identical rows co-bucket —
    harmless, ranking dedups nothing."""
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts)),
    )
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order_cols)
    local = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1", "__salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        local.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
