"""Bucketed range (band/interval) join — a custom operator for
time-window predicates like "right events within [left_ts - lo,
left_ts + hi]" that plain Spark plans as BroadcastNestedLoopJoin
(O(|L|·|R|)) the moment the condition stops being an equality.

Physical strategy — *bucketing*: quantize time into fixed buckets of
``bucket`` width (>= the window span), explode each left row to the
bucket range its window can touch, and equi-join on (keys, bucket)
before applying the exact band predicate:

    left  -> explode(bucket ids covering [ts-lo, ts+hi])   (~2-3 rows)
    right -> bucket id = floor(ts / bucket)                (1 row)
    equi-join on (keys..., bucket) -> filter exact predicate

The join is a plain hash/sort-merge equi-join Catalyst can size, and
the fan-out is bounded by ``ceil(span/bucket) + 1`` (pick ``bucket``
~= the window span for a fan-out of 2-3). Cost follows actual bucket
collisions, not |L|·|R| — the same blocking idea the dedup operators
use for shingles (operators.dedup), applied to the time axis. At 100
TB the bucket width is the knob: wider buckets shuffle fewer rows but
compare more candidate pairs per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    bucket: int | None = None,
) -> DataFrame:
    """Inner join pairing each left row with every right row satisfying
    ``left_ts - lower <= right_ts <= left_ts + upper`` within the same
    key group. Timestamps are integral (e.g. epoch µs); ``lower`` /
    ``upper`` are nonnegative offsets in the same unit. Right columns
    that collide with left ones come back suffixed ``_r``.
    """
    if lower < 0 or upper < 0:
        raise ValueError("lower/upper must be nonnegative offsets")
    bucket = bucket or max(lower + upper, 1)

    lo_b = (F.col(left_ts) - F.lit(lower)).cast("long") / F.lit(bucket)
    hi_b = (F.col(left_ts) + F.lit(upper)).cast("long") / F.lit(bucket)
    l_exp = left.withColumn(
        _BUCKET, F.explode(F.sequence(F.floor(lo_b), F.floor(hi_b)))
    )
    r_tagged = right.withColumn(
        _BUCKET, F.floor(F.col(right_ts).cast("long") / F.lit(bucket))
    )
    renames = {c: f"{c}_r" for c in right.columns if c in left.columns}
    for old, new in renames.items():
        r_tagged = r_tagged.withColumnRenamed(old, new)
    rts = renames.get(right_ts, right_ts)

    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{renames.get(k, k)}"))
    cond = (
        cond
        & (F.col(f"l.{_BUCKET}") == F.col(f"r.{_BUCKET}"))
        & (F.col(f"r.{rts}") >= F.col(f"l.{left_ts}") - F.lit(lower))
        & (F.col(f"r.{rts}") <= F.col(f"l.{left_ts}") + F.lit(upper))
    )
    joined = l_exp.alias("l").join(r_tagged.alias("r"), cond, "inner")
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{renames.get(c, c)}").alias(renames.get(c, c))
        for c in right.columns
        if c not in keys  # key cols are equal on both sides; emit once
    ]
    return joined.select(*keep)
