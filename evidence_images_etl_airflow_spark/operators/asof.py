"""As-of (time-travel) join — a custom operator Spark's DataFrame API
lacks (SURVEY.md §2.5 notes the reference has equi-joins only; this is
an engine extension for the time-series side of the training-data
pipeline, e.g. "attach the latest profile snapshot to each event").

Semantics match ``pandas.merge_asof`` / DuckDB ``ASOF JOIN``
(backward direction, exact matches allowed): for every left row, the
appended payload comes from the right row with the largest
``right_ts <= left_ts`` within the same key group, or NULL when no
such row exists (left-outer).

Physical strategy — the *union trick*, not a join:

    tag(left side=1, right side=0) -> unionByName
      -> window last(payload, ignorenulls) over
           (PARTITION BY keys ORDER BY ts, side ROWS UNBOUNDED PRECEDING)
      -> filter side=1

One shuffle on the key columns, one in-partition sort, zero row
explosion — cost is O((|L|+|R|) log p) regardless of how many right
rows precede each left row. The naive alternative (theta-join on
``r.ts <= l.ts`` + max-window) explodes to O(|L|·|R|) per key and is
exactly the plan a 100-TB run cannot survive. Skewed keys behave like
any keyed window: salt upstream if one key dominates (operators.skew).

The caller must make the right side unique per (keys, ts) — e.g. by
pre-aggregating — for fully deterministic output; with duplicates the
survivor among equal timestamps is the last in (ts, side) order, which
is engine-dependent. ``tolerance`` (in ts units) additionally NULLs
payloads older than ``left_ts - tolerance``, mirroring
``merge_asof(tolerance=...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_RTS = "__asof_rts"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance: int | float | None = None,
) -> DataFrame:
    """Left-outer backward as-of join.

    Returns all ``left`` columns plus, per payload column ``c``, the
    value of ``c`` from the latest right row at-or-before the left
    row's timestamp (NULL if none, or none within ``tolerance``).
    """
    overlap = [c for c in payload if c in left.columns]
    if overlap:
        raise ValueError(f"payload columns collide with left side: {overlap}")

    l_tagged = left.withColumn(_SIDE, F.lit(1)).withColumn(_RTS, F.lit(None).cast("long"))
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).cast("long").alias(_RTS),
        *payload,
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows (side=0) sort before left rows at the same timestamp,
    # so an exact-timestamp match is visible to the left row
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(left_ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in payload:
        filled = filled.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    filled = filled.withColumn(_RTS, F.last(F.col(_RTS), ignorenulls=True).over(w))

    out = filled.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        stale = F.col(_RTS).isNull() | (
            F.col(left_ts).cast("long") - F.col(_RTS) > F.lit(tolerance)
        )
        for c in payload:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out.drop(_SIDE, _RTS)
