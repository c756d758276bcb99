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
_PACK = "__asof_pack"


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

    # All payload columns + the right timestamp travel in ONE struct:
    # per-column last(ignorenulls) would skip a right row whose payload
    # value is legitimately NULL and resurrect an older row's value
    # (diverging from merge_asof/DuckDB ASOF), and could disagree with
    # the _RTS used for the tolerance cutoff. The struct is non-null on
    # every right row (even all-NULL fields), so the whole row rides or
    # none of it does — and it's a single window fill instead of N+1.
    l_tagged = left.withColumn(_SIDE, F.lit(1))
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias(_SIDE),
        F.struct(
            F.col(right_ts).cast("long").alias(_RTS),
            *[F.col(c) for c in payload],
        ).alias(_PACK),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows (side=0) sort before left rows at the same timestamp,
    # so an exact-timestamp match is visible to the left row
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(left_ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(_PACK, F.last(F.col(_PACK), ignorenulls=True).over(w))

    out = filled.filter(F.col(_SIDE) == 1)
    matched = F.col(_PACK).isNotNull()
    if tolerance is not None:
        matched = matched & (
            F.col(left_ts).cast("long") - F.col(_PACK)[_RTS] <= F.lit(tolerance)
        )
    for c in payload:
        out = out.withColumn(c, F.when(matched, F.col(_PACK)[c]))
    return out.drop(_SIDE, _PACK)
