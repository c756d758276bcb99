"""Ordered-sequence pattern matching over grouped event streams — a
declarative MATCH_RECOGNIZE analog.

The reference pipeline has no sequence analytics (its events are file
arrivals consumed one at a time, ``dags/evidence_images_etl.py``); this
is north-star surface for the events stream: classify each entity's
ordered journey by REGULAR EXPRESSIONS over a symbol alphabet instead
of hand-written join cascades (compare ``events_funnel``'s three-way
self-join — a funnel is the special case ``'vc*p'``).

How it scales: ONE shuffle on the grouping key; within each group the
journey is rebuilt deterministically (``collect_list`` of
``(order_cols…, symbol)`` structs + ``array_sort`` — the repo's
fp/order-determinism idiom, immune to Spark's unordered aggregation
buffers) and every pattern is a row-local JVM ``regexp_count`` — no
joins, no window functions, whole-stage codegen end to end. Journeys
are per-entity bounded (sessionize first — ``events_sessionization`` —
when an entity's history is unbounded; the operator composes with any
upstream key). Patterns must stick to constructs where leftmost
non-overlapping match counts agree across regex engines (no lazy
quantifiers, no lookaround) so results stay oracle-able bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def symbolize(mapping: Mapping[str, str], col: str | Column, default: str = "x") -> Column:
    """Map a categorical column onto single-character symbols. Every
    symbol must be exactly one char (the journey string is indexed by
    position) and distinct; unmapped values fall to ``default``."""
    syms = list(mapping.values()) + [default]
    if any(len(s) != 1 for s in syms):
        raise ValueError(f"symbols must be single characters, got {syms!r}")
    if len(set(mapping.values())) != len(mapping):
        raise ValueError(f"duplicate symbols in {mapping!r}")
    if default in set(mapping.values()):
        raise ValueError(
            f"default symbol {default!r} collides with a mapped symbol — "
            "unmapped values would silently count as that category"
        )
    c = F.col(col) if isinstance(col, str) else col
    expr = F.lit(default)
    for value, sym in reversed(list(mapping.items())):
        expr = F.when(c == value, F.lit(sym)).otherwise(expr)
    return expr


def journey_pattern_counts(
    events: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str],
    symbol: Column,
    patterns: Mapping[str, str],
    include_journey: bool = False,
) -> DataFrame:
    """Per group: the deterministic journey string plus one
    non-overlapping match count per named pattern.

    ``order_cols`` must be a TOTAL order within each group (e.g.
    ``(ts_us, event_id)`` — a timestamp alone ties under concurrent
    events and the journey would be nondeterministic; same precondition
    as ``apply_cdc_log``'s tiebreak columns). Output: ``group_cols``,
    ``journey_len``, one bigint column per pattern name (and
    ``journey`` itself when ``include_journey`` — off by default so a
    100 TB sweep doesn't shuffle the strings twice).
    """
    if not order_cols:
        raise ValueError("order_cols must pin a total order within each group")
    reserved = {*group_cols, "journey", "journey_len"}
    clash = reserved & set(patterns)
    if clash:
        raise ValueError(f"pattern names collide with output columns: {sorted(clash)}")
    ordered = events.select(
        *group_cols, F.struct(*order_cols, symbol.alias("__sym")).alias("__e")
    )
    j = ordered.groupBy(*group_cols).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("__e")), lambda x: x["__sym"]
            ),
            "",
        ).alias("journey")
    )
    counts = [
        F.regexp_count(F.col("journey"), F.lit(pat)).cast("bigint").alias(name)
        for name, pat in patterns.items()
    ]
    cols = [
        *group_cols,
        F.length("journey").cast("bigint").alias("journey_len"),
        *counts,
    ]
    if include_journey:
        cols.append(F.col("journey"))
    return j.select(*cols)
