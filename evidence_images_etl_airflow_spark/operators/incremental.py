"""Incremental view maintenance for decomposable aggregates.

The reference recomputes its aggregate views from the full table on
every DAG run (`dags/evidence_images_processing.py:120-140` re-reads
and re-groups everything). At 100 TB the daily-report loop must be
INCREMENTAL: fold each arriving batch into a persisted per-group
state table and never touch historical raw rows again. For the
decomposable aggregates (count / sum / min / max, and anything
derived from them — avg = sum/count) that is exact, not approximate:

    state_N = merge(state_{N-1}, partials(batch_N))

where ``partials`` aggregates ONLY the batch and ``merge`` is a
union + re-aggregation keyed on the group columns. Associativity and
commutativity of the merge (count/sum merge by sum, min by min, max
by max) make the fold order-insensitive — the workload query pins
exactness by comparing a two-batch fold against the direct aggregate
over the union (DuckDB oracle).

Scale shape: per batch, one scan of the BATCH plus one shuffle of
|state| + |batch groups| summary rows — never historical raw data.
The state table is the same thing `sketch_at_grain` persists for
distinct counts and `quantile_summaries` for percentiles; this module
is their exact-aggregate sibling. Persist the state with
`sinks/versioned.publish` for atomic reader-visible updates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# aggregate name -> (batch partial fn, state merge fn)
_DECOMPOSABLE = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def _out_name(agg: str, col: str) -> str:
    return f"{agg}_{col}"


def batch_partials(
    batch: DataFrame, keys: list[str], specs: dict[str, str]
) -> DataFrame:
    """Aggregate ONE batch to per-group partials. ``specs`` maps a
    column to one of count/sum/min/max; output columns are named
    ``<agg>_<col>``. ``count`` counts non-null values of the column
    (use a key column for row counts)."""
    aggs: list[Column] = []
    for col, agg in specs.items():
        try:
            partial_fn, _ = _DECOMPOSABLE[agg]
        except KeyError:
            raise ValueError(
                f"{agg!r} is not decomposable; supported: {sorted(_DECOMPOSABLE)}"
            ) from None
        aggs.append(partial_fn(col).alias(_out_name(agg, col)))
    return batch.groupBy(*keys).agg(*aggs)


def merge_state(
    state: DataFrame | None,
    partials: DataFrame,
    keys: list[str],
    specs: dict[str, str],
) -> DataFrame:
    """Fold a batch's partials into the persisted state: union by name
    + one re-aggregation with each aggregate's MERGE function (counts
    and sums add, mins min, maxes max). ``state=None`` bootstraps from
    the first batch. Groups present in only one side pass through
    untouched (union semantics — no outer-join null handling needed).
    The shuffle is summary-row-sized: |state| + |batch groups|."""
    if state is None:
        return partials
    merged = state.unionByName(partials)
    aggs = [
        _DECOMPOSABLE[agg][1](_out_name(agg, col)).alias(_out_name(agg, col))
        for col, agg in specs.items()
    ]
    return merged.groupBy(*keys).agg(*aggs)


def incremental_rollup(
    batches: list[DataFrame],
    keys: list[str],
    specs: dict[str, str],
    state: DataFrame | None = None,
) -> DataFrame:
    """Fold a sequence of batches into an aggregate state — the
    steady-state ingest loop collapsed into one call for testing and
    the workload's equivalence proof. Production calls
    ``batch_partials`` + ``merge_state`` once per arriving batch and
    persists the state between runs."""
    for b in batches:
        state = merge_state(state, batch_partials(b, keys, specs), keys, specs)
    if state is None:
        raise ValueError("no batches and no prior state")
    return state
