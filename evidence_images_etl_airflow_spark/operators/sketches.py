"""Mergeable-sketch rollups (Apache DataSketches HLL via Spark SQL).

The reference recomputes aggregates from raw rows on every load
(`dags/evidence_images_processing.py:120-140` re-reads and re-groups the
full frame). At 100 TB that is untenable for distinct-count questions:
the scale-correct pattern is to sketch once at the finest grain, persist
the sketches, and answer every coarser-grain question by UNIONING
sketches — no second pass over raw data, ever.

Spark 3.5+ exposes DataSketches HLL as first-class aggregate functions
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), which keeps
the whole path JVM-side and mergeable across partitions: the map-side
partial IS the sketch, so the shuffle carries ~2^lgK bytes per group
instead of per-row values.

Scale notes (100 TB):
- A daily sketch table is O(groups x days x 2^lgK) bytes — re-aggregable
  to week/month/all-time with a groupBy over sketches only.
- `hll_union_agg` is associative/commutative, so AQE can coalesce or
  split the rollup shuffle freely.
- lgK trades memory for rsd (~1.04/sqrt(2^lgK)); lgK=14 -> ~0.8% rsd in
  ~16 KiB per group, far inside the 5% verification band used by the
  workload query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_at_grain(
    df: DataFrame,
    keys: list[str | Column],
    value_col: str,
    lg_k: int = 14,
    sketch_col: str = "hll",
) -> DataFrame:
    """One pass over raw rows -> one mergeable HLL sketch per key group.

    This is the only stage that touches raw data; everything downstream
    operates on the (keys, sketch) table.
    """
    return df.groupBy(*keys).agg(F.hll_sketch_agg(value_col, lg_k).alias(sketch_col))


def rollup_sketches(
    sketches: DataFrame,
    keys: list[str | Column],
    sketch_col: str = "hll",
    estimate_col: str = "est_distinct",
) -> DataFrame:
    """Re-aggregate fine-grain sketches to a coarser grain by union.

    No raw data involved: the input is a sketch table (e.g. daily), the
    output is the estimate at the coarser key set (e.g. per type, or
    global with keys=[]).
    """
    agg = F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(estimate_col)
    if keys:
        return sketches.groupBy(*keys).agg(agg)
    return sketches.agg(agg)
