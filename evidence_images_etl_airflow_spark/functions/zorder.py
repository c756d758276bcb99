"""Z-order (Morton) clustering: multi-dimensional data skipping.

`sources/manifest.py` prunes files by per-file min/max stats, and
`sinks.writers.cluster_by_range` makes those stats tight — but only
along ONE sort column. A file layout sorted by customer spans every
date, so a date-boxed query still opens every file. The table-format
answer (Delta OPTIMIZE ZORDER, Iceberg sort orders) is to sort by a
space-filling curve: interleave the bits of both dimensions so rows
close on the curve are close in BOTH dimensions, making every file a
small 2-D box — and min/max pruning then works on either dimension.

Everything here is pure JVM column expressions (shift/and/or unrolled
per bit — no UDF, whole-stage codegen keeps it in the scan projection),
so the curve costs one projection at write time.

Scale notes (100 TB):
- Layout cost is one repartitionByRange shuffle on the z-value — the
  same shuffle the 1-D layout already pays; range partitioning samples
  the z distribution, so skew in either dimension is absorbed.
- Pruning win is multiplicative with file count: a B-file table boxed
  to fraction f per dimension touches ~f*B files after z-layout vs
  ~B for any 1-D layout queried off its sort axis.
- Bits per dimension cap the curve resolution; 16 bits/dim (the
  default) distinguishes 65k buckets per axis — beyond that, files are
  far smaller than curve cells anyway. Inputs are masked to the bit
  budget so out-of-range values degrade to coarse bucketing, never to
  wrong interleaves of negative numbers.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton z-value of two non-negative ints: bit i of x lands at
    position 2i, bit i of y at 2i+1. Unrolled to 2*bits shift/and/or
    expressions — a static codegen-friendly tree, no UDF."""
    xs = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    ys = y.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xs, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(ys, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def interleave_bits_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical unrolled interleave as ANSI SQL (for differential
    oracles): bit-for-bit the expression `interleave_bits` evaluates."""
    mask = (1 << bits) - 1
    xs = f"(CAST({x_expr} AS BIGINT) & {mask})"
    ys = f"(CAST({y_expr} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xs} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ys} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def minmax_scale(col: Column, mn, mx, bits: int = 16) -> Column:
    """Scale a numeric column to the full [0, 2^bits-1] integer range.

    Interleaving only boxes BOTH dimensions if both use the full bit
    budget: with raw values, the wider-ranged dimension owns all the
    high z-bits and the curve degenerates to a 1-D sort on it (the
    day-vs-custkey failure mode). Table formats normalize with
    range-partition ids; min-max scaling is the stats-cheap version —
    one double multiply per row, identical IEEE evaluation order in
    any engine, so it stays differentially verifiable."""
    top = (1 << bits) - 1
    span = F.lit(mx) - F.lit(mn)
    scaled = F.floor((col - F.lit(mn)) * (F.lit(float(top)) / span)).cast("long")
    return F.when(F.lit(mx) == F.lit(mn), F.lit(0)).otherwise(scaled)


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int,
    bits: int = 16,
    z_col: str = "__z",
    normalize: bool = True,
) -> DataFrame:
    """Lay `df` out along the z-curve: one range partition per target
    file, rows sorted by z within each — so each written file covers a
    contiguous curve segment, i.e. a tight box in (x, y). Write with
    `.write.parquet(...)` and build the stats manifest on BOTH
    dimension columns; drop `z_col` downstream if unwanted.

    `normalize` min-max scales both dimensions onto the shared bit
    budget first (see `minmax_scale`) — the 4-scalar stats collect is
    a bounded write-time cost, same class as lm.py's vocab size."""
    x, y = F.col(x_col), F.col(y_col)
    if normalize:
        xmn, xmx, ymn, ymx = df.agg(
            F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
        ).first()
        x = minmax_scale(x, xmn, xmx, bits)
        y = minmax_scale(y, ymn, ymx, bits)
    return (
        df.withColumn(z_col, interleave_bits(x, y, bits))
        .repartitionByRange(n_files, z_col)
        .sortWithinPartitions(z_col)
    )
