"""Partition-layout helpers shared by the compute-heavy operators.

A single small parquet file arrives as ONE input split, which would
serialize tokenize/shingle/vector work on one core no matter how many
the session has (measured 5-25x slowdowns locally). At cluster scale
inputs have many splits and these helpers are no-ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def spread(df: DataFrame, key: str | Column | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism when the
    input has fewer partitions — so per-row compute downstream uses
    every core. Hash-partitions by ``key`` when given (keeps related
    rows together for later groupBys); round-robin otherwise. No-op
    when the input is already parallel enough."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, key) if key is not None else df.repartition(target)
