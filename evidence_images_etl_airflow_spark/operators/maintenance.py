"""Table-maintenance planning: small-file inventory + deterministic
compaction bin-packing.

The reference loads evidence images file-by-file into blob storage
(``common_helpers/blob_ingestion.py``) and never revisits layout; at
100 TB the accumulated small files ARE the performance problem — every
scan pays per-file open/footer costs, and a 1000-executor job over
millions of tiny parquet files is metadata-bound, not IO-bound. This
module turns footer statistics into a compaction plan (the engine-side
half of Delta/Iceberg ``OPTIMIZE``):

- :func:`file_inventory` reads the physical layout from Spark's
  ``_metadata`` hidden column — no filesystem listing loop, no driver
  walk; the file list is produced BY the scan, distributed.
- :func:`plan_compaction` assigns files to merge groups with
  offset-binning: files are totally ordered (deterministically) inside
  each table partition, and a file starting at exclusive-cumulative
  offset ``o`` joins group ``o div target``. One window cumsum + one
  aggregation, all integer math (hence cross-engine oracle-able).
  Guarantee: every group except a partition's last holds >= target
  bytes, and any group exceeds target by at most one file — the
  classic streaming-binning bound, and exactly what a compactor wants
  (never rewrite a file into two groups, never leave two adjacent
  sub-target groups). Greedy first-fit would need an iterative fold;
  offset-binning is the declarative formulation with the same bound.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def file_inventory(spark: SparkSession, path: str) -> DataFrame:
    """Distinct ``(file_path, file_bytes)`` of a parquet dataset, read
    from the scan's own ``_metadata`` column (Spark constant-folds the
    metadata struct per split — the distinct shuffles one row per
    file, not per data row)."""
    return (
        spark.read.parquet(path)
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.file_size").cast("bigint").alias("file_bytes"),
        )
        .distinct()
    )


def plan_compaction(
    files: DataFrame,
    size_col: str = "file_bytes",
    order_cols: Sequence[str] = ("file_path",),
    partition_cols: Sequence[str] = (),
    target_bytes: int = 128 << 20,
) -> DataFrame:
    """Assign each file a merge ``group_id`` by deterministic
    offset-binning (see module docstring). ``order_cols`` must totally
    order files within a partition (file paths are unique, so the
    default always qualifies). Returns the input columns plus
    ``group_id``; feed to :func:`compaction_summary` for the per-group
    plan. Window cost: one shuffle at FILE cardinality — millions of
    rows for a 100 TB table, trivial next to the data itself."""
    if int(target_bytes) <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    if not order_cols:
        raise ValueError("order_cols must totally order files in a partition")
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("bigint")
    return files.withColumn("__start", start).select(
        "*",
        F.expr(f"__start div {int(target_bytes)}")
        .cast("bigint")
        .alias("group_id"),
    ).drop("__start")


def compaction_summary(
    planned: DataFrame,
    size_col: str = "file_bytes",
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Per merge group: file count + total bytes — the rewrite
    manifest a compactor executes. Groups with ``n_files == 1`` are
    already compact (skip the rewrite; surfacing them keeps the plan
    total auditable against the inventory)."""
    return (
        planned.groupBy(*partition_cols, "group_id")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum(size_col).cast("bigint").alias("group_bytes"),
        )
    )
