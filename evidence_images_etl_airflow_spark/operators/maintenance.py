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


def execute_compaction(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    max_groups: int = 100,
    small_file_bytes: int | None = None,
) -> dict:
    """INCREMENTAL compaction: rewrite only the merge groups that
    actually contain >= 2 files, leaving already-compact files
    byte-untouched — the property that makes OPTIMIZE affordable on a
    100 TB table (``sinks.writers.compact_parquet`` rewrites the whole
    dataset; this touches only the small-file tail). Work is bounded
    per run by ``max_groups`` (largest file-count groups first), the
    standard incremental-OPTIMIZE batching, which also bounds the
    driver-side file list this function materializes (every table
    format's compactor plans over the file manifest driver-side; the
    repo's constant-bounded-collect rule is met through the explicit
    ``max_groups`` cap, not by luck).

    One Spark job rewrites all selected groups: the selected files are
    re-read, each row joined (broadcast, file-cardinality) back to its
    group, hash-repartitioned BY group and written ``partitionBy``
    group — one output file per group. The swap is
    write-tmp-first / delete-originals / move-in (Hadoop FileSystem
    API, storage-agnostic); a crash between delete and move leaves the
    tmp directory intact for manual recovery — same non-transactional
    caveat as ``compact_parquet``'s directory swap, documented there.
    Returns ``{"groups_rewritten", "files_removed", "files_added"}``;
    a second run under the same target is a no-op (every rewritten
    group is now a single file).
    """
    # Only files BELOW the small-file threshold enter the plan (the
    # Delta/Iceberg OPTIMIZE minFileSize semantics): an
    # already-target-sized file must never be rewritten just because it
    # sits path-adjacent to a small-file run — without this filter the
    # offset binning absorbs big neighbors into small-tail groups and
    # the "incremental" pass degrades toward a whole-table rewrite
    # (measured in SCALING.md round-10).
    if small_file_bytes is None:
        small_file_bytes = int(target_bytes) // 2
    inv = file_inventory(spark, path).filter(
        F.col("file_bytes") < int(small_file_bytes)
    )
    planned = plan_compaction(inv, target_bytes=target_bytes)
    todo = (
        compaction_summary(planned)
        .filter(F.col("n_files") >= 2)
        .orderBy(F.col("n_files").desc(), "group_id")
        .limit(int(max_groups))
        .select("group_id")
    )
    sel = planned.join(F.broadcast(todo), "group_id").select(
        "group_id", "file_path"
    )
    rows = sel.collect()  # bounded: max_groups groups x files-per-group
    if not rows:
        return {"groups_rewritten": 0, "files_removed": 0, "files_added": 0}

    paths = sorted({r.file_path for r in rows})
    # Hive-partitioned layouts are refused (r10 self-review): partition
    # values live in the DIRECTORY names, so moving a rewritten file to
    # the table root would silently detach its rows from their
    # partition — corruption, not compaction. Compact each partition
    # directory as its own dataset instead (same call, partition path).
    import os as _os

    root = _os.path.abspath(path).rstrip("/")
    for p in paths:
        parent = _os.path.dirname(p.removeprefix("file://").removeprefix("file:"))
        if _os.path.abspath(parent).rstrip("/") != root:
            raise ValueError(
                f"execute_compaction: {p!r} sits in a subdirectory of "
                f"{path!r} (hive-partitioned or nested layout) — compact "
                "each partition directory separately"
            )
    fmap = spark.createDataFrame(
        [(r.group_id, r.file_path) for r in rows],
        "group_id bigint, __path string",
    )
    df = (
        spark.read.parquet(*paths)
        .withColumn("__path", F.col("_metadata.file_path"))
        .join(F.broadcast(fmap), "__path")
        .drop("__path")
    )
    tmp = f"{path.rstrip('/')}__compact_groups"
    (
        df.repartition(F.col("group_id"))
        .write.mode("overwrite")
        .partitionBy("group_id")
        .parquet(tmp)
    )

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hadoop_path = jvm.org.apache.hadoop.fs.Path
    target_dir = hadoop_path(path)
    fs = target_dir.getFileSystem(jsc.hadoopConfiguration())
    for p in paths:
        fs.delete(hadoop_path(p), False)
    added = 0
    it = fs.listFiles(hadoop_path(tmp), True)
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.endswith(".parquet"):
            continue
        gid = f.getPath().getParent().getName()  # "group_id=N"
        dest = hadoop_path(
            f"{path.rstrip('/')}/compacted-{gid.split('=')[-1]}-{name}"
        )
        # Hadoop rename reports failure by RETURN VALUE, not exception
        # (r10 self-review): a silent false here would strand the
        # group's rewritten file in the tmp dir, which the final
        # cleanup then deletes — data loss. Fail loudly instead; the
        # tmp dir survives for recovery.
        if not fs.rename(f.getPath(), dest):
            raise IOError(
                f"compaction move failed: {f.getPath()} -> {dest} "
                f"(rewritten data retained in {tmp})"
            )
        added += 1
    fs.delete(hadoop_path(tmp), True)
    return {
        "groups_rewritten": int(len({r.group_id for r in rows})),
        "files_removed": len(paths),
        "files_added": added,
    }
