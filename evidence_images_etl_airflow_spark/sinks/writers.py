"""K1-K6 — sink surface (SURVEY.md §2.7, custom components §4.3).

The reference loads row-at-a-time with ``executemany`` into Postgres
(evidence_images_processing.py:173-178, 212-218) and patches the table
afterwards with whole-table UPDATE passes (K3, :236,:252,:270,:286).
Here every derived column is computed in the plan *before* the write
(no read-backs), writes are bulk columnar, and idempotency is DataFrame
algebra (operators.upsert) instead of PK conflict errors.

Targets are parquet directories (Delta/Iceberg jars not present in this
environment; the writer API is format-agnostic so a table format slots
in by changing ``format``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.operators.upsert import conflict_skip, merge_upsert


class VarcharOverflowError(ValueError):
    """Pre-write analog of Postgres STRING_DATA_RIGHT_TRUNCATION
    (handled reactively at evidence_images_processing.py:223-228)."""


def validate_varchar_lengths(
    df: DataFrame, limits: dict[str, int], sample: int = 5
) -> DataFrame:
    """K2's error handler, made proactive (SURVEY §4.3c): one aggregate
    pass computing max(length) per limited column; raise with offending
    samples if any limit is exceeded. Returns ``df`` unchanged so it
    chains inside a write pipeline."""
    present = {c: n for c, n in limits.items() if c in [x.lower() for x in df.columns]}
    if not present:
        return df
    aggs = [F.max(F.length(F.col(c))).alias(c) for c in present]
    row = df.agg(*aggs).collect()[0]
    bad = {c: row[c] for c in present if row[c] is not None and row[c] > present[c]}
    if bad:
        details = {}
        for c in bad:
            vals = (
                df.filter(F.length(F.col(c)) > present[c])
                .select(c)
                .limit(sample)
                .collect()
            )
            details[c] = [r[0][:64] for r in vals]
        raise VarcharOverflowError(
            f"varchar overflow: {', '.join(f'{c} max={bad[c]} limit={present[c]}' for c in bad)}; "
            f"samples={details}"
        )
    return df


def append_parquet(
    df: DataFrame,
    path: str,
    varchar_limits: dict[str, int] | None = None,
    partition_by: Sequence[str] | None = None,
) -> None:
    """K2: plain validated append (the sessions load,
    evidence_images_processing.py:181-228)."""
    if varchar_limits:
        validate_varchar_lengths(df, varchar_limits)
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def _read_target(spark: SparkSession, path: str, like: DataFrame) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None  # first write: target does not exist yet


def idempotent_append_parquet(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    order_by: Sequence[str] | None = None,
) -> int:
    """K1: the conflict-skip load (ON CONFLICT DO NOTHING,
    evidence_images_processing.py:169-171) on a parquet target. Appends
    only rows whose key is new; returns how many were appended.

    Scale note: only the *keys* of the existing table are read (column
    pruning reaches the scan), so re-runs cost one key-scan + one
    shuffle, not a rewrite. With a Delta/Iceberg target this becomes
    MERGE WHEN NOT MATCHED THEN INSERT with file skipping.
    """
    existing = _read_target(spark, path, df)
    if existing is None:
        from evidence_images_etl_airflow_spark.operators.upsert import dedup_first_wins

        to_insert = dedup_first_wins(df, keys, order_by)
    else:
        to_insert = conflict_skip(df, existing, keys, order_by)
    # count + append in one cached pass so the plan runs once
    to_insert = to_insert.persist()
    try:
        n = to_insert.count()
        if n:
            to_insert.write.mode("append").parquet(path)
    finally:
        to_insert.unpersist()
    return n


def merge_into_parquet(
    spark: SparkSession,
    source: DataFrame,
    path: str,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
) -> None:
    """K5/J3: staging + MERGE (learn/postgres_op.py:30-68) on a parquet
    target: read target, full-outer merge, rewrite via a temp directory
    swap through the Hadoop FileSystem API — the same pattern as
    ``compact_parquet``, so the swap works on any supported storage
    scheme (local, HDFS, s3a/abfs), not just the local filesystem a
    ``shutil`` move can reach. On a table format this is a native MERGE;
    on raw parquet a rewrite is the only transactional option. Note the
    delete+rename window is only atomic where the store's rename is
    (HDFS yes; object stores emulate) — a table format is the real
    answer for concurrent readers at 100 TB."""
    import uuid

    target = _read_target(spark, path, source)
    if target is None:
        source.write.mode("overwrite").parquet(path)
        return
    merged = merge_upsert(target, source, keys, update_cols)
    tmp = f"{path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(hpath, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath)


def cluster_by_range(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-clustered layout: repartitionByRange + sortWithinPartitions
    on the clustering columns, one file per range. Each output file then
    covers a NARROW, non-overlapping slice of the clustering key — which
    is what makes file-level min/max skipping (`sources/manifest.py`)
    actually prune: on a randomly-laid-out table every file's [min,max]
    spans the whole domain and nothing can be skipped. The multi-column
    form is lexicographic (z-order-lite); true z-order interleaving only
    pays when queries filter the later columns alone."""
    cols = [F.col(c) for c in cluster_cols]
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_value(c1, c2, bits: int = 12):
    """Morton (z-order) interleave of two pre-scaled integer columns —
    delegates to the shared curve in `functions/zorder.py`
    (`interleave_bits`), which also carries the bit-identical SQL
    expansion used by the differential oracle. Pure Catalyst bit
    arithmetic, no UDF."""
    from evidence_images_etl_airflow_spark.functions.zorder import interleave_bits

    return interleave_bits(c1, c2, bits)


def cluster_by_zorder(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    num_files: int,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Two-dimensional z-order clustering: min-max scale both columns
    onto the shared ``bits``-bit budget, interleave them into a Morton
    code, and range-partition + sort the write on it (all via
    `functions/zorder.zorder_layout` — one implementation of the
    curve). Unlike lexicographic clustering (``cluster_by_range`` on
    [a, b] — perfect on ``a``, useless on ``b`` alone), every file then
    covers a SMALL RECTANGLE of the (col1, col2) domain, so file-level
    min/max skipping (`sources/manifest.py`) prunes on EITHER column
    alone — the Delta/Iceberg OPTIMIZE ZORDER layout on plain parquet.

    The min/max stats pass collects four scalars on the driver — the
    same pass a table format runs at write time. Min-max ranking
    assumes roughly uniform value spread; heavily skewed columns want a
    rank-based scaling (percent_rank) at the cost of one extra sort."""
    from evidence_images_etl_airflow_spark.functions.zorder import zorder_layout

    (
        zorder_layout(df, col1, col2, num_files, bits=bits)
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Partition-pruned layout on the write side (the mirror of the
    reference's dated blob layout, learn/az_blob_storage.py:30): Hive
    ``partitionBy`` directories readers prune by path.

    The ``repartition(partition_cols)`` before the write is the part
    that matters at scale: without it, every one of the W writing tasks
    can hold rows for every one of P partitions -> W*P small files (at
    1000 executors x 1000 date-partitions, a million files per batch).
    Shuffling by the partition columns first makes each partition
    directory the output of as few tasks as possible;
    ``maxRecordsPerFile`` then caps file size from the other side."""
    out = df.repartition(*[F.col(c) for c in partition_cols])
    w = out.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Bucketed table layout for shuffle-free co-located joins
    (saveAsTable with ``bucketBy`` + ``sortBy``), with the layout
    hygiene that decides whether bucketing helps at all: the
    ``repartition(n_buckets, key)`` BEFORE the write yields exactly one
    file per bucket, so readers get pre-sorted runs and the sort-merge
    join skips both the Exchange and the Sort. Without it each writing
    task emits its own file into every bucket (tasks x buckets files)
    and Spark must re-sort every bucket at read time — measured at
    sf1-equivalent this turns a 2.9x win into a 1.9x LOSS over plain
    shuffle join (SCALING.md, Joins)."""
    (
        df.repartition(n_buckets, F.col(key))
        .write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode(mode)
        .saveAsTable(table)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files and atomically swap
    it in; returns the new file count. Streaming sinks and frequent
    small appends accrete tiny files whose per-file open/footer cost
    eventually dominates scans — periodic compaction (OPTIMIZE in table
    formats) restores ~HDFS-block-sized files. Uses the Hadoop
    FileSystem API, so it works on any supported storage, not just
    local paths."""
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    total = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    fs.delete(hpath, True)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath)
    return n_files


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    token_col: str | None = None,
) -> dict:
    """Export a training corpus as shard-partitioned parquet plus a
    data-loader manifest — the hand-off artifact between the data
    engine and a training job: loaders read `shard=N/` directories
    sequentially (data_shard_shuffle's layout), and the manifest tells
    the job scheduler each shard's row/token weight up front so it can
    assign shards to workers without listing or scanning anything.

    Layout hygiene as in write_bucketed: repartition BY THE SHARD
    COLUMN first so each shard directory holds one file — a
    shard-per-task write, not tasks x shards fragments. The manifest
    is a driver-side dict (and written as _manifest.json next to the
    data): per-shard rows, optional token totals, and file names —
    bounded by shard count, never row count. Returns the manifest."""
    import json
    from urllib.parse import unquote

    spark = df.sparkSession
    # persist so the manifest stats and the written files come from the
    # SAME materialization — recomputing the lineage after the write
    # would let a nondeterministic/shifting source make the manifest
    # silently disagree with the shards it describes (and costs a
    # second full scan besides)
    df = df.persist()
    try:
        (
            df.repartition(F.col(shard_col))
            .write.mode("overwrite")
            .partitionBy(shard_col)
            .parquet(path)
        )
        aggs = [F.count("*").cast("bigint").alias("rows")]
        if token_col is not None:
            aggs.append(F.sum(token_col).cast("bigint").alias("tokens"))
        # manifest keys are the Hive partition-directory spellings:
        # string-render the shard value the same way the writer does
        # (NULL -> __HIVE_DEFAULT_PARTITION__) instead of re-parsing
        # directory names back into the column's type
        stats = {
            (
                "__HIVE_DEFAULT_PARTITION__"
                if r[shard_col] is None
                else str(r[shard_col])
            ): r.asDict()
            for r in df.groupBy(shard_col).agg(*aggs).collect()
        }
    finally:
        df.unpersist()
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    shards = {}
    it = fs.listStatus(hpath)
    for st in it:
        name = st.getPath().getName()
        if not name.startswith(f"{shard_col}="):
            continue
        # directory names are URL-escaped by Hive (space -> %20 etc.)
        key = unquote(name.split("=", 1)[1])
        files = [
            f.getPath().getName()
            for f in fs.listStatus(st.getPath())
            if f.getPath().getName().endswith(".parquet")
        ]
        if key not in stats:
            raise ValueError(
                f"shard directory {name!r} has no matching stats row — "
                "manifest would undercount; shard values must render "
                "stably via str()"
            )
        entry = {"files": sorted(files)}
        entry.update(
            {k: v for k, v in stats[key].items() if k != shard_col}
        )
        shards[key] = entry
    if len(shards) != len(stats):
        missing = sorted(set(stats) - set(shards))
        raise ValueError(
            f"stats rows without a shard directory: {missing!r}"
        )
    manifest = {
        "shard_col": shard_col,
        "n_shards": len(shards),
        "total_rows": int(sum(s.get("rows", 0) for s in shards.values())),
        "shards": shards,
    }
    if token_col is not None:
        manifest["total_tokens"] = int(
            sum(s.get("tokens", 0) for s in shards.values())
        )
    out = jvm.org.apache.hadoop.fs.Path(path, "_manifest.json")
    stream = fs.create(out, True)
    stream.write(bytearray(json.dumps(manifest, indent=1).encode("utf-8")))
    stream.close()
    return manifest


def bloom_filter_options(
    cols: "Sequence[str] | list[str]",
    expected_ndv: int | dict[str, int],
) -> dict[str, str]:
    """Parquet per-column Bloom-filter writer options (r11): the
    point-lookup counterpart of min/max skipping. Footer min/max stats
    (sources/manifest.py) prune files for RANGE predicates but are
    useless for `key = X` on a high-cardinality unclustered column —
    every file's [min, max] contains X. A written Bloom filter lets
    any parquet reader (Spark's vectorized scan included) skip row
    groups that certainly lack the key, paying ~1.2 bytes/NDV of
    footer space — the OBJECT-STORAGE economics: one footer read vs a
    full row-group fetch per file. ``expected_ndv`` sizes each
    filter (int = same for all cols; dict = per column); undersizing
    inflates the false-positive rate, oversizing wastes footer bytes.
    Returns the exact `parquet.bloom.filter.*` option map —
    unit-testable without a write, and composable with any
    DataFrameWriter. The skip mechanism is measured, not argued
    (r12): on a fixture where stats/dictionary filtering provably
    cannot skip, parquet's RowGroupFilter drops 22/22 row groups for
    an absent key with the written filters and 0/22 without
    (tests/test_upsert_sinks.py::
    test_bloom_filter_skips_row_groups_on_point_lookup)."""
    if not cols:
        raise ValueError("bloom_filter_options needs at least one column")
    opts: dict[str, str] = {}
    for c in cols:
        ndv = expected_ndv[c] if isinstance(expected_ndv, dict) else expected_ndv
        if int(ndv) < 1:
            raise ValueError(f"expected_ndv for {c!r} must be >= 1, got {ndv}")
        opts[f"parquet.bloom.filter.enabled#{c}"] = "true"
        opts[f"parquet.bloom.filter.expected.ndv#{c}"] = str(int(ndv))
    return opts


def write_with_bloom_filters(
    df: DataFrame,
    path: str,
    bloom_cols: "Sequence[str] | list[str]",
    expected_ndv: int | dict[str, int],
    mode: str = "overwrite",
) -> None:
    """Write parquet with per-column Bloom filters for point-lookup
    columns (see :func:`bloom_filter_options`). Use for id/key columns
    that point queries probe but no layout clusters — the manifest's
    min/max pruning handles the clustered/range columns, Bloom footers
    handle `WHERE id = X` on everything else."""
    missing = [c for c in bloom_cols if c not in df.columns]
    if missing:
        raise ValueError(f"bloom columns not in frame: {missing}")
    (
        df.write.mode(mode)
        .options(**bloom_filter_options(bloom_cols, expected_ndv))
        .parquet(path)
    )
