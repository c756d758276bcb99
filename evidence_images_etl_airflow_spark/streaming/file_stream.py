"""M6 — incremental ingestion as Structured Streaming (SURVEY.md §7).

The reference's sensors poll object storage and then a daily batch
re-reads a 15-day window, relying on PK conflict-skip for idempotency.
The streaming file source subsumes both: it tracks which files have
been processed (checkpointed), so each file is read exactly once and
"the new data since last run" needs no lookback window at all.
``trigger(availableNow=True)`` gives the batch-cadence version: drain
everything new, then stop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_available_now(
    spark: SparkSession,
    source_path: str,
    schema,
    sink_path: str,
    checkpoint_path: str,
    transform=None,
    fmt: str = "parquet",
) -> None:
    """Read whatever files have arrived under ``source_path``, apply
    ``transform`` (DataFrame -> DataFrame), append to ``sink_path``,
    exactly once per file, then stop."""
    stream = spark.readStream.format(fmt).schema(schema).load(source_path)
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over a (possibly streaming)
    events frame — the late-data-tolerant rollup pattern for the
    ``events`` table."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            # decimal accumulation: exact and independent of row order,
            # which streaming (and any distributed engine) can't fix
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SLIDING-window aggregate — the overlapping-window
    counterpart of ``windowed_counts`` (trailing-hour metrics refreshed
    every half hour, the monitoring-dashboard staple). Each event lands
    in window/slide windows (2 here), which is the state-size cost of
    overlap; watermark eviction bounds it the same way as tumbling."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming dedup: keep the first row per key, dropping duplicates
    that arrive within the watermark delay of each other — Spark's
    bounded-state dedup (state for a key is reclaimed once the
    watermark passes it, unlike an unbounded ``dropDuplicates`` whose
    state grows forever on an endless stream). The M7 dedup story's
    streaming tier: exact dedup for live ingestion, the batch operators
    for the corpus at rest.

    Duplicates separated by MORE than the watermark delay in event time
    are both emitted — that's the bounded-state trade, and re-running
    the batch dedup downstream is what reconciles it."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def upsert_stream_available_now(
    spark: SparkSession,
    source_path: str,
    schema,
    target_path: str,
    keys: list[str],
    checkpoint_path: str,
    transform=None,
    fmt: str = "parquet",
) -> None:
    """Streaming analog of the reference's K1 idempotent load
    (evidence_images_processing.py:169-171, ON CONFLICT DO NOTHING):
    each micro-batch lands through the conflict-skip upsert writer via
    ``foreachBatch``. The file-source checkpoint makes delivery
    at-least-once across restarts; the keyed anti-join makes the sink
    idempotent, so the composition is effectively-once even when a
    failed batch is retried after partially committing — the same
    end-to-end guarantee the reference gets from its PK, without a
    transactional store."""
    from evidence_images_etl_airflow_spark.sinks.writers import (
        idempotent_append_parquet,
    )

    stream = spark.readStream.format(fmt).schema(schema).load(source_path)
    if transform is not None:
        stream = transform(stream)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        idempotent_append_parquet(batch_df.sparkSession, batch_df, target_path, keys)

    q = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_watermark: str,
    right_watermark: str,
    upper_bound: str,
) -> DataFrame:
    """Stream-stream INNER join with an event-time interval constraint:
    pair left/right rows sharing ``key`` where ``right_ts`` lands in
    [left_ts, left_ts + upper_bound] — the attribution / funnel join
    (view -> purchase within N minutes).

    Both sides carry watermarks so Spark can bound the join state: a
    buffered left row is dropped once the right watermark passes
    ``left_ts + upper_bound`` (no match can still arrive), and
    vice-versa — state is O(rows in the interval window per key), not
    O(stream). Each micro-batch shuffles both sides by ``key``, so the
    join is co-partitioned; the time predicate then prunes within the
    key group. Inner-join emissions are exact and final (no
    retractions), which is why batch and streaming agree row-for-row
    once both sides drain."""
    l = left.withWatermark(left_ts, left_watermark)
    r = right.withWatermark(right_ts, right_watermark).withColumnRenamed(key, "__rk")
    joined = l.join(
        r,
        F.expr(
            f"{key} = __rk AND {right_ts} >= {left_ts} "
            f"AND {right_ts} <= {left_ts} + INTERVAL {upper_bound}"
        ),
        "inner",
    )
    return joined.drop("__rk")


def continuous_rollup_available_now(
    spark: SparkSession,
    source_path: str,
    schema,
    target_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
) -> None:
    """Incrementally-maintained rollup (the streaming half of the
    hypertable continuous-aggregate story, batch half =
    ``events_rollup_cascade``): each micro-batch aggregates ONLY its
    own rows into (window, key, n, total) partials, then additively
    MERGEs them into the rollup table — counts add, exact-decimal sums
    add, so the merged table equals the from-scratch aggregate without
    ever reprocessing history. The file-source checkpoint makes each
    input file contribute exactly once; the target rewrite goes through
    the Hadoop-FS staging swap (object-store-safe, same as
    merge_into_parquet).

    At 100 TB the partial per batch is tiny (keys x windows), so the
    merge cost is bounded by the ROLLUP size, not the stream — the
    property that makes continuous aggregates cheap. Only additive
    aggregates (sum/count/min/max) can ride this path; mean/percentile
    must be derived from the additive parts downstream."""
    stream = spark.readStream.format("parquet").schema(schema).load(source_path)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        import uuid

        sess = batch_df.sparkSession
        partial = (
            batch_df.groupBy(
                F.window(F.col(ts_col), window).alias("w"), F.col(key_col)
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col(value_col).cast("decimal(18,2)")).alias("total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                key_col,
                "n_events",
                "total_value",
            )
        )
        try:
            target = sess.read.parquet(target_path)
            exists = True
        except Exception:
            exists = False
        if not exists:
            partial.write.mode("overwrite").parquet(target_path)
            return
        merged = (
            target.unionByName(partial)
            .groupBy("window_start", key_col)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("total_value")
                .cast("decimal(18,2)")
                .alias("total_value"),
            )
        )
        tmp = f"{target_path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        jvm = sess.sparkContext._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(target_path)
        fs = hpath.getFileSystem(sess.sparkContext._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath)

    q = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def heavy_hitters_stream_available_now(
    spark: SparkSession,
    source_path: str,
    schema,
    summary_path: str,
    checkpoint_path: str,
    value_col: str,
    capacity: int = 256,
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming maintenance of a Misra-Gries heavy-hitter summary —
    the streaming half of the ``sketch_mg_incremental`` story: each
    micro-batch is MG-summarized on its own, the per-batch summary
    unions into the persisted ``(item, cnt)`` table (NULL item = the
    accumulated error row), and the store is re-compressed back to
    ``capacity`` counters whenever it grows past it — the compression
    error simply folds into the error row, so the MG certificates
    (stored est <= true count ever streamed, undercount <= error row)
    hold after ANY number of batches. The file-source checkpoint makes
    each input file contribute exactly once; the store rewrite rides
    the same staging swap as ``continuous_rollup_available_now``.

    At 100 TB/day the store is <= capacity+1 rows FOREVER — the
    always-on "top tokens/URLs today" dashboard with per-batch cost =
    one batch scan + a summary-sized merge, and zero raw history."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        misra_gries_summaries,
    )

    reader = spark.readStream.format("parquet").schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(source_path)

    def land(batch_df: DataFrame, batch_id: int) -> None:
        import uuid

        sess = batch_df.sparkSession
        partial = misra_gries_summaries(
            batch_df.select(value_col), value_col, capacity
        )
        try:
            store = sess.read.parquet(summary_path)
            merged = store.unionByName(partial)
        except Exception:
            merged = partial
        merged = merged.groupBy("item").agg(F.sum("cnt").alias("cnt"))
        # Re-compress to the capacity bound: the merged non-null rows
        # can reach old-store + batch-partitions x capacity; subtract
        # the (capacity+1)-th largest counter and fold it into the
        # error row (the exact MG decrement, applied store-side). The
        # store is summary-sized, so the threshold lookup is a bounded
        # collect.
        items = merged.filter(F.col("item").isNotNull())
        if items.count() > capacity:
            thresh = (
                items.orderBy(F.col("cnt").desc(), F.col("item"))
                .select("cnt")
                .collect()[capacity]["cnt"]
            )
            err = merged.filter(F.col("item").isNull()).select(
                F.lit(None).cast("string").alias("item"),
                (F.coalesce(F.sum("cnt"), F.lit(0)) + F.lit(thresh))
                .cast("bigint")
                .alias("cnt"),
            )
            merged = (
                items.select("item", (F.col("cnt") - F.lit(thresh)).alias("cnt"))
                .filter(F.col("cnt") > 0)
                .unionByName(err)
            )
        tmp = f"{summary_path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        jvm = sess.sparkContext._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(summary_path)
        fs = hpath.getFileSystem(sess.sparkContext._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath)

    q = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
