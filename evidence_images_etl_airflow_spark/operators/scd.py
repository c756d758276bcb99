"""Slowly-changing-dimension (type 2) maintenance.

The reference's load side overwrites dimension attributes in place
(keyed UPDATE, add_image_data.py:65-84 — J4), losing history. The
warehouse-grade alternative is SCD2: an update closes the current
version of a row (sets its ``valid_to``) and appends a new version,
so every historical state stays queryable with an as-of predicate.

Scale design: the dimension is the big side and is scanned exactly
once, never shuffled — the update batch (a day's changes, small by
construction) is broadcast to both the close-matching join and the
append. No window functions, no global sort. At 100 TB the cost is
one pass over the dimension plus a broadcast; on a table format
(Delta/Iceberg) the same frame feeds MERGE directly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    effective_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``dim`` carries ``keys + tracked + [valid_from, valid_to]`` with
    ``valid_to IS NULL`` marking current rows; ``updates`` carries
    ``keys + tracked + [effective_col]``. A current row whose tracked
    attributes differ (null-safely) from its update is closed at the
    update's effective date and a new current version is appended;
    unmatched or unchanged rows pass through untouched. Historical
    (already-closed) rows are never revisited.

    PRECONDITION: one update row per key per batch — this operator
    applies a single transition. Duplicate keys in ``updates`` are
    collapsed here (latest ``effective_col`` wins, ties broken on the
    tracked values for determinism) BEFORE the join, because a fanned
    left join would silently emit duplicate closed/current rows
    (round-4 ADVICE). A batch carrying a key's full intra-batch
    history needs the multi-transition form: apply batches in
    effective order, or pre-split per effective date.
    """
    out_cols = keys + tracked + [valid_from, valid_to]
    hist = dim.filter(F.col(valid_to).isNotNull()).select(*out_cols)
    cur = dim.filter(F.col(valid_to).isNull())

    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(effective_col).desc(), *[F.col(t).desc_nulls_last() for t in tracked]
    )
    latest = (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    u = F.broadcast(
        latest.select(
            *[F.col(k).alias(f"__u_{k}") for k in keys],
            *[F.col(t).alias(f"__u_{t}") for t in tracked],
            F.col(effective_col).alias("__u_eff"),
        )
    )
    cond = reduce(
        lambda a, b: a & b, [cur[k] == F.col(f"__u_{k}") for k in keys]
    )
    j = cur.join(u, cond, "left")

    def _changed() -> Column:
        diffs = [~F.col(t).eqNullSafe(F.col(f"__u_{t}")) for t in tracked]
        return F.col("__u_eff").isNotNull() & reduce(lambda a, b: a | b, diffs)

    # current rows: closed at the effective date when an update changes
    # them, passed through otherwise — one projection, no second scan
    kept = j.select(
        *keys,
        *tracked,
        F.col(valid_from),
        F.when(_changed(), F.col("__u_eff")).otherwise(F.col(valid_to)).alias(valid_to),
    )
    # new current versions for the changed keys (semi-join back to the
    # dimension so an update for an unknown key is ignored, matching
    # UPDATE semantics; swap for an upsert policy if inserts belong)
    fresh = (
        j.filter(_changed())
        .select(
            *[F.col(f"__u_{k}").alias(k) for k in keys],
            *[F.col(f"__u_{t}").alias(t) for t in tracked],
            F.col("__u_eff").alias(valid_from),
            F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
        )
    )
    return hist.unionByName(kept).unionByName(fresh)


def apply_cdc_log(
    log: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str,
    delete_ops: tuple[str, ...] = ("delete",),
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a CDC event log into the final table snapshot:
    last-writer-wins per key by ``seq_cols`` (the source's total order
    — LSN, (commit_ts, event_id), ...), with delete tombstones
    removing the key from the snapshot. The replication-apply
    primitive every CDC pipeline ends with, and the batch mirror of
    what MERGE-per-batch achieves incrementally (sinks/writers): when
    a backlog of events arrives at once — replays, backfills,
    out-of-order delivery — applying events one MERGE at a time is
    both slow and wrong-under-reordering, while this collapses the
    whole log in ONE rank-1 window keyed on the source order, so
    arrival order is irrelevant by construction.

    HARD PRECONDITION: ``seq_cols`` must totally order the events of
    each key. If the source can emit ties — a replayed LSN, two events
    sharing (commit_ts) — the surviving row would be nondeterministic
    across runs/engines; pass the source's stable event id as
    ``tiebreak_cols`` to restore a total order (it is appended,
    descending, after ``seq_cols`` in the window sort).

    Scale shape: one shuffle on the key, WindowGroupLimit keeps the
    rank-1 row per key map-side; tombstone filtering is a row-local
    predicate after the cut. Returns the surviving rows with all log
    columns minus the rank helper."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    order = list(seq_cols) + list(tiebreak_cols or [])
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order]
    )
    # NULL op is NOT a tombstone: ~isin(NULL) evaluates to NULL and a
    # bare filter would silently DELETE the key on a malformed
    # upstream record — coalesce makes "unknown op keeps the row" the
    # deliberate behavior (surface such rows via dq checks, don't
    # erase them)
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(~F.coalesce(F.col(op_col).isin(*delete_ops), F.lit(False)))
        .drop("__rn")
    )
