"""J2/J3 — upsert semantics (SURVEY.md §2.5).

Two idempotency mechanisms exist in the reference:

- J2 conflict-skip: ``INSERT ... ON CONFLICT(sessionuid, sceneuid) DO
  NOTHING`` (evidence_images_processing.py:169-171) — the PK silently
  drops rows whose key already exists, which is what makes the daily
  15-day-lookback re-run idempotent. Because rows insert sequentially,
  it also dedups *within* a batch, first-arrival-wins.
- J3 MERGE: matched-update / not-matched-insert
  (learn/postgres_op.py:46-58).

Spark has no in-place keyed table, so both become pure DataFrame
algebra: dedup + left-anti against existing keys (J2), or a
full-outer-join coalesce rewrite (J3). Both shuffle once on the key;
at scale, bucketing the target by the key makes the anti-join
shuffle-free on the target side, and a Delta/Iceberg MERGE would push
this into the table format (jars not present here — parquet rewrite
path instead).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_first_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """In-batch PK dedup. The reference's sequential inserts keep the
    first row per key in arrival order; distributed data has no arrival
    order, so determinism requires an explicit ``order_by``. Without
    one, falls back to ``dropDuplicates`` (any row — fine when
    duplicates are exact copies)."""
    keys = list(keys)
    if not order_by:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def conflict_skip(
    new_df: DataFrame,
    existing: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str] | None = None,
) -> DataFrame:
    """J2: rows of ``new_df`` whose key is NOT already in ``existing``,
    deduped within the batch — exactly the set ``ON CONFLICT DO
    NOTHING`` would insert. Compose with an append write for the full
    K1 sink."""
    keys = list(keys)
    batch = dedup_first_wins(new_df, keys, order_by)
    # Existing side only needs the keys: project before the anti-join so
    # the shuffle moves keys, not whole rows.
    return batch.join(existing.select(*keys).dropDuplicates(keys), keys, "left_anti")


def keyed_update(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    set_cols: Sequence[str],
) -> DataFrame:
    """J4: the reference's cross-engine keyed UPDATE
    (add_image_data.py:65-71) — ``UPDATE target SET set_cols FROM
    source WHERE keys match`` — as a left join. Matched target rows
    take the source's values for ``set_cols``; unmatched target rows
    keep theirs; source rows with no target match are ignored (UPDATE
    never inserts). Plain ``=`` key matching, like the SQL it mirrors.

    ``source`` must be key-unique (the reference's executemany applies
    rows sequentially, so duplicates would be last-write-wins
    nondeterminism — enforce with dedup_first_wins upstream)."""
    keys = list(keys)
    missing = [c for c in set_cols if c not in target.columns]
    if missing:
        raise ValueError(f"set_cols not in target: {missing}")
    t = target.alias("t")
    s = (
        source.select(*keys, *set_cols)
        .withColumn("__s_present", F.lit(1))
        .alias("s")
    )
    joined = t.join(s, [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys], "left")
    matched = F.col("s.__s_present").isNotNull()
    out_cols = []
    for c in target.columns:
        if c in set_cols:
            out_cols.append(
                F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_cols: Sequence[str] | None = None,
) -> DataFrame:
    """J3: MERGE WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN INSERT
    (learn/postgres_op.py:46-58) as a full-outer-join rewrite over
    immutable files. Returns the post-merge table contents.

    ``update_cols`` defaults to every non-key column present in both
    sides. Source must be key-unique (MERGE requires it; enforce with
    dedup_first_wins upstream).
    """
    keys = list(keys)
    non_keys = [c for c in target.columns if c not in keys]
    update_cols = list(update_cols) if update_cols is not None else [
        c for c in non_keys if c in source.columns
    ]
    # Presence markers, not key-NULL checks: the join uses eqNullSafe, so
    # a source row with a NULL key legitimately matches — testing
    # s.<key0> IS NOT NULL would misclassify it as unmatched and let the
    # target's stale values win.
    t = target.alias("t")
    s = source.withColumn("__s_present", F.lit(1)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")
    s_present = F.col("s.__s_present").isNotNull()
    out_cols = [
        F.when(s_present, F.col(f"s.{k}")).otherwise(F.col(f"t.{k}")).alias(k)
        for k in keys
    ]
    for c in non_keys:
        if c in update_cols:
            # matched -> source value; source-only -> source; target-only -> target
            out_cols.append(
                F.when(s_present, F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)
