"""Cross-engine / cross-version table reconciliation by bucket checksums.

The reference's idempotent daily reload (`ON CONFLICT DO NOTHING`,
`dags/evidence_images_processing.py:169-171`) never answers "did the
Postgres table actually end up equal to what the pipeline computed?" —
at 100 TB you cannot answer it by shipping rows to one side either.
The distributed-systems answer is Merkle-style reconciliation:

1. Each side hashes every row to an integer (md5 of a canonical string
   encoding — deterministic across engines), buckets rows by a key
   hash, and aggregates ONE (count, checksum) pair per bucket.
2. The per-bucket summaries (a few KB regardless of table size) are
   joined; equal buckets are proven equal without any row ever moving.
3. Only mismatched buckets are drilled into — the expensive row-level
   diff runs on ~1/n_buckets of the data per bad bucket.

Checksum = sum of (row_hash % 2^30) — associative/commutative, so the
aggregation is map-side combinable and partitioning-insensitive; the
modulus keeps a billion-row bucket's sum far inside int64. (An xor
fold would also work but Spark has no bit_xor aggregate; sum keeps
both engines on built-ins.)

Scale notes (100 TB):
- Each side's pass is one scan + one hash-agg onto n_buckets keys; the
  join is n_buckets rows — broadcastable at any table size.
- Canonical encoding matters more than the hash: decimals must carry a
  fixed scale and dates a fixed format on both engines, or honest
  equality reads as drift. `row_signature` pins `concat_ws('|')` over
  explicitly-cast columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CHECKSUM_MOD = 1 << 30


def md5_long(col: Column) -> Column:
    """First 15 md5 hex chars as a non-negative bigint — identical in
    any engine with md5 + base conversion (the repo-wide idiom)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def row_signature(cols: list[Column]) -> Column:
    """Canonical row encoding: '|'-joined explicitly-cast columns.
    Callers must cast floats/decimals to a fixed scale first."""
    return F.concat_ws("|", *[c.cast("string") for c in cols])


def bucket_checksums(
    df: DataFrame,
    key: Column,
    sig_cols: list[Column],
    n_buckets: int = 64,
) -> DataFrame:
    """One (bucket, n_rows, checksum) row per bucket: bucket by key
    hash, checksum = sum of bounded row hashes. Map-side combinable;
    output size is n_buckets rows regardless of input size."""
    sig = row_signature(sig_cols)
    return (
        df.select(
            (md5_long(key.cast("string")) % n_buckets).alias("bucket"),
            (md5_long(sig) % _CHECKSUM_MOD).alias("__h"),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_rows"), F.sum("__h").alias("checksum"))
    )


def diff_buckets(a: DataFrame, b: DataFrame) -> DataFrame:
    """Join two bucket-checksum tables and report per-bucket equality.
    Input frames are n_buckets rows — the join is trivially broadcast.
    Returns: bucket, n_a, n_b, match (false ⇒ drill into that bucket)."""
    an = a.select(
        "bucket", F.col("n_rows").alias("n_a"), F.col("checksum").alias("__ca")
    )
    bn = b.select(
        "bucket", F.col("n_rows").alias("n_b"), F.col("checksum").alias("__cb")
    )
    return (
        an.join(bn, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            (
                (F.coalesce("n_a", F.lit(0)) == F.coalesce("n_b", F.lit(0)))
                & (F.coalesce("__ca", F.lit(-1)) == F.coalesce("__cb", F.lit(-1)))
            ).alias("match"),
        )
    )


def table_diff(
    before: DataFrame,
    after: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Row-level change-data-feed between two snapshots of a keyed
    table: one full-outer join on the keys classifies every row as
    ``insert`` (key only in ``after``), ``delete`` (key only in
    ``before``) or ``update`` (payload differs — NULL-SAFE struct
    comparison over all non-key columns, so NULL→value and value→NULL
    transitions classify correctly and no hash-collision caveat
    exists). Unchanged rows are dropped. Output: key columns,
    ``change_type``, and the row image — post-image for
    insert/update, pre-image for delete (Delta CDF's
    ``update_preimage`` variant is one extra select away; the compact
    single-image form is what a downstream MERGE consumes).

    Precondition: keys unique per side (snapshot semantics — same as
    ``apply_cdc_log``). Scale: ONE shuffle on the key columns (the
    same co-partitioning a bucketed snapshot layout makes
    exchange-free); project away irrelevant payload columns first
    when diffing wide tables. Complements bucket_checksums: checksums
    prove equality cheaply at 100 TB, table_diff names the rows when
    they don't."""
    nb = [c for c in before.columns if c not in key_cols]
    na = [c for c in after.columns if c not in key_cols]
    if set(nb) != set(na):
        raise ValueError(
            f"non-key schemas differ: before={sorted(nb)!r} "
            f"after={sorted(na)!r}"
        )
    if not nb:
        raise ValueError("table_diff needs at least one non-key column")
    # same column SET in either order diffs fine — the after side's
    # struct is built in the before side's field order so the
    # null-safe struct comparison lines up (r10 self-review)
    b = before.select(*key_cols, F.struct(*nb).alias("__pre"))
    a = after.select(*key_cols, F.struct(*nb).alias("__post"))
    j = b.join(a, list(key_cols), "full_outer")
    change = (
        F.when(F.col("__pre").isNull(), F.lit("insert"))
        .when(F.col("__post").isNull(), F.lit("delete"))
        .when(~F.col("__pre").eqNullSafe(F.col("__post")), F.lit("update"))
    )
    image = F.coalesce(F.col("__post"), F.col("__pre"))
    return (
        j.select(
            *key_cols,
            change.alias("change_type"),
            image.alias("__img"),
        )
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type", "__img.*")
    )


def apply_table_diff(
    base: DataFrame,
    diff: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Apply a :func:`table_diff` change-data-feed to the ``before``
    snapshot, reconstructing the ``after`` snapshot exactly — the
    consumer half of the CDF contract (r11; Delta calls this MERGE-ing
    the change feed). Algebra: drop every base row whose key appears
    in the diff (deletes AND update pre-images go in one pass), then
    union the insert/update post-images. Identity law:
    ``apply_table_diff(a, table_diff(a, b), keys) == b`` for any keyed
    snapshots — pinned by the registered ``recon_cdf_apply`` query's
    oracle and a unit test.

    Scale: ONE left-anti join on the keys plus a union — the anti
    join's build side is the diff's key set (changed rows only, which
    is why shipping a CDF beats shipping the snapshot); when the diff
    is small relative to the base Spark broadcasts it, and a bucketed
    base co-partitions the shuffle away entirely. No window, no
    driver-side state.

    Precondition: ``diff`` has table_diff's exact shape (key cols +
    ``change_type`` + the payload columns); keys unique per side."""
    payload = [c for c in base.columns if c not in key_cols]
    want = set(key_cols) | {"change_type"} | set(payload)
    if set(diff.columns) != want:
        raise ValueError(
            f"diff schema {sorted(diff.columns)!r} does not match "
            f"table_diff's shape for this base: {sorted(want)!r}"
        )
    keep = base.join(diff.select(*key_cols), list(key_cols), "left_anti")
    add = diff.filter(
        F.col("change_type").isin("insert", "update")
    ).select(*base.columns)
    return keep.unionByName(add)
