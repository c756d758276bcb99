"""Merkle-style bucket-checksum table reconciliation."""

from __future__ import annotations

from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.operators.recon import (
    bucket_checksums,
    diff_buckets,
    md5_long,
)


def _sides(spark, mutate=None, drop=None):
    rows = [(i, f"v{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "k long, v string")
    b_rows = [
        (k, mutate(k, v) if mutate else v)
        for k, v in rows
        if drop is None or not drop(k)
    ]
    b = spark.createDataFrame(b_rows, "k long, v string")
    mk = lambda d: bucket_checksums(d, F.col("k"), [d["k"], d["v"]], n_buckets=8)  # noqa: E731
    return mk(a), mk(b)


def test_identical_tables_all_match(spark):
    a, b = _sides(spark)
    rep = diff_buckets(a, b).collect()
    assert len(rep) == 8
    assert all(r.match and r.n_a == r.n_b for r in rep)


def test_single_mutation_flips_exactly_its_bucket(spark):
    a, b = _sides(spark, mutate=lambda k, v: "CHANGED" if k == 42 else v)
    bad = [r for r in diff_buckets(a, b).collect() if not r.match]
    assert len(bad) == 1
    # counts agree (no rows were dropped) — only the checksum disagrees
    assert bad[0].n_a == bad[0].n_b
    want = (
        a.sparkSession.range(1)
        .select((md5_long(F.lit("42")) % 8).alias("b"))
        .first()
        .b
    )
    assert bad[0].bucket == want


def test_dropped_rows_show_count_mismatch(spark):
    a, b = _sides(spark, drop=lambda k: k % 10 == 0)
    rep = diff_buckets(a, b).collect()
    assert sum(r.n_a for r in rep) == 100
    assert sum(r.n_b for r in rep) == 90
    assert any(not r.match and r.n_a != r.n_b for r in rep)


def test_checksum_is_partitioning_insensitive(spark):
    rows = [(i, f"v{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "k long, v string")
    one = bucket_checksums(
        df.coalesce(1), F.col("k"), [df["k"], df["v"]], n_buckets=8
    )
    many = bucket_checksums(
        df.repartition(13), F.col("k"), [df["k"], df["v"]], n_buckets=8
    )
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_apply_table_diff_identity(spark):
    """r11: apply(v1, table_diff(v1, v2)) == v2 row-for-row — the CDF
    consumer half's contract, covering insert/update/delete plus a
    NULLed payload column (the case the r10 oracle review flagged)."""
    from evidence_images_etl_airflow_spark.operators.recon import (
        apply_table_diff,
        table_diff,
    )

    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k long, s string, p double",
    )
    # 1 unchanged, 2 updated (payload to NULL), 3 deleted, 5 inserted
    v2 = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 20.0), (4, "d", 40.0), (5, "e", 50.0)],
        "k long, s string, p double",
    )
    d = table_diff(v1, v2, ["k"])
    got = apply_table_diff(v1, d, ["k"])
    assert got.exceptAll(v2).count() == 0 and v2.exceptAll(got).count() == 0

    # idempotent on an empty diff
    empty = table_diff(v2, v2, ["k"])
    same = apply_table_diff(v2, empty, ["k"])
    assert same.exceptAll(v2).count() == 0 and v2.exceptAll(same).count() == 0

    # schema mismatch is refused, not silently misapplied
    import pytest as _pt
    with _pt.raises(ValueError, match="shape"):
        apply_table_diff(v1, d.drop("change_type"), ["k"])


def test_embedding_drift_profile_hand_case(spark):
    """r11: two 2-dim vintages with a known dim-0 mean shift; dim-1
    identical. Exact decimal sums make the moments bit-predictable."""
    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.operators.pca import (
        embedding_drift_profile,
    )

    rows = [
        (0, [1.0, 5.0]), (2, [2.0, 6.0]),   # vintage 0: dim0 mean 1.5
        (1, [3.0, 5.0]), (3, [4.0, 6.0]),   # vintage 1: dim0 mean 3.5
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.dim: r
        for r in embedding_drift_profile(
            df, "embedding", F.col("vec_id") % 2
        ).collect()
    }
    d0, d1 = out[0], out[1]
    assert (d0.n_a, d0.n_b) == (2, 2)
    assert (d0.mean_a, d0.mean_b, d0.mean_shift) == (1.5, 3.5, 2.0)
    assert d0.var_a == d0.var_b == 0.25  # E[x^2]-m^2 = 2.5-2.25
    assert d0.z_shift == 4.0  # 2.0 / sqrt(0.25/2 + 0.25/2)
    assert (d1.mean_a, d1.mean_b, d1.mean_shift) == (5.5, 5.5, 0.0)
    assert d1.z_shift == 0.0


def test_embedding_drift_profile_clamps_negative_variance(spark):
    """ADVICE r11: 6dp rounding can push m2 - mean^2 slightly negative
    on a near-constant dimension; the clamp (F.greatest(var, 0), mirrored
    in the registered oracle) keeps variance at 0 and z_shift finite/NULL
    instead of NaN."""
    import math

    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.operators.pca import (
        embedding_drift_profile,
    )

    # Constant v = 0.7071075: elements round to mean 0.707108 (HALF_UP)
    # while v*v = 0.5000010169 rounds to m2 = 0.500001, so unclamped
    # var = round(0.500001 - 0.707108^2, 6) = round(-7.24e-7, 6)
    # = -0.000001 — strictly negative, sqrt would NaN the z.
    v = 0.7071075
    rows = [(i, [v]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_drift_profile(df, "embedding", F.col("vec_id") % 2).collect()
    assert len(out) == 1
    r = out[0]
    assert r.var_a == 0.0 and r.var_b == 0.0  # clamped, not -0.000001
    # se = 0 -> nullif makes z NULL, never NaN
    assert r.z_shift is None or not math.isnan(r.z_shift)
