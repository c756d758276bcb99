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
