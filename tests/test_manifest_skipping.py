"""File-level stats manifest + data-skipping scans (round-4 surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.sinks.writers import cluster_by_range
from evidence_images_etl_airflow_spark.sources.manifest import (
    build_manifest,
    prune_files,
    scan_pruned,
)

N_FILES = 8


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    """Orders range-clustered by o_orderkey into N_FILES files."""
    path = str(tmp_path_factory.mktemp("skip") / "orders")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cluster_by_range(orders, path, ["o_orderkey"], num_files=N_FILES)
    manifest = build_manifest(spark, path, ["o_orderkey"]).cache()
    return path, manifest, orders


def test_manifest_covers_every_file_and_row(spark, clustered):
    path, manifest, orders = clustered
    rows = manifest.collect()
    assert len(rows) == N_FILES
    assert sum(r.n_rows for r in rows) == orders.count()
    # range clustering → non-overlapping file ranges
    spans = sorted((r.o_orderkey_min, r.o_orderkey_max) for r in rows)
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi < lo


def test_point_range_touches_one_file(spark, clustered):
    path, manifest, orders = clustered
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    kept = prune_files(manifest, {"o_orderkey": (lo, lo + 5)})
    assert len(kept) == 1, "clustered layout should confine a point range to 1 file"


def test_pruned_scan_equals_full_filter(spark, clustered):
    path, manifest, orders = clustered
    keys = sorted(r.o_orderkey for r in orders.select("o_orderkey").collect())
    lo, hi = keys[len(keys) // 3], keys[len(keys) // 2]
    got = scan_pruned(spark, manifest, {"o_orderkey": (lo, hi)})
    want = orders.filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") <= hi))
    assert got.count() == want.count()
    assert got.select(F.sum("o_totalprice")).first()[0] == pytest.approx(
        want.select(F.sum("o_totalprice")).first()[0]
    )


def test_empty_prune_returns_empty_with_schema(spark, clustered):
    path, manifest, orders = clustered
    mx = orders.agg(F.max("o_orderkey")).first()[0]
    got = scan_pruned(spark, manifest, {"o_orderkey": (mx + 10_000, mx + 20_000)})
    assert got.count() == 0
    assert set(got.columns) == {"o_orderkey", "o_custkey", "o_totalprice"}


def test_unbounded_and_null_safe_pruning(spark, clustered):
    path, manifest, orders = clustered
    # one-sided interval: everything >= median survives in ~half the files
    keys = sorted(r.o_orderkey for r in orders.select("o_orderkey").collect())
    mid = keys[len(keys) // 2]
    kept = prune_files(manifest, {"o_orderkey": (mid, None)})
    assert 0 < len(kept) < N_FILES
    # a manifest row with NULL stats must be conservatively kept
    withnull = manifest.withColumn(
        "o_orderkey_min", F.lit(None).cast("long")
    ).withColumn("o_orderkey_max", F.lit(None).cast("long"))
    assert len(prune_files(withnull, {"o_orderkey": (0, 1)})) == N_FILES


def test_zorder_prunes_on_either_dimension(spark, tmp_path_factory):
    """Z-order layout: a narrow predicate on EITHER clustering column
    skips files; lexicographic clustering only skips on the leading
    column."""
    from evidence_images_etl_airflow_spark.sinks.writers import cluster_by_zorder

    base = tmp_path_factory.mktemp("zorder")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 16
    zpath, lpath = str(base / "z"), str(base / "lex")
    cluster_by_zorder(orders, zpath, "o_custkey", "o_totalprice", num_files=n_files)
    cluster_by_range(orders, lpath, ["o_custkey", "o_totalprice"], num_files=n_files)
    zman = build_manifest(spark, zpath, ["o_custkey", "o_totalprice"])
    lman = build_manifest(spark, lpath, ["o_custkey", "o_totalprice"])

    # narrow band on the SECOND column (price): z-order must skip,
    # lexicographic spans the whole price domain in every file
    price = {"o_totalprice": (100000.0, 120000.0)}
    z_kept, l_kept = len(prune_files(zman, price)), len(prune_files(lman, price))
    assert z_kept < n_files / 2, f"zorder kept {z_kept}/{n_files} on price band"
    assert z_kept < l_kept, f"zorder ({z_kept}) should beat lexicographic ({l_kept})"

    # the leading column still prunes under z-order too (custkey spans
    # 0-149 at sf0.001, so (0, 20) is a ~13% band)
    cust = {"o_custkey": (0, 20)}
    assert len(prune_files(zman, cust)) < n_files / 2

    # correctness: pruned scan == full filter on the z layout
    got = scan_pruned(spark, zman, price).count()
    want = orders.filter(
        (F.col("o_totalprice") >= 100000.0) & (F.col("o_totalprice") <= 120000.0)
    ).count()
    assert got == want


def test_dedup_against_store_incremental_ingest(spark):
    """Cross-batch exact dedup: batch 2 drops rows whose fingerprint
    was already ingested in batch 1, plus its own in-batch dups."""
    from evidence_images_etl_airflow_spark.operators.dedup import dedup_against_store

    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha  beta ")],  # 3 dups 1
        "doc_id long, text string",
    )
    empty_store = spark.createDataFrame([], "fingerprint string")
    s1 = dedup_against_store(b1, empty_store, "doc_id", "text")
    assert sorted(r.doc_id for r in s1.collect()) == [1, 2]

    store = s1.select("fingerprint")
    b2 = spark.createDataFrame(
        [(10, "ALPHA BETA"), (11, "epsilon"), (12, "epsilon"), (13, "gamma delta")],
        "doc_id long, text string",
    )
    s2 = dedup_against_store(b2, store, "doc_id", "text")
    # 10 dups batch-1's "alpha beta" (case-insensitive fingerprint),
    # 13 dups batch-1's "gamma delta", 12 dups 11 in-batch
    assert sorted(r.doc_id for r in s2.collect()) == [11]


def test_update_manifest_stats_only_new_files(spark, tmp_path_factory):
    from evidence_images_etl_airflow_spark.sources.manifest import update_manifest

    path = str(tmp_path_factory.mktemp("incr") / "tbl")
    spark.range(100).select(
        F.col("id"), (F.col("id") * 2).alias("val")
    ).coalesce(2).write.parquet(path)
    m1 = update_manifest(
        spark, path, build_manifest(spark, path, ["id"]).limit(0), ["id"]
    )
    base = build_manifest(spark, path, ["id"])
    assert sorted(r.file for r in m1.collect()) == sorted(
        r.file for r in base.collect()
    )

    # append new files; refresh stats only them and keeps old rows
    spark.range(100, 150).select(
        F.col("id"), (F.col("id") * 2).alias("val")
    ).coalesce(1).write.mode("append").parquet(path)
    m2 = update_manifest(spark, path, m1, ["id"])
    assert m2.count() == m1.count() + 1
    new_rows = {r.file: (r.id_min, r.id_max) for r in m2.collect()}
    full = {r.file: (r.id_min, r.id_max) for r in build_manifest(spark, path, ["id"]).collect()}
    # same basenames and same stats as a from-scratch rebuild
    assert {f.rsplit("/", 1)[-1] for f in new_rows} == {
        f.rsplit("/", 1)[-1] for f in full
    }
    assert sorted(new_rows.values()) == sorted(full.values())

    # no new files -> unchanged; and pruning still works off the result
    m3 = update_manifest(spark, path, m2, ["id"])
    assert m3.count() == m2.count()
    hit = prune_files(m3, {"id": (120, 130)})
    assert len(hit) == 1
