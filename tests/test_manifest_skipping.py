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
