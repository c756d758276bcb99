"""Z-order layout: multi-dimensional data skipping via the manifest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.functions.zorder import (
    interleave_bits,
    zorder_layout,
)
from evidence_images_etl_airflow_spark.sinks.writers import cluster_by_range
from evidence_images_etl_airflow_spark.sources.manifest import (
    build_manifest,
    prune_files,
    scan_pruned,
)

N_FILES = 16


def test_interleave_known_bits(spark):
    """z(0b11, 0b00)=0b0101, z(0b00, 0b11)=0b1010, z(3,3)=0b1111."""
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3), (5, 2)], "x long, y long")
    got = [
        r[0]
        for r in df.select(interleave_bits(F.col("x"), F.col("y"), 4)).collect()
    ]
    # z(5,2) = x bits 101 at even slots -> 1,0,0,0,1 ; y bits 010 at odd
    # slots -> 0,0,1,0,0 => 0b010011 ... compute: x:101 -> 1<<0|0<<2|1<<4=17;
    # y:010 -> 0<<1|1<<3|0<<5=8 => 25
    assert got == [5, 10, 15, 25]


def test_interleave_masks_out_of_range(spark):
    """Inputs beyond the bit budget are masked, not mis-interleaved."""
    df = spark.createDataFrame([(0b10011, 0)], "x long, y long")
    got = df.select(interleave_bits(F.col("x"), F.col("y"), 4)).first()[0]
    # only low 4 bits of x survive: 0b0011 -> 1<<0 | 1<<2
    assert got == 5


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    """Orders written twice: 1-D range-clustered by custkey, and
    z-ordered on (custkey, order day). Manifests track BOTH dims."""
    base = tmp_path_factory.mktemp("zskip")
    orders = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(
            "o_orderkey",
            "o_custkey",
            F.datediff("o_orderdate", F.lit("1990-01-01")).alias("o_day"),
        )
    )
    lin_path = str(base / "linear")
    z_path = str(base / "zorder")
    cluster_by_range(orders, lin_path, ["o_custkey"], num_files=N_FILES)
    zorder_layout(orders, "o_custkey", "o_day", n_files=N_FILES).drop(
        "__z"
    ).write.parquet(z_path)
    cols = ["o_custkey", "o_day"]
    return (
        orders,
        build_manifest(spark, lin_path, cols).cache(),
        build_manifest(spark, z_path, cols).cache(),
    )


def test_zorder_prunes_on_both_dimensions(spark, layouts):
    """The 1-D layout prunes only its sort axis: a date-boxed query
    keeps every file. The z-layout keeps a strict subset on BOTH a
    custkey box and a date box — the multiplicative skipping win."""
    orders, lin_m, z_m = layouts
    lo_d, hi_d = orders.agg(F.min("o_day"), F.max("o_day")).first()
    band = (hi_d - lo_d) // 8
    date_box = {"o_day": (lo_d, lo_d + band)}
    lin_kept = prune_files(lin_m, date_box)
    z_kept = prune_files(z_m, date_box)
    assert len(lin_kept) == N_FILES, "off-axis query defeats the 1-D layout"
    assert len(z_kept) < N_FILES, "z-layout must skip files on the off axis"

    lo_c, hi_c = orders.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    cust_box = {"o_custkey": (lo_c, lo_c + (hi_c - lo_c) // 8)}
    assert len(prune_files(z_m, cust_box)) < N_FILES


def test_zorder_pruned_scan_is_exact(spark, layouts):
    """Skipping is an optimization, never an answer: the pruned scan
    over the z-layout returns exactly the brute-force filter rows."""
    orders, _, z_m = layouts
    lo_d, _ = orders.agg(F.min("o_day"), F.max("o_day")).first()
    box = {"o_day": (lo_d, lo_d + 100), "o_custkey": (10, 60)}
    got = sorted(
        r.o_orderkey for r in scan_pruned(spark, z_m, box).collect()
    )
    want = sorted(
        r.o_orderkey
        for r in orders.filter(
            F.col("o_day").between(lo_d, lo_d + 100)
            & F.col("o_custkey").between(10, 60)
        ).collect()
    )
    assert got == want and len(want) > 0
