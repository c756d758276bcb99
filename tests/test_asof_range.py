"""As-of join and bucketed range join (engine extensions; SURVEY.md
§2.5 records the reference as equi-join-only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.operators.asof import asof_join_backward
from evidence_images_etl_airflow_spark.operators.range_join import range_join


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [("A", 100, 1.0), ("A", 205, 2.0), ("B", 50, 3.0), ("C", 10, 4.0)],
        "sym string, ts long, qty double",
    )
    quotes = spark.createDataFrame(
        [("A", 90, 10.0), ("A", 100, 11.0), ("A", 200, 12.0), ("B", 60, 13.0)],
        "sym string, ts long, px double",
    )
    return trades, quotes


def test_asof_backward_semantics(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join_backward(
        trades, quotes, keys=["sym"], left_ts="ts", right_ts="ts", payload=["px"]
    )
    got = {(r.sym, r.ts): r.px for r in out.collect()}
    assert got == {
        ("A", 100): 11.0,  # exact-timestamp quote matches
        ("A", 205): 12.0,  # latest at-or-before
        ("B", 50): None,  # quote exists only later -> no match
        ("C", 10): None,  # key absent from right side
    }
    # left-outer: every trade survives
    assert out.count() == trades.count()


def test_asof_tolerance_nulls_stale_matches(spark, quotes_trades):
    trades, quotes = quotes_trades
    out = asof_join_backward(
        trades, quotes, keys=["sym"], left_ts="ts", right_ts="ts",
        payload=["px"], tolerance=5,
    )
    got = {(r.sym, r.ts): r.px for r in out.collect()}
    # A@205's best quote is 200 (within 5); A@100's is exact (age 0)
    assert got[("A", 205)] == 12.0
    assert got[("A", 100)] == 11.0
    assert got[("B", 50)] is None


def test_asof_payload_collision_raises(spark, quotes_trades):
    trades, quotes = quotes_trades
    with pytest.raises(ValueError, match="collide"):
        asof_join_backward(
            trades, quotes.withColumnRenamed("px", "qty"),
            keys=["sym"], left_ts="ts", right_ts="ts", payload=["qty"],
        )


def test_asof_plan_shuffles_once_no_join(spark, quotes_trades):
    """The union+window plan must contain no join operator at all and
    exactly one hash-partitioning exchange (the window shuffle)."""
    trades, quotes = quotes_trades
    plan = asof_join_backward(
        trades, quotes, keys=["sym"], left_ts="ts", right_ts="ts", payload=["px"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_band_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 1000, "e1"), ("u2", 5000, "e2")], "k string, ts long, eid string"
    )
    right = spark.createDataFrame(
        [("u1", 900, 1.0),   # 100 before e1 -> in [lower=150]
         ("u1", 1100, 2.0),  # 100 after -> in [upper=100]
         ("u1", 1101, 3.0),  # 101 after -> out
         ("u1", 840, 4.0),   # 160 before -> out
         ("u2", 1000, 5.0)],  # other key, far away
        "k string, ts long, v double",
    )
    out = range_join(
        left, right, keys=["k"], left_ts="ts", right_ts="ts", lower=150, upper=100
    )
    got = {(r.eid, r.ts_r) for r in out.collect()}
    assert got == {("e1", 900), ("e1", 1100)}
    # right ts collided with left ts -> suffixed; key emitted once
    assert out.columns == ["k", "ts", "eid", "ts_r", "v"]


def test_range_join_bucket_width_invariant(spark):
    """Result must not depend on the bucket width (only the plan does)."""
    left = spark.range(0, 50).select(
        F.lit("k").alias("k"), (F.col("id") * 37 % 997).alias("ts"), F.col("id").alias("lid")
    )
    right = spark.range(0, 80).select(
        F.lit("k").alias("k"), (F.col("id") * 53 % 997).alias("ts"), F.col("id").alias("rid")
    )
    expected = None
    for bucket in (1, 7, 60, 10_000):
        got = sorted(
            (r.lid, r.rid)
            for r in range_join(
                left, right, keys=["k"], left_ts="ts", right_ts="ts",
                lower=30, upper=12, bucket=bucket,
            ).collect()
        )
        if expected is None:
            expected = got
        assert got == expected
    assert expected  # the band is wide enough that pairs exist


def test_range_join_plan_is_equi_join(spark):
    left = spark.createDataFrame([("u1", 1000, "e1")], "k string, ts long, eid string")
    right = spark.createDataFrame([("u1", 900, 1.0)], "k string, ts long, v double")
    plan = range_join(
        left, right, keys=["k"], left_ts="ts", right_ts="ts", lower=100, upper=100
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_islands_merge_touching_and_split_gaps(spark):
    """Hand-computed gaps-and-islands: overlapping and touching
    intervals merge (running-max rule), a true gap splits, keys are
    independent."""
    from pyspark.sql import functions as F
    from evidence_images_etl_airflow_spark.workload import REGISTRY  # noqa: F401

    rows = [
        # key a: [1,5] + [4,8] overlap; [8,10] touches (start == max end -> merge);
        # [12,13] gaps -> new island
        ("a", 1, 5), ("a", 4, 8), ("a", 8, 10), ("a", 12, 13),
        # key b: single interval
        ("b", 2, 3),
    ]
    iv = spark.createDataFrame(rows, "k string, s int, e int")
    from pyspark.sql import Window

    wprev = Window.partitionBy("k").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wrun = Window.partitionBy("k").orderBy("s", "e").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = (
        iv.withColumn(
            "brk", F.when(F.col("s") > F.max("e").over(wprev), 1).otherwise(0)
        )
        .withColumn("island", F.sum("brk").over(wrun))
        .groupBy("k", "island")
        .agg(F.min("s").alias("st"), F.max("e").alias("en"), F.count("*").alias("n"))
        .collect()
    )
    got = {(r.k, r.island): (r.st, r.en, r.n) for r in out}
    assert got == {
        ("a", 0): (1, 10, 3),
        ("a", 1): (12, 13, 1),
        ("b", 0): (2, 3, 1),
    }
