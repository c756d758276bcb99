"""SCD2 dimension maintenance + BM25 retrieval (round-4 surface)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.operators.scd import scd2_apply

D = dt.date


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [
            # closed historical version — must pass through untouched
            Row(k=1, v="old", valid_from=D(2023, 1, 1), valid_to=D(2024, 1, 1)),
            Row(k=1, v="a", valid_from=D(2024, 1, 1), valid_to=None),
            Row(k=2, v="b", valid_from=D(2024, 1, 1), valid_to=None),
            Row(k=3, v=None, valid_from=D(2024, 1, 1), valid_to=None),
        ]
    )


def _apply(dim, updates):
    return scd2_apply(
        dim, updates, keys=["k"], tracked=["v"], effective_col="eff"
    )


def test_scd2_change_closes_and_appends(spark, dim):
    upd = spark.createDataFrame([Row(k=1, v="a2", eff=D(2024, 6, 1))])
    out = _apply(dim, upd).orderBy("k", "valid_from").collect()
    k1 = [r for r in out if r.k == 1]
    assert [(r.v, r.valid_from, r.valid_to) for r in k1] == [
        ("old", D(2023, 1, 1), D(2024, 1, 1)),
        ("a", D(2024, 1, 1), D(2024, 6, 1)),  # closed at effective date
        ("a2", D(2024, 6, 1), None),  # new current version
    ]
    # untouched keys keep exactly one open row
    assert [(r.v, r.valid_to) for r in out if r.k == 2] == [("b", None)]


def test_scd2_unchanged_and_unknown_updates_are_noops(spark, dim):
    upd = spark.createDataFrame(
        [
            Row(k=2, v="b", eff=D(2024, 6, 1)),  # same value — no-op
            Row(k=99, v="x", eff=D(2024, 6, 1)),  # unknown key — ignored
        ]
    )
    out = _apply(dim, upd)
    assert out.count() == dim.count()
    assert out.filter(F.col("k") == 99).count() == 0
    assert out.filter((F.col("k") == 2) & F.col("valid_to").isNull()).count() == 1


def test_scd2_null_to_value_is_a_change(spark, dim):
    upd = spark.createDataFrame([Row(k=3, v="now-set", eff=D(2024, 6, 1))])
    out = _apply(dim, upd)
    k3 = out.filter(F.col("k") == 3).orderBy("valid_from").collect()
    assert [(r.v, r.valid_to) for r in k3] == [
        (None, D(2024, 6, 1)),
        ("now-set", None),
    ]


def test_bm25_ranks_term_dense_docs_first(spark):
    from evidence_images_etl_airflow_spark.workload import REGISTRY

    rows = REGISTRY["text_bm25_search"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_distribution_ranks_are_well_formed(spark):
    from evidence_images_etl_airflow_spark.workload import REGISTRY

    rows = REGISTRY["window_distribution_ranks"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "expected customers"
    assert {r.quartile for r in rows} <= {1, 2, 3, 4}
    for r in rows:
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0.0 < r.cume_dist <= 1.0


def test_trimmed_mean_grouped_agg(spark):
    """GROUPED_AGG pandas UDF: known 10-value group — trim drops the
    min and max (k=1), mean of the middle 8."""
    from evidence_images_etl_airflow_spark.operators.grouped import (
        trimmed_count_10,
        trimmed_mean_10,
    )

    vals = [(1, float(v)) for v in [100, 1, 2, 3, 4, 5, 6, 7, 8, 9]]
    df = spark.createDataFrame(vals, "g int, v double")
    row = (
        df.groupBy("g")
        .agg(trimmed_mean_10("v").alias("m"), trimmed_count_10("v").alias("n"))
        .first()
    )
    assert row.n == 8
    assert row.m == pytest.approx(sum([2, 3, 4, 5, 6, 7, 8, 9]) / 8)


def test_apply_cdc_log_order_invariant_with_tombstones(spark):
    """Hand-computed CDC collapse: last writer by seq wins, delete
    tombstone removes the key, arrival order is irrelevant."""
    from evidence_images_etl_airflow_spark.operators.scd import apply_cdc_log

    log = [
        ("k1", 1, "insert", 10),
        ("k1", 3, "update", 30),   # winner for k1
        ("k1", 2, "update", 20),
        ("k2", 1, "insert", 1),
        ("k2", 2, "delete", 0),    # tombstone -> k2 absent
        ("k3", 5, "insert", 7),
    ]
    df = spark.createDataFrame(log, "k string, seq long, op string, v long")
    out = {
        r.k: (r.seq, r.op, r.v)
        for r in apply_cdc_log(df, ["k"], ["seq"], "op").collect()
    }
    assert out == {"k1": (3, "update", 30), "k3": (5, "insert", 7)}
    # shuffled arrival -> identical snapshot
    import random

    rnd = log[:]
    random.Random(7).shuffle(rnd)
    df2 = spark.createDataFrame(rnd, "k string, seq long, op string, v long")
    out2 = {
        r.k: (r.seq, r.op, r.v)
        for r in apply_cdc_log(df2, ["k"], ["seq"], "op").collect()
    }
    assert out2 == out


def test_apply_cdc_log_tiebreak_restores_total_order(spark):
    """ADVICE r07: two events tying on every seq col (a replayed LSN)
    would make the survivor nondeterministic; a stable event-id
    tiebreak column appended to the window order pins it — the larger
    event id wins, regardless of arrival order."""
    from evidence_images_etl_airflow_spark.operators.scd import apply_cdc_log

    log = [
        ("k1", 7, "e02", "update", 20),
        ("k1", 7, "e09", "update", 90),  # same seq; e09 > e02 wins
        ("k1", 7, "e05", "update", 50),
    ]
    for seed in (1, 2, 3):
        import random

        rnd = log[:]
        random.Random(seed).shuffle(rnd)
        df = spark.createDataFrame(
            rnd, "k string, seq long, eid string, op string, v long"
        )
        out = apply_cdc_log(
            df, ["k"], ["seq"], "op", tiebreak_cols=["eid"]
        ).collect()
        assert [(r.k, r.eid, r.v) for r in out] == [("k1", "e09", 90)]


def test_apply_cdc_log_null_op_is_not_a_tombstone(spark):
    from evidence_images_etl_airflow_spark.operators.scd import apply_cdc_log

    df = spark.createDataFrame(
        [("k1", 1, "insert", 1), ("k1", 2, None, 2), ("k2", 1, "delete", 0)],
        "k string, seq long, op string, v long",
    )
    out = {r.k: r.v for r in apply_cdc_log(df, ["k"], ["seq"], "op").collect()}
    # malformed (NULL) op keeps the row; real tombstone still deletes
    assert out == {"k1": 2}


def test_events_churn_features_hand_case(spark, tmp_path):
    """r12: corpus-max-anchored churn label + activity features."""
    from evidence_images_etl_airflow_spark.workload import REGISTRY

    rows = [
        (1, "2024-01-01 10:00:00", 1, "view", 1.00, "{}"),
        (2, "2024-01-29 10:00:00", 1, "view", 2.50, "{}"),
        (3, "2024-01-30 09:00:00", 1, "buy", 0.25, "{}"),
        (4, "2024-01-30 11:00:00", 1, "view", 0.25, "{}"),
        (5, "2024-01-01 08:00:00", 2, "view", 10.00, "{}"),
        (6, "2024-01-20 08:00:00", 2, "buy", 5.00, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = f"{tmp_path}/sf"
    df.write.parquet(f"{d}/events.parquet")
    out = {r.user_id: r for r in REGISTRY["events_churn_features"].fn(spark, d).collect()}
    u1, u2 = out[1], out[2]
    assert (u1.n_events, u1.n_active_days, u1.tenure_days) == (4, 3, 29)
    assert (u1.recency_days, u1.events_7d, u1.value_sum) == (0, 3, 4.0)
    assert u1.churned is False
    assert (u2.n_events, u2.n_active_days, u2.tenure_days) == (2, 2, 19)
    assert (u2.recency_days, u2.events_7d, u2.value_sum) == (10, 0, 15.0)
    assert u2.churned is True


def test_events_attribution_last_touch_hand_case(spark, tmp_path):
    """r12: purchases credit the last preceding non-purchase event."""
    from evidence_images_etl_airflow_spark.workload import REGISTRY

    rows = [
        # user 1: view -> click -> purchase(2.00) => click
        (1, "2024-01-01 10:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 11:00:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-01 12:00:00", 1, "purchase", 2.00, "{}"),
        # user 2: purchase with no prior touch => direct;
        # then view -> purchase => view
        (4, "2024-01-02 09:00:00", 2, "purchase", 1.00, "{}"),
        (5, "2024-01-02 10:00:00", 2, "view", 0.0, "{}"),
        (6, "2024-01-02 11:00:00", 2, "purchase", 3.00, "{}"),
        # user 3: tie on ts — event_id breaks it deterministically:
        # click(7) precedes purchase(8) at the same instant
        (7, "2024-01-03 10:00:00", 3, "click", 0.0, "{}"),
        (8, "2024-01-03 10:00:00", 3, "purchase", 4.00, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = f"{tmp_path}/sf"
    df.write.parquet(f"{d}/events.parquet")
    out = {
        r.channel: r
        for r in REGISTRY["events_attribution_last_touch"].fn(spark, d).collect()
    }
    assert set(out) == {"click", "view", "direct"}
    assert (out["click"].n_conversions, out["click"].value_sum) == (2, 6.0)
    assert (out["view"].n_conversions, out["view"].value_sum) == (1, 3.0)
    assert (out["direct"].n_conversions, out["direct"].value_sum) == (1, 1.0)
    assert out["click"].share == 0.5


def test_orders_interarrival_profile_hand_case(spark, tmp_path):
    """r12: per-customer day gaps bucketed into the cadence histogram."""
    from evidence_images_etl_airflow_spark.workload import REGISTRY

    rows = [
        # cust 1: days 0, 0, 5, 40  -> gaps 0 (same-day), 5, 35
        (1, 1, "O", 10.0, "1995-01-01 00:00:00", "1-URGENT"),
        (2, 1, "O", 10.0, "1995-01-01 00:00:00", "1-URGENT"),
        (3, 1, "O", 10.0, "1995-01-06 00:00:00", "1-URGENT"),
        (4, 1, "O", 10.0, "1995-02-10 00:00:00", "1-URGENT"),
        # cust 2: one order -> no gap
        (5, 2, "O", 10.0, "1995-01-01 00:00:00", "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    d = f"{tmp_path}/sf"
    df.write.parquet(f"{d}/orders.parquet")
    out = {
        r.bucket: r
        for r in REGISTRY["orders_interarrival_profile"].fn(spark, d).collect()
    }
    assert set(out) == {"same-day", "1-7d", "31-90d"}
    assert out["same-day"].n_gaps == 1 and out["1-7d"].n_gaps == 1
    assert out["31-90d"].n_gaps == 1
    assert out["1-7d"].share == round(1 / 3, 6)
    # mean gap = (0 + 5 + 35) / 3
    assert out["same-day"].mean_gap_days == round(40 / 3, 4)


def test_events_active_users_stickiness_hand_case(spark, tmp_path):
    """r12: exact DAU/MAU rollup — duplicate same-day events collapse."""
    from evidence_images_etl_airflow_spark.workload import REGISTRY

    rows = [
        # Jan: u1 active on 2 days (twice on the 1st), u2 on 1 day
        (1, "2024-01-01 10:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 11:00:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-02 10:00:00", 1, "view", 0.0, "{}"),
        (4, "2024-01-02 10:30:00", 2, "view", 0.0, "{}"),
        # Feb: u2 only
        (5, "2024-02-05 10:00:00", 2, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = f"{tmp_path}/sf"
    df.write.parquet(f"{d}/events.parquet")
    out = {
        r.ym: r
        for r in REGISTRY["events_active_users_stickiness"].fn(spark, d).collect()
    }
    jan, feb = out[202401], out[202402]
    # Jan: day1 DAU=1, day2 DAU=2 -> n_days=2, sum_dau=3, MAU=2
    assert (jan.n_days, jan.sum_dau, jan.mau) == (2, 3, 2)
    assert jan.avg_dau == 1.5 and jan.stickiness == 0.75
    assert (feb.n_days, feb.sum_dau, feb.mau) == (1, 1, 1)
    assert feb.stickiness == 1.0


def test_events_forecast_mase_hand_case(spark, tmp_path):
    """r12: zero-filled seasonal-naive baseline with exact MASE."""
    from evidence_images_etl_airflow_spark.workload import REGISTRY

    # 15 consecutive days, one event on each day d with count pattern:
    # y = [5,6,7,8,9,10,11, 5,6,7,8,9,10,11, 5] (period-7 repeating),
    # except day idx 13 has 12 instead of 11 and day idx 9 missing
    # (zero-fill -> y=0 there).
    counts = {0: 5, 1: 6, 2: 7, 3: 8, 4: 9, 5: 10, 6: 11,
              7: 5, 8: 6, 10: 8, 11: 9, 12: 10, 13: 12, 14: 5}
    rows, eid = [], 0
    for dd, cnt in counts.items():
        for _ in range(cnt):
            eid += 1
            rows.append(
                (eid, f"2024-03-{dd + 1:02d} 12:00:00", 1, "view", 0.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    d = f"{tmp_path}/sf"
    df.write.parquet(f"{d}/events.parquet")
    out = REGISTRY["events_forecast_mase"].fn(spark, d).collect()
    # 15-day grid: test = last 7 days (idx 8..14), train = idx 0..7
    assert len(out) == 7
    by_idx = {r.d - out[0].d + 8: r for r in out}
    # idx 9 zero-filled: y=0, yhat=y(idx2)=7 -> abs_err 7
    assert (by_idx[9].y, by_idx[9].yhat, by_idx[9].abs_err) == (0, 7, 7)
    # idx 13: y=12, yhat=y(idx6)=11 -> abs_err 1
    assert (by_idx[13].y, by_idx[13].yhat, by_idx[13].abs_err) == (12, 11, 1)
    # idx 8: y=6, yhat=y(idx1)=6 -> 0
    assert by_idx[8].abs_err == 0
    # train naive-1 pairs idx1..7: diffs 1,1,1,1,1,1,-6 -> sa_tr = 12,
    # n_tr = 7; test errors 0,7,0,0,0,1,0 -> sa_te = 8
    assert out[0].mase == round((8 * 7) / (7 * 12), 6)
