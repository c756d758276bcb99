"""Hand-case tests for operators/timeseries.py (CUSUM + EWMA)."""

from __future__ import annotations

import pytest

from evidence_images_etl_airflow_spark.operators.timeseries import (
    cusum_changepoint,
    ewma_smooth,
)


def test_cusum_finds_the_level_shift_day(spark):
    # 5 days at rate 1, then 5 days at rate 10: the CUSUM max lands on
    # the last low day (i=5): NS_i = 10*P_i - 55*i, |NS_5| = 225.
    rows = [(d, 1) for d in range(1, 6)] + [(d, 10) for d in range(6, 11)]
    df = spark.createDataFrame(rows, "d bigint, y bigint")
    r = cusum_changepoint(df, "d", "y").collect()[0]
    assert (r["n_days"], r["total"]) == (10, 55)
    assert (r["cp_day"], r["cp_index"]) == (5, 5)
    assert r["ns_abs_max"] == 225.0
    assert r["mean_before"] == 1.0
    assert r["mean_after"] == 10.0
    assert r["normalized_stat"] == round(225 / 550, 6)


def test_cusum_all_zero_series_is_degenerate(spark):
    df = spark.createDataFrame([(d, 0) for d in range(1, 5)], "d bigint, y bigint")
    r = cusum_changepoint(df, "d", "y").collect()[0]
    assert r["total"] == 0
    assert r["cp_day"] == 1  # earliest-day tie-break on all-zero NS
    assert r["normalized_stat"] is None
    assert r["mean_before"] == 0.0


def test_cusum_handles_negative_values(spark):
    # 3 days at +4, then 3 days at -4: T = sum(y) = 0, NOT max(prefix)
    # (=12). With T=0, NS_i = 6*P_i and the argmax is the last
    # positive day (P_3 = 12, |NS_3| = 72); normalized_stat is NULL.
    rows = [(1, 4), (2, 4), (3, 4), (4, -4), (5, -4), (6, -4)]
    df = spark.createDataFrame(rows, "d bigint, y bigint")
    r = cusum_changepoint(df, "d", "y").collect()[0]
    assert r["total"] == 0
    assert (r["cp_day"], r["cp_index"]) == (3, 3)
    assert r["ns_abs_max"] == 72.0
    assert r["mean_before"] == 4.0 and r["mean_after"] == -4.0
    assert r["normalized_stat"] is None


def test_cusum_negative_total_normalizes_by_abs(spark):
    # All-negative series: T = -6; the stat still normalizes by N*|T|.
    df = spark.createDataFrame(
        [(1, -1), (2, -1), (3, -4)], "d bigint, y bigint"
    )
    r = cusum_changepoint(df, "d", "y").collect()[0]
    assert r["total"] == -6
    # NS_i = 3*P_i - i*(-6): NS_1 = 3, NS_2 = 6, NS_3 = 0 -> cp at i=2.
    assert (r["cp_day"], r["cp_index"]) == (2, 2)
    assert r["normalized_stat"] == round(6 / (3 * 6), 6)


def test_ewma_head_renormalizes_and_weights_exactly(spark):
    # window=2, decay 1/2 -> integer weights w0=2, w1=1.
    # day 1: only its own value; day 2: (2*6 + 1*3)/3 = 5, resid 1.
    df = spark.createDataFrame([(1, 3), (2, 6)], "d bigint, y bigint")
    out = {
        r["d"]: r
        for r in ewma_smooth(
            df, "d", "y", decay_num=1, decay_den=2, window=2
        ).collect()
    }
    assert out[1]["ewma"] == 3.0 and out[1]["resid"] == 0.0
    assert out[2]["ewma"] == 5.0 and out[2]["resid"] == 1.0


def test_ewma_validates_parameters(spark):
    df = spark.createDataFrame([(1, 1)], "d bigint, y bigint")
    with pytest.raises(ValueError):
        ewma_smooth(df, "d", "y", decay_num=3, decay_den=2)
    with pytest.raises(ValueError):
        ewma_smooth(df, "d", "y", window=0)


def test_weekday_seasonal_index_invariants(spark):
    """Registry-level invariants on sf0.001: indexes average to 1
    under day-count weighting, and the y_sum column partitions the
    corpus total."""
    from evidence_images_etl_airflow_spark.workload import REGISTRY

    rows = REGISTRY["events_weekday_seasonal_index"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 7
    n_total = sum(r["n_days"] for r in rows)
    t_total = sum(r["y_sum"] for r in rows)
    assert t_total == 1000  # sf0.001 events row count
    weighted = sum(r["seasonal_index"] * r["n_days"] for r in rows)
    assert abs(weighted / n_total - 1.0) < 1e-4


def test_cohort_ltv_cumulative_is_consistent(spark):
    from collections import defaultdict

    from evidence_images_etl_airflow_spark.workload import REGISTRY

    rows = REGISTRY["orders_cohort_ltv"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_month"]].append(r)
    for cm, rs in by_cohort.items():
        rs.sort(key=lambda r: r["months_since"])
        assert rs[0]["months_since"] == 0  # cohort defined by first order
        run = 0.0
        for r in rs:
            run = round(run + r["revenue"], 2)
            assert abs(r["cum_revenue"] - run) < 0.02
            assert r["n_active"] <= r["n_cohort_customers"]
            got = r["cum_revenue"] / r["n_cohort_customers"]
            assert abs(r["ltv_per_customer"] - got) < 1e-4


def test_deseasonalized_adjustment_preserves_total(spark):
    """Registry-level invariant on sf0.001: dividing by the weekday
    index redistributes volume but preserves the corpus total
    (sum of y_adj == sum of y up to 6dp rounding per day)."""
    from evidence_images_etl_airflow_spark.workload import REGISTRY

    rows = REGISTRY["events_anomaly_deseasonalized"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 30
    assert abs(sum(r["y_adj"] for r in rows) - sum(r["y"] for r in rows)) < 0.01
    for r in rows:
        assert r["robust_ratio"] is None or r["robust_ratio"] >= 0
        # flag agrees with the ratio the same row reports
        if r["robust_ratio"] is not None:
            assert r["is_outlier"] == (r["robust_ratio"] > 3.0)


def test_value_migration_matrix_is_a_distribution(spark):
    from evidence_images_etl_airflow_spark.workload import REGISTRY

    rows = REGISTRY["customers_value_migration"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "expected customers active in both halves"
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    from collections import defaultdict

    per_from = defaultdict(float)
    for r in rows:
        assert 1 <= r["from_q"] <= 4 and 1 <= r["to_q"] <= 4
        per_from[r["from_q"]] += r["row_share"]
    for v in per_from.values():
        assert abs(v - 1.0) < 1e-4
