"""Degenerate-slice hardening (the ep6/PSI crash class, r15 second
wave): a division whose denominator is a SUBSET aggregate — a slice
count, a windowed error sum, an OLS variance term — can be zero on
inputs the sf-testdata never produces (one-sided experiment slices,
flat time series, single-token corpora, fully-dropped crawl batches).
Under Spark 4's ANSI mode that is a runtime crash; DuckDB returns
NULL for x/0, so the correct hardening is an explicit NULL
("undefined, not 0") that also keeps the two engines aligned on the
degenerate corpus. Each test plants the adversarial input against the
REGISTERED query (not a private fixture of the operator), so the
guard is exercised through the exact plan the driver runs."""

import datetime as dt

from evidence_images_etl_airflow_spark.workload import REGISTRY

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events_dir(spark, tmp_path, rows):
    d = f"{tmp_path}/sf"
    spark.createDataFrame(rows, _EVENTS_SCHEMA).write.parquet(
        f"{d}/events.parquet"
    )
    return d


def test_experiment_lift_one_sided_variant_is_null_not_crash(
    spark, tmp_path
):
    """Every user hashes to variant 0 (all even ids — real on tiny or
    filtered slices): arm B has no users, so its rate, the lift, and
    the z are UNDEFINED — NULL, not a division crash."""
    t = dt.datetime(2024, 1, 1, 10)
    rows = [
        (i, t, 2 * i, "purchase" if i % 2 == 0 else "view", 1.0, "{}")
        for i in range(6)
    ]
    out = REGISTRY["events_experiment_lift"].fn(
        spark, _events_dir(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a, r.n_b) == (6, 0)
    assert r.rate_a == 0.5
    assert r.rate_b is None and r.lift is None and r.z_score is None


def test_forecast_mase_flat_train_is_null_not_crash(spark, tmp_path):
    """A perfectly flat daily series (one event per day, 21 days) has
    zero in-sample naive error — the MASE denominator. MASE is
    undefined on such a window: NULL per test day, not a crash."""
    rows = [
        (i, dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=i), 1,
         "view", 1.0, "{}")
        for i in range(21)
    ]
    out = REGISTRY["events_forecast_mase"].fn(
        spark, _events_dir(spark, tmp_path, rows)
    ).collect()
    assert len(out) == 7  # the final-7-day test window
    assert all(r.y == 1 and r.yhat == 1 and r.abs_err == 0 for r in out)
    assert all(r.mase is None for r in out)


def test_zipf_single_token_corpus_slope_null_not_crash(spark, tmp_path):
    """A one-token vocabulary gives the rank-frequency OLS a zero
    variance term (m=1, x=log(1)=0): the slope is undefined — NULL,
    not an ANSI crash."""
    rows = [(i, "same same same", "en", "s0", 14) for i in range(5)]
    d = f"{tmp_path}/sf"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.parquet(f"{d}/documents.parquet")
    out = REGISTRY["text_zipf_fit"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.vocab_size == 1
    assert r.zipf_slope is None and r.zipf_intercept is None


def test_psi_report_empty_slice_floors_to_eps_not_crash(spark):
    """Operator-level contract of the r15 fix: an EMPTY slice (here:
    no 'cur' rows at all) floors to eps proportions — PSI reads as
    maximal drift — instead of throwing on the zero total. Callers
    wanting vacuous-pass semantics gate on the slice count (ep6's
    planted all-duplicate-batch test covers that layer)."""
    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.operators.drift import psi_report

    df = spark.createDataFrame(
        [(float(i % 10),) for i in range(100)], "x double"
    )
    rep = psi_report(
        df, F.lit("ref"), numeric_cols=("x",), n_bins=10
    ).collect()
    assert rep  # one row per observed bin, no crash
    psi = rep[0].psi
    assert all(r.psi == psi for r in rep)
    assert psi > 0.2  # all-eps cur side reads as strong drift
    assert all(r.p_cur == 1e-6 for r in rep)
