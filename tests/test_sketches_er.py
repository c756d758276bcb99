"""Mergeable HLL sketch rollups and blocked fuzzy entity resolution."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.operators.er import (
    blocked_levenshtein_pairs,
    last_token_block,
)
from evidence_images_etl_airflow_spark.operators.sketches import (
    rollup_sketches,
    sketch_at_grain,
)


def test_sketch_union_matches_direct_estimate(spark):
    """Union of per-day sketches estimates the same cardinality as the
    exact distinct over the whole — the reaggregation property that
    makes the daily sketch table sufficient for every coarser grain."""
    rows = [(d, u) for d in ("d1", "d2", "d3") for u in range(200)]
    df = spark.createDataFrame(rows, "day string, user int")
    daily = sketch_at_grain(df, ["day"], "user")
    assert daily.count() == 3
    est = rollup_sketches(daily, [], estimate_col="est").collect()[0]["est"]
    # 200 distinct users overall; lgK=14 keeps sparse-mode accuracy here
    assert abs(est - 200) <= 10


def test_sketch_rollup_per_group(spark):
    df = spark.createDataFrame(
        [("a", "d1", 1), ("a", "d1", 2), ("a", "d2", 2), ("b", "d1", 9)],
        "g string, day string, user int",
    )
    daily = sketch_at_grain(df, ["g", "day"], "user")
    got = {
        r["g"]: r["est"]
        for r in rollup_sketches(daily, ["g"], estimate_col="est").collect()
    }
    assert round(got["a"]) == 2 and round(got["b"]) == 1


def test_mg_exact_when_capacity_covers_distincts(spark):
    """With capacity >= distinct values no compression ever fires:
    estimates are exact and the error bound is zero."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        topk_heavy_hitters,
    )

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 7
    df = spark.createDataFrame(rows, "v string").repartition(4)
    got = {r["item"]: r for r in topk_heavy_hitters(df, "v", k=3, capacity=8).collect()}
    assert got["a"]["est"] == 50 and got["a"]["rank"] == 1
    assert got["b"]["est"] == 30 and got["b"]["rank"] == 2
    assert got["c"]["est"] == 7 and got["c"]["rank"] == 3
    assert all(r["err_bound"] == 0 for r in got.values())


def test_mg_underestimates_within_error_bound(spark):
    """Capacity < distincts forces real compression; the MG theorems
    must still hold: est <= true, true - est <= err_bound, and any
    item with true count > err_bound survives — so the heavy hitter
    ranks first."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        merge_mg_summaries,
        misra_gries_summaries,
        topk_heavy_hitters,
    )

    # one dominant value + a long tail of singletons, spread over
    # partitions so the cross-partition merge leg is exercised too
    rows = [("hot",)] * 400 + [(f"tail{i}",) for i in range(200)]
    df = spark.createDataFrame(rows, "v string").repartition(6)
    true = {"hot": 400, **{f"tail{i}": 1 for i in range(200)}}

    ests, err = merge_mg_summaries(misra_gries_summaries(df, "v", capacity=10))
    err_bound = err.collect()[0]["err_bound"]
    assert err_bound > 0  # compression genuinely fired
    for r in ests.collect():
        assert r["est"] <= true[r["item"]]
        assert true[r["item"]] - r["est"] <= err_bound
    # absent items must satisfy true <= err_bound
    present = {r["item"] for r in ests.collect()}
    for item, t in true.items():
        if item not in present:
            assert t <= err_bound

    top = topk_heavy_hitters(df, "v", k=1, capacity=10).collect()
    assert top[0]["item"] == "hot"


def test_quantile_summary_exact_when_uncompressed(spark):
    """max_points >= partition rows -> step=1 everywhere: the rollup
    returns the exact order statistic at the target rank."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        quantile_summaries,
        rollup_quantile_summaries,
    )

    rows = [("g", float(v)) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame(rows, "k string, v double").repartition(4)
    summ = quantile_summaries(df, ["k"], "v", max_points=100)
    got = rollup_quantile_summaries(summ, ["k"], prob=0.5).collect()[0]
    assert got["n"] == 100 and got["target_rank"] == 50
    assert got["est_value"] == 50.0  # exact median position
    # step=1 per partition -> slack = n_partitions_with_data + 1 max
    assert got["rank_slack"] <= 5


def test_quantile_summary_rank_theorem_under_compression(spark):
    """max_points << partition rows forces compression; the certified
    band must hold: count(v <= est) in [target, target + slack]. Also
    exercises the coarser-grain merge (two fine keys -> one group)."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        quantile_summaries,
        rollup_quantile_summaries,
    )

    # deterministic, unevenly distributed values over two "days"
    rows = [("d1", float((i * 37) % 1000)) for i in range(2000)] + [
        ("d2", float((i * 91) % 500)) for i in range(1500)
    ]
    df = spark.createDataFrame(rows, "day string, v double").repartition(8)
    summ = quantile_summaries(df, ["day"], "v", max_points=8)
    # coarser grain: merge both days' summaries into one global group
    merged = summ.withColumn("all", F.lit("all"))
    for prob in (0.1, 0.5, 0.9):
        got = rollup_quantile_summaries(merged, ["all"], prob=prob).collect()[0]
        est, t, slack = got["est_value"], got["target_rank"], got["rank_slack"]
        assert got["n"] == 3500
        true_le = sum(1 for _, v in rows if v <= est)
        assert t <= true_le <= t + slack, (prob, est, t, slack, true_le)
        assert slack > 0  # compression genuinely fired


def test_quantile_rollup_slack_sums_per_summary_steps(spark):
    """Coarse-grain rollup slack regression (ADVICE r07): when one pid
    holds SEVERAL merged summaries (two fine keys rolled up to one
    grain), the certified slack must sum each summary's step — a
    max-per-(grain,pid) would undercount and the published band could
    be violated. Single partition makes the expected value exact:
    d1 n=2000 mp=8 -> step 250, d2 n=1500 -> step 188; slack =
    250 + 188 + max(250) = 688, NOT the old 250 + 250 = 500."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        quantile_summaries,
        rollup_quantile_summaries,
    )

    rows = [("d1", float((i * 37) % 1000)) for i in range(2000)] + [
        ("d2", float((i * 91) % 500)) for i in range(1500)
    ]
    df = spark.createDataFrame(rows, "day string, v double").repartition(1)
    summ = quantile_summaries(df, ["day"], "v", max_points=8)
    merged = summ.withColumn("all", F.lit("all"))
    for prob in (0.1, 0.25, 0.5, 0.75, 0.9):
        got = rollup_quantile_summaries(merged, ["all"], prob=prob).collect()[0]
        assert got["rank_slack"] == 250 + 188 + 250
        est, t, slack = got["est_value"], got["target_rank"], got["rank_slack"]
        true_le = sum(1 for _, v in rows if v <= est)
        assert t <= true_le <= t + slack, (prob, est, t, slack, true_le)


def test_quantile_rollup_cross_build_union_with_build_ids(spark):
    """Two separate builds (disjoint day batches) union into one
    summary table; distinct build_ids keep colliding (key, pid)
    summaries apart, so the band holds over the merged whole and the
    slack counts BOTH builds' summaries."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        quantile_summaries,
        rollup_quantile_summaries,
    )

    rows1 = [("g", float((i * 37) % 1000)) for i in range(2000)]
    rows2 = [("g", float((i * 91) % 500)) for i in range(1500)]
    s1 = quantile_summaries(
        spark.createDataFrame(rows1, "k string, v double").repartition(1),
        ["k"], "v", max_points=8, build_id="day1",
    )
    s2 = quantile_summaries(
        spark.createDataFrame(rows2, "k string, v double").repartition(1),
        ["k"], "v", max_points=8, build_id="day2",
    )
    merged = s1.unionByName(s2)
    got = rollup_quantile_summaries(merged, ["k"], prob=0.5).collect()[0]
    assert got["n"] == 3500
    # same (k, pid=0) in both builds: without build ids the two
    # summaries would collapse and slack would miss one step
    assert got["rank_slack"] == 250 + 188 + 250
    est, t, slack = got["est_value"], got["target_rank"], got["rank_slack"]
    true_le = sum(1 for v in [v for _, v in rows1] + [v for _, v in rows2] if v <= est)
    assert t <= true_le <= t + slack


def test_blocked_pairs_find_known_neighbors(spark):
    names = spark.createDataFrame(
        [("cold widget",), ("old widget",), ("red widget",), ("cold bolt",)],
        "name string",
    )
    pairs = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in blocked_levenshtein_pairs(names, "name").collect()
    }
    # same block (widget): cold~old dist 1, old~red dist 2, cold~red dist 3;
    # cold bolt shares no block with any widget
    assert ("cold widget", "old widget", 1) in pairs
    assert ("old widget", "red widget", 2) in pairs
    assert all("bolt" not in a and "bolt" not in b for a, b, _ in pairs)


def test_blocked_pairs_threshold_and_identity(spark):
    """min_dist=1 drops exact-equal names (canonicalization handles
    them); the threshold arg bands the DP so dist>max never surfaces."""
    names = spark.createDataFrame(
        [("abcdefgh suffix",), ("zzzzzzzz suffix",), ("abcdefgx suffix",)],
        "name string",
    )
    got = blocked_levenshtein_pairs(names, "name", max_dist=2).collect()
    assert {(r["name_a"], r["name_b"]) for r in got} == {
        ("abcdefgh suffix", "abcdefgx suffix")
    }
    assert all(1 <= r["dist"] <= 2 for r in got)


def test_last_token_block_expression(spark):
    df = spark.createDataFrame([("a b c",), ("solo",)], "s string")
    got = [r[0] for r in df.select(last_token_block("s")).collect()]
    assert got == ["c", "solo"]


def test_levenshtein_stays_codegen(spark):
    """The verify stage must be a JVM expression, not a Python UDF."""
    names = spark.createDataFrame([("cold widget",), ("old widget",)], "n string")
    plan = (
        blocked_levenshtein_pairs(names, "n")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "levenshtein" in plan and "BatchEvalPython" not in plan


def test_kmv_sketch_exact_below_k_and_estimator_above(spark):
    """Below k the sketch IS the distinct set (estimate exact); above k
    the (k-1)/m_k estimator lands within a few sigma of truth."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketches,
    )

    rows = [("small", v) for v in range(10)] + [
        ("big", v) for v in range(5000)
    ] * 2  # duplicates must not occupy sketch slots
    df = spark.createDataFrame(rows, "g string, v long")
    k = 64
    sk = kmv_sketches(df, ["g"], "v", k=k)
    out = {
        r.g: (r.n, r.est)
        for r in sk.select(
            "g",
            F.size("kmv").alias("n"),
            kmv_estimate(F.col("kmv"), k).alias("est"),
        ).collect()
    }
    assert out["small"] == (10, 10.0)  # exact branch
    n_big, est_big = out["big"]
    assert n_big == k
    # rsd ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
    assert abs(est_big - 5000) / 5000 < 0.51


def test_kmv_union_and_jaccard_recover_known_overlap(spark):
    """Two groups with a known 50% overlap: the union sketch equals the
    sketch of the union, and Jaccard/intersection estimates are close
    to truth."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        kmv_estimate,
        kmv_jaccard,
        kmv_sketches,
        kmv_union,
    )

    # A = 0..2999, B = 1500..4499 -> |A|=|B|=3000, inter=1500, union=4500
    rows = [("a", v) for v in range(3000)] + [
        ("b", v) for v in range(1500, 4500)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    k = 256
    sk = kmv_sketches(df, ["g"], "v", k=k)
    a = sk.filter("g = 'a'").select(F.col("kmv").alias("ka"))
    b = sk.filter("g = 'b'").select(F.col("kmv").alias("kb"))
    pair = a.crossJoin(b)
    ul = kmv_union(F.col("ka"), F.col("kb"), k)
    row = pair.select(
        kmv_estimate(ul, k).alias("est_union"),
        kmv_jaccard(F.col("ka"), F.col("kb"), k).alias("jacc"),
    ).collect()[0]
    assert abs(row.est_union - 4500) / 4500 < 0.25
    assert abs(row.jacc - 1500 / 4500) < 0.12
    # union sketch == sketch built over the union directly (mergeability)
    direct = kmv_sketches(
        df.select(F.lit("u").alias("g"), "v"), ["g"], "v", k=k
    ).collect()[0]["kmv"]
    merged = pair.select(ul.alias("u")).collect()[0]["u"]
    assert merged == direct


def test_golden_records_survivorship_rules(spark):
    """Hand-computed consolidation: cluster {acme corp (3 rows),
    acme co (1)} -> canonical = most-attested 'acme corp', brand mode
    with lexicographic tie-break, max/min extremes."""
    from evidence_images_etl_airflow_spark.operators.er import golden_records

    comp = spark.createDataFrame(
        [("acme corp", "acme co"), ("acme co", "acme co")],
        "node string, component string",
    )
    rows = spark.createDataFrame(
        [
            ("acme corp", "B1", 10.0, 5),
            ("acme corp", "B2", 30.0, 3),
            ("acme corp", "B2", 20.0, 9),
            ("acme co", "B1", 40.0, 7),
            ("unmatched", "B9", 99.0, 1),  # not in comp -> dropped
        ],
        "name string, brand string, price double, size int",
    )
    out = golden_records(
        rows, comp, "name",
        mode_cols=("brand",), max_cols=("price",), min_cols=("size",),
    ).collect()
    assert len(out) == 1
    g = out[0]
    assert g.component == "acme co"
    assert (g.canonical_name, g.canonical_name_rows) == ("acme corp", 3)
    assert (g.n_members, g.n_rows_total) == (2, 4)
    # brand: B1 x2 vs B2 x2 -> tie breaks to lexicographically smaller
    assert (g.top_brand, g.top_brand_rows) == ("B1", 2)
    assert (g.max_price, g.min_size) == (40.0, 3)


def test_countmin_merge_is_exact_and_estimates_overcount(spark):
    """CM linearity: per-batch sketches merged cell-wise are
    BIT-IDENTICAL to the single-pass sketch, and every point estimate
    >= the true count (the CM overestimate theorem)."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        countmin_lookup,
        countmin_table,
        merge_countmin_tables,
    )

    rows = [(i, f"v{i % 7}") for i in range(300)]
    df = spark.createDataFrame(rows, "i long, v string")
    whole = countmin_table(df, "v", depth=3, width=16, salt="t")
    merged = merge_countmin_tables(
        countmin_table(df.filter("i % 2 = 0"), "v", depth=3, width=16, salt="t"),
        countmin_table(df.filter("i % 2 = 1"), "v", depth=3, width=16, salt="t"),
    )
    as_set = lambda t: {(r.r, r.bucket, r.cnt) for r in t.collect()}  # noqa: E731
    assert as_set(whole) == as_set(merged)

    items = df.select("v").distinct()
    est = {
        r.v: r.est
        for r in countmin_lookup(whole, items, "v", depth=3, width=16, salt="t").collect()
    }
    true = {r.v: r.n for r in df.groupBy("v").agg(F.count("*").alias("n")).collect()}
    assert set(est) == set(true)
    assert all(est[v] >= true[v] for v in true)
    # width=16 >> 7 distinct values: with no cross-value collision in
    # some row, the min recovers the exact count for at least one value
    assert any(est[v] == true[v] for v in true)


def test_countmin_absent_item_estimates_zero_without_collision(spark):
    """An item never inserted whose buckets are all empty estimates 0 —
    the left-join + coalesce path, not a dropped row."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        countmin_lookup,
        countmin_table,
    )

    df = spark.createDataFrame([("only",)], "v string")
    tbl = countmin_table(df, "v", depth=4, width=4096, salt="z")
    probe = spark.createDataFrame([("never-seen-item",)], "v string")
    out = countmin_lookup(tbl, probe, "v", depth=4, width=4096, salt="z").collect()
    assert len(out) == 1 and out[0].est == 0


def test_countmin_merge_rejects_mixed_shapes(spark):
    """Merging sketches built on different grids silently misaligns
    cells; the declared-shape guard must fail fast instead."""
    import pytest as _pytest

    from evidence_images_etl_airflow_spark.operators.sketches import (
        countmin_table,
        merge_countmin_tables,
    )

    df = spark.createDataFrame([(f"v{i}",) for i in range(50)], "v string")
    big = countmin_table(df, "v", depth=4, width=512, salt="g")
    small = countmin_table(df, "v", depth=2, width=8, salt="g")
    with _pytest.raises(ValueError, match="mixed-shape"):
        merge_countmin_tables(big, small, depth=2, width=8)
    # matching shapes with the guard on still merge fine
    ok = merge_countmin_tables(small, small, depth=2, width=8)
    assert ok.count() <= 2 * 8


def test_sample_mean_ci_full_fraction_hand_case(spark):
    """r12: fraction=1.0 keeps every row, so the estimate IS the mean
    and the CLT interval is computable by hand: values 1/2/3 dollars
    -> mean 2.0, s=1.0, se=1/sqrt(3), ci = 2 -/+ 1.96*0.57735."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        sample_mean_ci,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "id long, v double"
    )
    r = sample_mean_ci(df, "id", "v", fraction=1.0).first()
    assert (r.n_sample, r.est_mean, r.se) == (3, 2.0, 0.57735)
    assert (r.ci_lo, r.ci_hi) == (0.868393, 3.131607)


def test_sample_mean_ci_deterministic_and_proportional(spark):
    from evidence_images_etl_airflow_spark.operators.sketches import (
        sample_mean_ci,
    )

    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("v")
    )
    a = sample_mean_ci(df, "id", "v", fraction=0.2).first()
    b = sample_mean_ci(df.repartition(13), "id", "v", fraction=0.2).first()
    assert a == b  # partitioning-independent, rerun-stable
    assert 800 <= a.n_sample <= 1200  # ~20% of 5000
    assert a.ci_lo < 49.5 < a.ci_hi  # true mean inside the 95% band
    import pytest as _pt

    with _pt.raises(ValueError, match="fraction"):
        sample_mean_ci(df, "id", "v", fraction=0.0)


def test_stratified_mean_ci_full_fraction_hand_case(spark):
    """fraction=1.0 makes the estimate the exact mean; SE from the
    textbook per-stratum pooling."""
    import math

    from evidence_images_etl_airflow_spark.operators.sketches import (
        stratified_mean_ci,
    )

    rows = [
        (1, "A", 0.10), (2, "A", 0.20),
        (3, "B", 1.00), (4, "B", 2.00),
    ]
    df = spark.createDataFrame(rows, "id long, h string, v double")
    r = stratified_mean_ci(
        df, "h", F.col("id"), "v", fraction=1.0, salt="t"
    ).collect()[0]
    assert (r["n_strata"], r["n_sample"]) == (2, 4)
    # exact mean of cents {10, 20, 100, 200} = 82.5c = 0.825
    assert r["est_mean"] == 0.825
    # wv = 2^2*(50/2) + 2^2*(5000/2) = 10100; se = sqrt(10100/16)/100
    se = math.sqrt(10100 / 16) / 100
    assert r["se"] == round(se, 6)
    assert r["ci_lo"] == round(0.825 - 1.96 * se, 6)
    assert r["ci_hi"] == round(0.825 + 1.96 * se, 6)


def test_stratified_mean_ci_degenerate_stratum_nulls_estimate(spark):
    """A stratum whose sample has n<2 cannot bound its variance: the
    report NULLs rather than silently dropping the stratum."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        stratified_mean_ci,
    )

    rows = [(1, "A", 0.10), (2, "A", 0.20), (3, "B", 1.00)]
    df = spark.createDataFrame(rows, "id long, h string, v double")
    r = stratified_mean_ci(
        df, "h", F.col("id"), "v", fraction=1.0, salt="t"
    ).collect()[0]
    assert r["n_strata"] == 2 and r["n_sample"] == 3
    assert r["est_mean"] is None and r["se"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError):
        stratified_mean_ci(df, "h", F.col("id"), "v", fraction=0.0)


def test_poisson_bootstrap_weights_and_interval(spark):
    from evidence_images_etl_airflow_spark.operators.sketches import (
        POISSON1_CDF_1E6,
        poisson_bootstrap_mean_ci,
    )

    # CDF thresholds are strictly increasing and bounded by 1e6
    assert list(POISSON1_CDF_1E6) == sorted(POISSON1_CDF_1E6)
    assert POISSON1_CDF_1E6[-1] < 1_000_000

    rows = [(i, 100.0 + (i % 7)) for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, price double")
    r = poisson_bootstrap_mean_ci(
        df, "id", "price", replicates=40
    ).collect()[0]
    assert r["n_total"] == 400 and r["n_replicates"] == 40
    assert r["boot_lo"] <= r["boot_hi"]
    # tight, near-symmetric data: the interval must bracket the exact
    # mean (deterministic: weights are a pure function of (id, b))
    assert r["covered"] is True
    assert abs(r["exact_mean"] - (r["boot_lo"] + r["boot_hi"]) / 2) < 1.0

    # determinism: same inputs -> identical interval
    r2 = poisson_bootstrap_mean_ci(
        df, "id", "price", replicates=40
    ).collect()[0]
    assert (r2["boot_lo"], r2["boot_hi"]) == (r["boot_lo"], r["boot_hi"])


def test_poisson_bootstrap_validates_replicates(spark):
    from evidence_images_etl_airflow_spark.operators.sketches import (
        poisson_bootstrap_mean_ci,
    )

    df = spark.createDataFrame([(1, 1.0)], "id bigint, price double")
    with pytest.raises(ValueError):
        poisson_bootstrap_mean_ci(df, "id", "price", replicates=1)
