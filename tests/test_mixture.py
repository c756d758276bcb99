"""Token-budget waterfilling mixture planner."""

from __future__ import annotations

from evidence_images_etl_airflow_spark.operators.mixture import (
    token_budget_allocation,
)


def _plan(spark, rows, budget, max_epochs=2.0):
    df = spark.createDataFrame(
        [(k, a, w, budget) for k, a, w in rows],
        "src string, avail long, w double, budget long",
    )
    return {
        r.stratum: r
        for r in token_budget_allocation(
            df, "src", "avail", "w", "budget", max_epochs=max_epochs
        ).collect()
    }


def test_waterfill_hand_computed_with_cap(spark):
    """Uniform weights, B=3000, caps 200/2000/20000: the smallest
    stratum caps at 2 epochs, the rest split the remainder at the
    water level lambda=1400."""
    got = _plan(
        spark, [("a", 100, 1.0), ("b", 1000, 1.0), ("c", 10000, 1.0)], 3000
    )
    assert (got["a"].allocated_tokens, got["a"].capped) == (200, True)
    assert (got["b"].allocated_tokens, got["b"].capped) == (1400, False)
    assert (got["c"].allocated_tokens, got["c"].capped) == (1400, False)
    assert got["a"].epochs == 2.0
    assert got["b"].epochs == 1.4
    assert got["c"].epochs == 0.14


def test_waterfill_no_caps_is_proportional(spark):
    """Budget small enough that nothing caps: allocations are
    proportional to the weights (floor'd)."""
    got = _plan(
        spark, [("a", 10000, 1.0), ("b", 10000, 3.0)], 4000
    )
    assert not got["a"].capped and not got["b"].capped
    assert got["a"].allocated_tokens == 1000
    assert got["b"].allocated_tokens == 3000


def test_waterfill_cascading_caps(spark):
    """Two strata cap in ratio order before the level settles: caps
    40/60/100000 with uniform weights and B=1100 -> a and b cap,
    c takes the 1000 remainder."""
    got = _plan(
        spark,
        [("a", 20, 1.0), ("b", 30, 1.0), ("c", 50000, 1.0)],
        1100,
    )
    assert got["a"].allocated_tokens == 40 and got["a"].capped
    assert got["b"].allocated_tokens == 60 and got["b"].capped
    assert got["c"].allocated_tokens == 1000 and not got["c"].capped
    total = sum(r.allocated_tokens for r in got.values())
    assert total == 1100


def test_waterfill_infeasible_budget_clamps_to_caps(spark):
    """VERDICT r08 item 4 / ADVICE: budget >= sum(cap) used to return
    an EMPTY allocation table silently. It now clamps: every stratum
    takes its full cap, exactly one solver row feeds the crossJoin."""
    # budget far beyond the 2-epoch supply (caps 200 + 2000 = 2200)
    got = _plan(spark, [("a", 100, 1.0), ("b", 1000, 1.0)], 1_000_000)
    assert set(got) == {"a", "b"}, "clamped plan must cover every stratum"
    assert (got["a"].allocated_tokens, got["a"].capped) == (200, True)
    assert (got["b"].allocated_tokens, got["b"].capped) == (2000, True)
    assert got["a"].epochs == 2.0 and got["b"].epochs == 2.0


def test_waterfill_budget_exactly_total_caps(spark):
    """The boundary budget == sum(cap): the clamp fires, allocations
    sum exactly to the budget, and no stratum row is duplicated by a
    feasible/clamp tie (the pri ordering guards that)."""
    got = _plan(spark, [("a", 100, 1.0), ("b", 1000, 2.0)], 2200)
    assert len(got) == 2
    total = sum(r.allocated_tokens for r in got.values())
    assert total == 2200
    assert all(r.capped for r in got.values())


def test_select_token_budget_strict_prefix(spark):
    """r10: the executor takes the md5-ordered prefix within quota; a
    doc that would cross the budget is dropped (never-overshoot), and
    selection is deterministic across runs."""
    from evidence_images_etl_airflow_spark.operators.mixture import (
        select_token_budget,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("a", i, 40) for i in range(10)] + [("b", 100, 500)],
        "source string, doc_id long, n_tokens long",
    )
    alloc = spark.createDataFrame(
        [("a", 100), ("b", 100)], "source string, allocated_tokens long"
    )
    sel = select_token_budget(docs, alloc)
    rows = sel.collect()
    a = [r for r in rows if r.source == "a"]
    # 100-token quota over 40-token docs -> exactly 2 selected (80 <= 100,
    # a third would reach 120)
    assert len(a) == 2 and max(r.cum_tokens for r in a) == 80
    # source b's only doc (500 tokens) overshoots -> nothing selected
    assert not [r for r in rows if r.source == "b"]
    # deterministic: same selection on a rerun
    again = {(r.source, r.doc_id) for r in select_token_budget(docs, alloc).collect()}
    assert again == {(r.source, r.doc_id) for r in rows}
    # never exceeds quota
    j = sel.groupBy("source").agg(F.max("cum_tokens").alias("m")).collect()
    assert all(r.m <= 100 for r in j)


def test_waterfill_plan_feeds_budget_selection(spark):
    """r10: the composition the executor exists for — the waterfill
    plan's allocated_tokens drive the per-source selection, and no
    source ever exceeds its planned allocation."""
    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.operators.mixture import (
        select_token_budget,
        token_budget_allocation,
    )

    docs = spark.createDataFrame(
        [("a", i, 50) for i in range(20)]  # 1000 avail
        + [("b", 100 + i, 50) for i in range(4)],  # 200 avail
        "source string, doc_id long, n_tokens long",
    )
    stats = docs.groupBy("source").agg(
        F.sum("n_tokens").alias("avail"), F.lit(1.0).alias("w")
    ).withColumn("budget", F.lit(600).cast("bigint"))
    plan = token_budget_allocation(
        stats, key_col="source", avail_col="avail",
        weight_col="w", max_epochs=1.0,
    )
    alloc = plan.select(
        F.col("stratum").alias("source"), "allocated_tokens"
    )
    sel = select_token_budget(docs, alloc)
    got = {
        r.source: r.m
        for r in sel.groupBy("source")
        .agg(F.max("cum_tokens").alias("m"))
        .collect()
    }
    limits = {r.source: r.allocated_tokens for r in alloc.collect()}
    assert set(got) <= set(limits)
    for s, used in got.items():
        assert used <= limits[s]
    # equal weights, epoch cap 1: b is capped at 200, a gets the rest
    assert limits["b"] <= 200 and sum(limits.values()) <= 600
