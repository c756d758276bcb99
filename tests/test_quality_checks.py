"""Data-contract constraint engine (operators/quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from evidence_images_etl_airflow_spark.operators.quality import (
    check_fk,
    check_in_set,
    check_not_null,
    check_range,
    check_regex,
    check_unique,
    run_checks,
)


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame(
        [
            Row(id=1, status="ok", score=5.0, email="a@b.com"),
            Row(id=1, status="ok", score=50.0, email="nope"),  # dup id, high score
            Row(id=2, status="bad", score=-1.0, email=None),  # bad status, low score
            Row(id=3, status=None, score=None, email="c@d.io"),  # nulls
        ]
    )


def test_all_constraint_kinds_count_violations(spark, dirty):
    dim = spark.createDataFrame([Row(k=1), Row(k=2)])
    report = {
        r.check_name: (r.violations, r.n_rows)
        for r in run_checks(
            dirty,
            [
                check_not_null("status"),
                check_in_set("status", ["ok"]),
                check_range("score", 0, 10),
                check_regex("email", r"^[^@]+@[^@]+$"),
                check_unique(["id"]),
                check_fk("id", dim, "k"),
            ],
        ).collect()
    }
    assert report["not_null(status)"] == (1, 4)
    assert report["in_set(status)"] == (2, 4)  # 'bad' + NULL
    assert report["range(score)"] == (3, 4)  # 50, -1, NULL
    assert report["regex(email)"] == (2, 4)  # 'nope' + NULL
    assert report["unique(id)"] == (2, 4)  # both id=1 rows count
    assert report["fk(id)"] == (1, 4)  # id=3 has no dim row


def test_clean_data_reports_zero(spark):
    df = spark.createDataFrame([Row(id=1, v=1.0), Row(id=2, v=2.0)])
    report = run_checks(
        df, [check_not_null("v"), check_range("v", 0, 10), check_unique(["id"])]
    ).collect()
    assert all(r.violations == 0 for r in report)
    assert all(r.n_rows == 2 for r in report)


def test_psi_zero_for_identical_and_hand_computed_drift(spark):
    """PSI is 0 when slices share a distribution; a hand-computed
    category shift reproduces the textbook formula, and a category
    absent from one slice exercises the eps clamp."""
    import math

    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.operators.drift import (
        psi_categorical,
    )

    same = spark.createDataFrame(
        [("ref", "a")] * 6 + [("ref", "b")] * 4
        + [("cur", "a")] * 3 + [("cur", "b")] * 2,
        "__period string, v string",
    )
    psi0 = psi_categorical(same, "v").select("psi").distinct().collect()
    assert [r.psi for r in psi0] == [0.0]

    # ref: a .8 / b .2 ; cur: a .5 / c .5 (b vanishes, c appears)
    drift = spark.createDataFrame(
        [("ref", "a")] * 8 + [("ref", "b")] * 2
        + [("cur", "a")] * 5 + [("cur", "c")] * 5,
        "__period string, v string",
    )
    rows = {r.bin: r for r in psi_categorical(drift, "v").collect()}
    eps = 1e-6
    expected = {
        "a": (0.8 - 0.5) * math.log(0.8 / 0.5),
        "b": (0.2 - eps) * math.log(0.2 / eps),
        "c": (eps - 0.5) * math.log(eps / 0.5),
    }
    for b, e in expected.items():
        assert abs(rows[b].psi_term - round(e, 6)) < 1e-9, b
    total = round(sum(expected.values()), 6)
    assert abs(rows["a"].psi - total) < 1e-9


def test_psi_from_counts_matches_tagged_path(spark):
    """The pre-aggregated entry point (what streaming/incremental
    maintainers feed) produces the identical report to the row-tagged
    path over the same data."""
    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.operators.drift import (
        psi_categorical,
        psi_from_counts,
    )

    tagged = spark.createDataFrame(
        [("ref", "a")] * 8 + [("ref", "b")] * 2
        + [("cur", "a")] * 5 + [("cur", "c")] * 5,
        "__period string, v string",
    )
    via_rows = {
        r.bin: r for r in psi_categorical(tagged, "v").collect()
    }
    rc = (
        tagged.filter("__period = 'ref'")
        .groupBy(F.col("v").alias("bin"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    cc = (
        tagged.filter("__period = 'cur'")
        .groupBy(F.col("v").alias("bin"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    via_counts = {r.bin: r for r in psi_from_counts(rc, cc, "v").collect()}
    assert set(via_rows) == set(via_counts)
    for b in via_rows:
        assert via_rows[b].psi_term == via_counts[b].psi_term
        assert via_rows[b].psi == via_counts[b].psi


def test_psi_from_counts_null_bin_and_empty_report_guard(spark):
    """A NULL bin in both slices collapses to one row (null-safe join),
    matching the tagged path; psi_report with no columns raises."""
    import pytest
    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.operators.drift import (
        psi_categorical,
        psi_from_counts,
        psi_report,
    )

    tagged = spark.createDataFrame(
        [("ref", None), ("ref", "a"), ("cur", None), ("cur", "a")],
        "__period string, v string",
    )
    via_rows = {r.bin: r for r in psi_categorical(tagged, "v").collect()}
    rc = (
        tagged.filter("__period = 'ref'")
        .groupBy(F.col("v").alias("bin"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    cc = (
        tagged.filter("__period = 'cur'")
        .groupBy(F.col("v").alias("bin"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    via_counts = {r.bin: r for r in psi_from_counts(rc, cc, "v").collect()}
    assert len(via_counts) == 2  # (None, 'a') — no split half-rows
    for b in via_rows:
        assert via_rows[b].psi_term == via_counts[b].psi_term

    with pytest.raises(ValueError, match="at least one"):
        psi_report(tagged, F.lit("ref"))


def test_pareto_frontier_hand_computed(spark):
    """Skyline semantics on a crafted grid: dominated points drop,
    incomparable points survive, coincident points collapse."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    pts_rows = [
        (1, 10.0, 5), (2, 10.0, 5),   # coincident frontier point
        (3, 10.0, 7),                  # same price, bigger size -> out
        (4, 20.0, 3),                  # pricier but smaller -> frontier
        (5, 30.0, 3),                  # ties best size at higher price -> out
        (6, 25.0, 1),                  # frontier
        (7, 5.0, 9),                   # cheapest -> frontier
    ]
    df = spark.createDataFrame(pts_rows, "id long, price double, size int")
    pts = df.groupBy("price", "size").agg(
        F.count("*").cast("bigint").alias("n"), F.min("id").alias("mid")
    )
    w = Window.orderBy("price", "size").rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = {
        (r.price, r.size): (r.n, r.mid)
        for r in pts.withColumn("best", F.min("size").over(w))
        .filter(F.col("best").isNull() | (F.col("size") < F.col("best")))
        .collect()
    }
    assert out == {
        (5.0, 9): (1, 7),
        (10.0, 5): (2, 1),
        (20.0, 3): (1, 4),
        (25.0, 1): (1, 6),
    }


def test_mad_resists_the_outlier_that_moves_the_mean(spark):
    """The reason MAD exists: one huge spike leaves median/MAD (and so
    every other day's robust score) untouched, while the mean/stddev
    scores of ordinary days shift with the spike's presence."""
    from pyspark.sql import functions as F

    base = [float(v) for v in (10, 11, 9, 10, 12, 10, 11, 9)]
    with_spike = base + [1000.0]
    def robust(vals):
        df = spark.createDataFrame([(v,) for v in vals], "n double")
        med = df.agg(F.round(F.percentile("n", F.lit(0.5)), 6).alias("m")).collect()[0].m
        mad = (
            df.select(F.round(F.abs(F.col("n") - F.lit(med)), 6).alias("a"))
            .agg(F.round(F.percentile("a", F.lit(0.5)), 6).alias("mad"))
            .collect()[0]
            .mad
        )
        return med, mad

    m0, d0 = robust(base)
    m1, d1 = robust(with_spike)
    assert m0 == 10.0 and m1 == 10.0  # median doesn't move at all
    assert abs(d1 - d0) <= 0.5        # MAD stays put
    # the spike itself is a screaming outlier on the robust scale
    assert abs(1000.0 - m1) / (1.4826 * d1) > 100
    # while the classical mean shifts by ~110 with one point
    import statistics
    assert statistics.mean(with_spike) - statistics.mean(base) > 100


def test_schema_evolution_widening(spark):
    """r10: Iceberg-matrix safe widening — int family up, float->double,
    decimal precision growth at fixed scale; lossy promotions refused."""
    import pytest as _pt
    from pyspark.sql import types as T

    from evidence_images_etl_airflow_spark import schemas as S

    a = T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("v", T.FloatType(), True),
        T.StructField("d", T.DecimalType(10, 2), True),
        T.StructField("only_a", T.StringType(), True),
    ])
    b = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
        T.StructField("d", T.DecimalType(14, 2), True),
        T.StructField("only_b", T.StringType(), True),
    ])
    m = S.merge_schemas(a, b)
    got = {f.name: f.dataType.simpleString() for f in m.fields}
    assert got == {"id": "bigint", "v": "double", "d": "decimal(14,2)",
                   "only_a": "string", "only_b": "string"}
    # long -> double is lossy above 2^53: refused
    with _pt.raises(ValueError, match="no safe widening"):
        S.merge_schemas(
            T.StructType([T.StructField("x", T.LongType())]),
            T.StructType([T.StructField("x", T.DoubleType())]),
        )
    # decimal scale change: refused
    with _pt.raises(ValueError, match="no safe widening"):
        S.merge_schemas(
            T.StructType([T.StructField("x", T.DecimalType(10, 2))]),
            T.StructType([T.StructField("x", T.DecimalType(10, 3))]),
        )


def test_union_evolved_reads_vintages_as_one_table(spark):
    """Two schema vintages (int id + float v) vs (long id + new col)
    scan as one evolved table; unplanned columns are rejected."""
    import pytest as _pt
    from pyspark.sql import types as T

    from evidence_images_etl_airflow_spark import schemas as S

    v1 = spark.createDataFrame([(1, 1.5)], "id int, v float")
    v2 = spark.createDataFrame([(2**40, "x")], "id long, tag string")
    u = S.union_evolved([v1, v2])
    assert [f.simpleString() for f in u.schema.fields] == [
        "id:bigint", "v:float", "tag:string"
    ]
    rows = {r.id: (r.v, r.tag) for r in u.collect()}
    assert rows[1] == (1.5, None)
    assert rows[2**40] == (None, "x")

    with _pt.raises(ValueError, match="unplanned columns"):
        S.evolve_to(v2, T.StructType([T.StructField("id", T.LongType())]))


@pytest.fixture()
def qi_table(spark):
    rows = (
        [Row(a="x", b=1, sal=12_000)] * 6
        + [Row(a="x", b=2, sal=27_000)] * 3
        + [Row(a="y", b=1, sal=91_000)]
    )
    return spark.createDataFrame(rows)


def test_k_anonymity_report_hand_case(spark, qi_table):
    from evidence_images_etl_airflow_spark.operators.quality import (
        k_anonymity_report,
    )

    r = k_anonymity_report(qi_table, ["a", "b"], k=5).first()
    assert (r.k, r.n_rows, r.n_classes) == (5, 10, 3)
    assert (r.rows_below_k, r.classes_below_k) == (4, 2)
    assert (r.min_class_size, r.max_class_size) == (1, 6)
    assert r.at_risk_share == 0.4


def test_k_anonymity_generalization_expression(spark, qi_table):
    """A Column expression (salary generalized to 10k buckets) is a
    valid quasi-identifier — the generalized grain merges the two 'x'
    classes' salaries into distinct buckets so classes stay as-is,
    while a coarse 100k bucket merges nothing across (a, b)."""
    import pyspark.sql.functions as F

    from evidence_images_etl_airflow_spark.operators.quality import (
        k_anonymity_report,
    )

    r = k_anonymity_report(
        qi_table, [F.floor(F.col("sal") / 10_000).alias("sal_b")], k=5
    ).first()
    # buckets 1 (x6), 2 (x3), 9 (x1) -> same class structure as (a, b)
    assert (r.n_classes, r.rows_below_k, r.classes_below_k) == (3, 4, 2)


def test_k_anonymity_violations_smallest_first(spark, qi_table):
    from evidence_images_etl_airflow_spark.operators.quality import (
        k_anonymity_violations,
    )

    out = k_anonymity_violations(qi_table, ["a", "b"], k=5).collect()
    assert [(r.a, r.b, r.class_size) for r in out] == [
        ("y", 1, 1), ("x", 2, 3)
    ]
    capped = k_anonymity_violations(qi_table, ["a", "b"], k=5, top_n=1)
    assert capped.count() == 1


def test_k_anonymity_validation(spark, qi_table):
    from evidence_images_etl_airflow_spark.operators.quality import (
        k_anonymity_report,
    )

    with pytest.raises(ValueError, match="k must be >= 2"):
        k_anonymity_report(qi_table, ["a"], k=1)
    with pytest.raises(ValueError, match="at least one"):
        k_anonymity_report(qi_table, [], k=5)


def test_gini_concentration_hand_case(spark):
    from evidence_images_etl_airflow_spark.operators.quality import (
        gini_concentration,
    )

    # values 10, 20, 20, 50: sum(i*x) = 310, Gini = 620/400 - 5/4 = 0.3;
    # top 50% = best 2 rows = 70 -> share 0.7
    df = spark.createDataFrame([(10,), (20,), (20,), (50,)], "v long")
    r = gini_concentration(df, "v", top_fraction=0.5).collect()[0]
    assert r["n"] == 4 and r["value_total"] == 100.0
    assert r["gini"] == 0.3
    assert r["top_share"] == 0.7


def test_gini_concentration_equal_values_is_zero(spark):
    from evidence_images_etl_airflow_spark.operators.quality import (
        gini_concentration,
    )

    df = spark.createDataFrame([(7,)] * 10, "v long")
    r = gini_concentration(df, "v", top_fraction=0.1).collect()[0]
    assert r["gini"] == 0.0
    # top 10% of an equal distribution holds exactly 10% of the value
    assert r["top_share"] == 0.1

    import pytest as _pytest

    with _pytest.raises(ValueError):
        gini_concentration(df, "v", top_fraction=1.5)


def test_dq_referential_orphans_detects_and_counts(spark, tmp_path):
    """r12: orphan rows counted per FK edge in one join+agg pass."""
    from evidence_images_etl_airflow_spark.workload import REGISTRY

    cust = spark.createDataFrame(
        [(1, "a"), (2, "b")], "c_custkey long, c_name string"
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99)],  # 99 is an orphan
        "o_orderkey long, o_custkey long",
    )
    li = spark.createDataFrame(
        [(10, 100, 200), (11, 101, 201), (13, 100, 200)],  # 13 orphan order
        "l_orderkey long, l_partkey long, l_suppkey long",
    )
    part = spark.createDataFrame(
        [(100,), (101,)], "p_partkey long"
    )
    supp = spark.createDataFrame(
        [(200,), (201,)], "s_suppkey long"
    )
    d = f"{tmp_path}/sf"
    cust.write.parquet(f"{d}/customer.parquet")
    orders.write.parquet(f"{d}/orders.parquet")
    li.write.parquet(f"{d}/lineitem.parquet")
    part.write.parquet(f"{d}/part.parquet")
    supp.write.parquet(f"{d}/supplier.parquet")
    out = {
        r.fk: r for r in REGISTRY["dq_referential_orphans"].fn(spark, d).collect()
    }
    assert len(out) == 4
    oc = out["orders.o_custkey->customer.c_custkey"]
    assert (oc.n_rows, oc.n_orphans, oc.intact) == (3, 1, False)
    assert oc.orphan_rate == round(1 / 3, 6)
    lo = out["lineitem.l_orderkey->orders.o_orderkey"]
    assert (lo.n_rows, lo.n_orphans) == (3, 1)
    assert out["lineitem.l_partkey->part.p_partkey"].intact is True
    assert out["lineitem.l_suppkey->supplier.s_suppkey"].intact is True


def test_abc_classification_hand_case(spark):
    from evidence_images_etl_airflow_spark.operators.quality import (
        abc_classification,
    )

    # values desc: 50, 30, 10, 10. T=100; A-boundary 70, B 90.
    # 50 starts at 0 -> A; 30 starts at 50 -> A (cum_start < 70);
    # first 10 starts at 80 -> B; second 10 starts at 90 -> C
    # (cum_start 90 is NOT < 90).
    df = spark.createDataFrame(
        [(50,), (30,), (10,), (10,)], "v bigint"
    )
    out = {r["cls"]: r for r in abc_classification(df, "v").collect()}
    assert out["A"]["n_items"] == 2 and out["A"]["value_sum"] == 80.0
    assert out["B"]["n_items"] == 1 and out["B"]["value_sum"] == 10.0
    assert out["C"]["n_items"] == 1 and out["C"]["value_sum"] == 10.0
    assert out["A"]["value_share"] == 0.8


def test_abc_classification_splits_tied_blocks_and_zeroes(spark):
    from evidence_images_etl_airflow_spark.operators.quality import (
        abc_classification,
    )

    # ten tied rows of 10 (T=100): boundary at 70 falls INSIDE the
    # block -> exactly 7 rows are A (starts 0..60 < 70), 2 are B
    # (starts 70, 80 < 90), 1 is C; zero-value rows always C.
    df = spark.createDataFrame([(10,)] * 10 + [(0,)] * 3, "v bigint")
    out = {r["cls"]: r for r in abc_classification(df, "v").collect()}
    assert out["A"]["n_items"] == 7 and out["A"]["value_share"] == 0.7
    assert out["B"]["n_items"] == 2
    assert out["C"]["n_items"] == 4 and out["C"]["value_sum"] == 10.0


def test_abc_classification_validates_fractions(spark):
    from evidence_images_etl_airflow_spark.operators.quality import (
        abc_classification,
    )

    df = spark.createDataFrame([(1,)], "v bigint")
    with pytest.raises(ValueError):
        abc_classification(df, "v", a_fraction=0.9, b_fraction=0.7)


def test_gini_and_abc_exclude_null_values(spark):
    """r13 latent-defect pass: a NULL value has no rank — the NULL
    block would otherwise sort FIRST in Spark but LAST in DuckDB,
    shifting every prefix in the concentration math."""
    from pyspark.sql import functions as F  # noqa: F401
    from evidence_images_etl_airflow_spark.operators.quality import (
        abc_classification,
        gini_concentration,
    )

    clean = [(100,), (200,), (300,), (400,)]
    dirty = clean + [(None,)]
    cdf = spark.createDataFrame(clean, "v bigint")
    ddf = spark.createDataFrame(dirty, "v bigint")
    assert (
        gini_concentration(cdf, "v").collect()
        == gini_concentration(ddf, "v").collect()
    )
    assert (
        abc_classification(cdf, "v").collect()
        == abc_classification(ddf, "v").collect()
    )
