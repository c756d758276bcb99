"""Interleaved A/B harness for the r16 optimization round.

The r16 session's host is violently bursty (one sweep read 451 s
against a 38 s anchor while the serial cal sat IN band), so absolute
sweeps are unreadable; every optimization decision in this round is
taken from THIS harness instead: both variants live in one JVM and the
legs alternate A,B,A,B,... so both sample the same noise; the per-leg
MEDIAN is reported (min is also printed for reference).

Modes (pass one or more):
  pagerank   — per-iteration no-op left-join removal (complete_indegree)
  triangle   — co-purchase edge build: distinct+self-join vs
               groupBy+collect_set+in-task pair expansion
  autoplan   — join_autoplan_strategy: current tree (threaded planner
               pre-flights) vs an inline sequential replica
  ep5        — ep5_mart_chain_planned current tree vs sequential
               pre-flight replica

Usage: PYTHONPATH=. python tools/ab_r16.py MODE[,MODE...] [reps] [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from evidence_images_etl_airflow_spark import caching  # noqa: E402
from evidence_images_etl_airflow_spark import workload as W  # noqa: E402
from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402


def _timed(spark, fn, reps):
    out = []
    for _ in range(reps):
        caching.release_all(spark, hard=True)
        t0 = time.perf_counter()
        fn().count()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def _report(name, legs):
    for lbl, ts in legs.items():
        print(
            f"{name:18s} {lbl:12s} med={statistics.median(ts):7.3f} "
            f"min={min(ts):7.3f}  {ts}"
        )


def ab_pagerank(spark, sf_dir, reps):
    from evidence_images_etl_airflow_spark.operators.graph import pagerank

    def build(complete):
        li = W._t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
        o = W._t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
        pairs = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("c"),
                (F.col("l_suppkey") * 2 + 1).alias("s"),
            )
            .distinct()
        )
        edges = pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("c").alias("src"), F.col("s").alias("dst")),
                    F.struct(F.col("s").alias("src"), F.col("c").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
        return pagerank(
            edges, iterations=5, damping=0.85, assume_distinct=True,
            nodes_from_src=True, complete_indegree=complete,
        )

    legs = {"old(joins)": [], "new(direct)": []}
    for _ in range(reps):
        legs["old(joins)"] += _timed(spark, lambda: build(False), 1)
        legs["new(direct)"] += _timed(spark, lambda: build(True), 1)
    _report("pagerank", legs)


def ab_triangle(spark, sf_dir, reps):
    from evidence_images_etl_airflow_spark.operators.graph import triangle_count

    def old():
        li = (
            W._t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
        )
        a, b = li.alias("a"), li.alias("b")
        edges = a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        return triangle_count(edges, "src", "dst")

    def new():
        return W.REGISTRY["graph_triangle_stats"].fn(spark, sf_dir)

    legs = {"old(selfjoin)": [], "new(arrays)": []}
    for _ in range(reps):
        legs["old(selfjoin)"] += _timed(spark, old, 1)
        legs["new(arrays)"] += _timed(spark, new, 1)
    _report("triangle", legs)


def _seq_autoplan(spark, sf_dir):
    """join_autoplan_strategy with the pre-r16 SEQUENTIAL case
    construction (the planner itself still runs the current code, so
    this isolates exactly the §2.6 overlap)."""
    from evidence_images_etl_airflow_spark.operators.skew import plan_equi_join

    li = W._t(spark, sf_dir, "lineitem")
    orders = W._t(spark, sf_dir, "orders")
    customer = W._t(spark, sf_dir, "customer")
    supplier = W._t(spark, sf_dir, "supplier")

    def _case(name, left, right, bcast_max):
        joined, dec = plan_equi_join(
            left, right, ["k"], broadcast_max_rows=bcast_max,
            target_rows_per_task=256, skew_share=0.2, max_salts=64,
        )
        big = (
            dec["left"]
            if dec["left"]["n_rows"] >= dec["right"]["n_rows"]
            else dec["right"]
        )
        meta = spark.createDataFrame(
            [(name, dec["strategy"], dec["num_salts"], dec["left"]["n_rows"],
              dec["right"]["n_rows"], big["max_degree"])],
            "case_name string, strategy string, num_salts bigint, "
            "n_left bigint, n_right bigint, big_max_degree bigint",
        )
        cnt = joined.agg(F.count("*").cast("bigint").alias("joined_rows"))
        return meta.crossJoin(F.broadcast(cnt))

    a = _case("dim_broadcast",
              orders.select(F.col("o_custkey").alias("k"), "o_orderkey"),
              customer.select(F.col("c_custkey").alias("k"), "c_acctbal"), 2000)
    b = _case("fact_fact_uniform",
              li.select(F.col("l_orderkey").alias("k"), "l_linenumber"),
              orders.select(F.col("o_orderkey").alias("k"), "o_totalprice"), 1000)
    c = _case("fact_hot_salted",
              li.select(
                  F.when(F.col("l_suppkey") % 4 == 0, F.col("l_suppkey"))
                  .otherwise(F.lit(-1)).cast("bigint").alias("k"),
                  "l_orderkey", "l_linenumber"),
              supplier.select(F.col("s_suppkey").alias("k"), "s_name"), 5)
    return a.unionByName(b).unionByName(c).orderBy("case_name")


def ab_autoplan(spark, sf_dir, reps):
    legs = {"old(seq)": [], "new(pool)": []}
    for _ in range(reps):
        legs["old(seq)"] += _timed(spark, lambda: _seq_autoplan(spark, sf_dir), 1)
        legs["new(pool)"] += _timed(
            spark, lambda: W.REGISTRY["join_autoplan_strategy"].fn(spark, sf_dir), 1
        )
    _report("autoplan", legs)


def ab_ep5(spark, sf_dir, reps):
    """ep5 current tree only (its old/new delta is inside
    plan_join_chain + plan_equi_join; the sequential replica would be a
    page of copied code — measure autoplan for the isolated effect and
    read ep5 as the composed number)."""
    legs = {"new(pool)": []}
    for _ in range(reps):
        legs["new(pool)"] += _timed(
            spark, lambda: W.REGISTRY["ep5_mart_chain_planned"].fn(spark, sf_dir), 1
        )
    _report("ep5", legs)


def ab_winnow(spark, sf_dir, reps):
    from evidence_images_etl_airflow_spark.operators import dedup as D

    def old():
        d = W._t(spark, sf_dir, "documents")
        fps = D._materialized(
            D.winnowing_fingerprints(d, "doc_id", "text", 3, 4)
            .select("id", "fp")
            .distinct()
        )
        a, b = fps.alias("a"), fps.alias("b")
        return (
            a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").cast("bigint").alias("n_shared"))
            .filter(F.col("n_shared") >= 2)
        )

    legs = {"old(selfjoin)": [], "new(buckets)": []}
    for _ in range(reps):
        legs["old(selfjoin)"] += _timed(spark, old, 1)
        legs["new(buckets)"] += _timed(
            spark, lambda: W.REGISTRY["dedup_winnowing_pairs"].fn(spark, sf_dir), 1
        )
    _report("winnow", legs)


def ab_ngram(spark, sf_dir, reps):
    from evidence_images_etl_airflow_spark.operators import dedup as D

    def old():
        d = W._t(spark, sf_dir, "documents")
        sh = D._materialized(D._doc_shingles(d, "doc_id", "text", 3))
        sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count("*").alias("inter"))
        )
        sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
        sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
        return (
            inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6))
            .filter(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b", "jaccard")
        )

    legs = {"old(selfjoin)": [], "new(buckets)": []}
    for _ in range(reps):
        legs["old(selfjoin)"] += _timed(spark, old, 1)
        legs["new(buckets)"] += _timed(
            spark, lambda: W.REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir), 1
        )
    _report("ngram", legs)


def ab_minhash(spark, sf_dir, reps):
    from evidence_images_etl_airflow_spark.operators import dedup as D

    def old():
        d = W._t(spark, sf_dir, "documents")
        sh = D._materialized(
            D._doc_shingles(d, "doc_id", "text", 3).withColumn(
                "hp", D._base_hash(F.col("shingle"))
            )
        )
        sig = D._materialized(sh.groupBy("id").agg(*D._sig_aggs(8)))
        banded = D._band_keys(sig, 8, 4)
        a, b = banded.alias("a"), banded.alias("b")
        cands = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        arrs = D._materialized(
            sh.groupBy("id").agg(F.collect_set("shingle").alias("__shs"))
        )
        return (
            cands.join(arrs.select(F.col("id").alias("id_a"), F.col("__shs").alias("__sa")), "id_a")
            .join(arrs.select(F.col("id").alias("id_b"), F.col("__shs").alias("__sb")), "id_b")
            .withColumn("__inter", F.size(F.array_intersect("__sa", "__sb")))
            .filter(F.col("__inter") > 0)
            .withColumn("jaccard", F.round(F.col("__inter") / (F.size("__sa") + F.size("__sb") - F.col("__inter")), 6))
            .filter(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b", "jaccard")
        )

    legs = {"old(selfjoin)": [], "new(buckets)": []}
    for _ in range(reps):
        legs["old(selfjoin)"] += _timed(spark, old, 1)
        legs["new(buckets)"] += _timed(
            spark, lambda: W.REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir), 1
        )
    _report("minhash", legs)


def main():
    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else ["pagerank"]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_session("ab-r16")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # warm-up: JIT + parquet footers
    W.REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).count()
    for m in modes:
        {"pagerank": ab_pagerank, "triangle": ab_triangle,
         "autoplan": ab_autoplan, "ep5": ab_ep5, "winnow": ab_winnow,
         "ngram": ab_ngram, "minhash": ab_minhash}[m](spark, sf_dir, reps)
    spark.stop()


if __name__ == "__main__":
    main()
