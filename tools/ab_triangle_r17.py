"""Interleaved A/B over the two r17 triangle_count edits, in ONE JVM
(the ab_r16.py protocol — this host is bursty, absolute sweeps are
unreadable):

  A: r16 shape  — adj NOT persisted, tri_agg broadcast cross join
  B: head shape — adj persisted,    tri_agg shuffle_replicate_nl
  C: adj persisted, broadcast      (isolates the persist)
  D: adj NOT persisted, replicate_nl (isolates the hint)

All four compute the identical census (asserted on the first rep).
The graph is the real graph_triangle_stats co-purchase edge build.

Usage: PYTHONPATH=. python tools/ab_triangle_r17.py [reps] [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from evidence_images_etl_airflow_spark import caching  # noqa: E402
from evidence_images_etl_airflow_spark import workload as W  # noqa: E402
from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402


def _edges(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("__ps")
    )
    return per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(__ps, (x, i) -> "
                "transform(slice(__ps, i + 2, size(__ps)), "
                "y -> struct(x AS src, y AS dst))))"
            )
        ).alias("e")
    ).select("e.src", "e.dst")


def triangle_stats(edges: DataFrame, persist_adj: bool, replicate_nl: bool):
    e = caching.materialize(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )
    deg = caching.materialize(
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = caching.materialize(
        ed.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    adj = o.groupBy(F.col("s").alias("n")).agg(F.collect_set("t").alias("nbrs"))
    if persist_adj:
        adj = caching.materialize(adj)
    tri_agg = (
        o.join(adj.select(F.col("n").alias("s"), F.col("nbrs").alias("ns")), "s")
        .join(adj.select(F.col("n").alias("t"), F.col("nbrs").alias("nt")), "t")
        .agg(
            F.coalesce(F.sum(F.size(F.array_intersect("ns", "nt"))), F.lit(0))
            .cast("bigint")
            .alias("n_triangles")
        )
    )
    tri_side = (
        tri_agg.hint("shuffle_replicate_nl") if replicate_nl else F.broadcast(tri_agg)
    )
    return (
        deg.agg(
            F.count("*").cast("bigint").alias("n_nodes"),
            (F.sum(F.col("d") * (F.col("d") - 1)) / 2)
            .cast("bigint")
            .alias("n_wedges"),
        )
        .crossJoin(F.broadcast(e.agg(F.count("*").cast("bigint").alias("n_edges"))))
        .crossJoin(tri_side)
    )


LEGS = {
    "A:r16(nopersist,bcast)": (False, False),
    "B:head(persist,replnl)": (True, True),
    "C:persist,bcast": (True, False),
    "D:nopersist,replnl": (False, True),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_session("ab-triangle-r17")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # warm-up + cross-leg identity check
    first = None
    for lbl, (p, r) in LEGS.items():
        caching.release_all(spark, hard=True)
        row = triangle_stats(_edges(spark, sf_dir), p, r).collect()[0]
        if first is None:
            first = row
        assert row == first, f"{lbl} differs: {row} vs {first}"
    times: dict[str, list[float]] = {n: [] for n in LEGS}
    for _ in range(reps):
        for lbl, (p, r) in LEGS.items():
            caching.release_all(spark, hard=True)
            t0 = time.perf_counter()
            triangle_stats(_edges(spark, sf_dir), p, r).count()
            times[lbl].append(round(time.perf_counter() - t0, 3))
    for lbl, ts in times.items():
        print(f"{lbl:24s} med={statistics.median(ts):7.3f} min={min(ts):7.3f}  {ts}")
    spark.stop()


if __name__ == "__main__":
    main()
