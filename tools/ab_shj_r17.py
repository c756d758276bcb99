"""Interleaved A/B for the shuffled-hash-join configs (VERDICT r16
item 4, guide §3.1): legs alternate in ONE JVM between

  A: session defaults (preferSortMergeJoin=true, SHJ threshold off)
  B: spark.sql.join.preferSortMergeJoin=false
     + spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m

on the headline queries whose committed plans contain a SortMergeJoin
(graph_triangle_stats, ep3_pipeline_curated). Both configs are
runtime-settable SQL confs, so one JVM hosts both legs and the A,B,
A,B ordering makes both sample the same host noise (the r16 ab_r16.py
protocol). Acceptance per VERDICT: consistent direction across >=2
runs AND no committed plan's broadcast decision flips.

Usage: PYTHONPATH=. python tools/ab_shj_r17.py [reps] [sf_dir]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from evidence_images_etl_airflow_spark import caching  # noqa: E402
from evidence_images_etl_airflow_spark import workload as W  # noqa: E402
from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402

QUERIES = ["graph_triangle_stats", "ep3_pipeline_curated"]

B_CONF = {
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(64 * 1024 * 1024),
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_session("ab-shj-r17")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    defaults = {k: spark.conf.get(k) for k in B_CONF}
    # warm-up both legs once (JIT for both operator sets)
    for q in QUERIES:
        for conf in (defaults, B_CONF):
            for k, v in conf.items():
                spark.conf.set(k, v)
            caching.release_all(spark, hard=True)
            W.REGISTRY[q].fn(spark, sf_dir).count()
    for k, v in defaults.items():
        spark.conf.set(k, v)

    for q in QUERIES:
        legs: dict[str, list[float]] = {"A:smj-default": [], "B:shj-enabled": []}
        for _ in range(reps):
            for lbl, conf in (("A:smj-default", defaults), ("B:shj-enabled", B_CONF)):
                for k, v in conf.items():
                    spark.conf.set(k, v)
                caching.release_all(spark, hard=True)
                t0 = time.perf_counter()
                W.REGISTRY[q].fn(spark, sf_dir).count()
                legs[lbl].append(round(time.perf_counter() - t0, 3))
        for k, v in defaults.items():
            spark.conf.set(k, v)
        for lbl, ts in legs.items():
            print(
                f"{q:24s} {lbl:14s} med={statistics.median(ts):7.3f} "
                f"min={min(ts):7.3f}  {ts}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
