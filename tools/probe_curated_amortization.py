"""One-build-feeds-all measurement for the unified curated score
table (r13 verdict item 3 done-condition): in a single JVM, run the
five precomputed metric twins in sequence — the FIRST call pays the
one _curated_doc_scores build (fingerprint-guarded, so every later
call is a warm column read) — and report each query's wall. The
point being demonstrated: ONE scoring pass amortizes the whole
quintet (and ep3_curated, measured separately on the dedup-valid
corpus), vs r13 where ml_roc_auc_precomputed and ep3_pipeline_curated
each built their own table.

Usage: PYTHONPATH=. python tools/probe_curated_amortization.py SF_DIR
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from evidence_images_etl_airflow_spark import workload as W  # noqa: E402
from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402

QUINTET = [
    "ml_roc_auc_precomputed",
    "ml_calibration_precomputed",
    "ml_kappa_precomputed",
    "ml_pr_sweep_precomputed",
    "curation_alignment_precomputed",
]


def main() -> int:
    sf_dir = sys.argv[1].rstrip("/")
    spark = get_session("probe-curated")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # warm the JVM/codegen on an unrelated query
    W.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").count()

    total = 0.0
    for i, name in enumerate(QUINTET):
        t0 = time.time()
        W.REGISTRY[name].fn(spark, sf_dir).count()
        wall = time.time() - t0
        total += wall
        tag = "cold (includes the ONE build)" if i == 0 else "warm"
        print(f"RESULT {name:34s} {wall:7.2f}s  {tag}", flush=True)
    print(f"RESULT quintet_total {total:7.2f}s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
