"""A/B the eager caching.materialize() count() against lazy persist
(VERDICT r04 item 2): run the three regressed bench queries at sf0.1
in THIS process with the chosen mode, print per-query best-of-2.

Usage: python tools/ab_materialize.py {eager|lazy} [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from evidence_images_etl_airflow_spark import caching  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "eager"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

if MODE == "lazy":
    caching.materialize = lambda df: caching.track(df.persist())

from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402
from evidence_images_etl_airflow_spark.workload import queries  # noqa: E402

NAMES = ["dedup_minhash_lsh", "curation_lm_perplexity", "ann_brute_force_topk"]


def main() -> None:
    spark = get_session(f"ab-{MODE}")
    qs = queries()
    qs["q1_pricing_summary"](spark, SF).count()  # JVM/codegen warm-up
    timings: dict[str, float] = {}
    for _ in range(5):
        spark.catalog.clearCache()
        for name in NAMES:
            t0 = time.perf_counter()
            qs[name](spark, SF).count()
            dt = time.perf_counter() - t0
            if name not in timings or dt < timings[name]:
                timings[name] = round(dt, 3)
    print(json.dumps({"mode": MODE, "queries": timings,
                      "total": round(sum(timings.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
