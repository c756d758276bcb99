"""Single-run cold A/B of the prefix-filter shuffle-width advisor
(r13, r12 verdict item 3): each leg runs in a FRESH subprocess JVM
(one unrelated warm-up query first, then exactly ONE cold run — the
protocol the r12 harness fixes settled on for 100x points), with the
repo cache registry hard-released before timing.

Legs (all the same operator, same corpus, same output):
  stock    shuffle_target_bytes=None  — pre-r13 exchanges at the
           session/AQE width (the A/B control)
  advisor  the default target          — width from
           plan_shuffle_partitions(table_size_stats(shingles))
  handNNN  an explicit target chosen to reproduce a hand-picked
           width (e.g. 5_800_000 -> 128 on the 100x corpus)

Usage:
    PYTHONPATH=. python tools/ab_prefix_width.py SF_DIR LEG[,LEG...]
    # LEG in {stock, advisor, hand128} or an integer target in bytes
"""

from __future__ import annotations

import os
import subprocess
import sys

_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
from evidence_images_etl_airflow_spark.session import get_session
from evidence_images_etl_airflow_spark.operators.dedup import (
    prefix_filter_jaccard_pairs,
)
from evidence_images_etl_airflow_spark import workload as W
from evidence_images_etl_airflow_spark import caching

spark = get_session("ab-prefix-{leg}")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
W.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").count()
caching.release_all(spark, hard=True)
d = spark.read.parquet({sf_dir!r} + "/documents.parquet")
t0 = time.time()
jdf = prefix_filter_jaccard_pairs(
    d, "doc_id", "text", n=4, threshold=0.6,
    shuffle_target_bytes={target!r},
)._jdf
rows = jdf.queryExecution().executedPlan().execute().count()
print("RESULT {leg}", round(time.time() - t0, 2), "sec", rows, "rows",
      flush=True)
spark.stop()
"""


def main() -> int:
    sf_dir = sys.argv[1]
    legs = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "stock", "advisor", "hand128"
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    targets = {"stock": None, "advisor": 16 << 20, "hand128": 5_800_000}
    for leg in legs:
        target = targets[leg] if leg in targets else int(leg)
        child = _CHILD.format(repo=repo, sf_dir=sf_dir, target=target, leg=leg)
        r = subprocess.run(
            [sys.executable, "-c", child],
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": repo},
        )
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
        if r.returncode != 0:
            print(f"LEG {leg} FAILED:\n{r.stderr[-2000:]}", flush=True)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
