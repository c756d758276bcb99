"""ep6 crawl-refresh decade probe: per-refresh BUILD cost (band-store
gate + incremental scoring of survivors) vs the WARM re-plan (PSI gate
+ waterfill off carry columns), one fresh JVM per (scale, rep) so the
pid-keyed scratch build re-runs cold every time; reps interleaved
across scales per the host-noise discipline (SCALING.md r13 protocol).

Usage: PYTHONPATH=. python tools/probe_ep6.py [reps]
"""

from __future__ import annotations

import subprocess
import sys

# *_docs (salted sparse) is ep6's decade family: the %5 split keeps
# cross-split near-dups at the base corpus's relative rate, so BOTH
# loop terms (band gate + survivor scoring) stay alive as the corpus
# scales. sf100x_de is kept as the degenerate regime row: its dup-dense
# structure makes the whole batch collide with history, so the probe
# measures the gate-only cost of a fully-duplicate re-crawl (and it is
# what surfaced the empty-slice PSI crash this probe exists to guard).
POINTS = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", ".scratch/sf10x_docs"),
    ("100x", ".scratch/sf100x_docs"),
    ("100x_dupdense", ".scratch/sf100x_de"),
]

_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
from evidence_images_etl_airflow_spark.session import get_session
from evidence_images_etl_airflow_spark import workload as W
from evidence_images_etl_airflow_spark import caching

spark = get_session("probe-ep6")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
W.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").count()

def run():
    caching.release_all(spark, hard=True)
    t0 = time.time()
    jdf = W.REGISTRY["ep6_crawl_refresh_pipeline"].fn(spark, {d!r})._jdf
    n = jdf.queryExecution().executedPlan().execute().count()
    return time.time() - t0, n

cold, n = run()   # scratch build: gate + incremental scoring + report
warm, _ = run()   # table built: PSI + waterfill off carry columns
print(f"EP6 {lbl} cold={{cold:.2f}} warm={{warm:.2f}} rows={{n}}", flush=True)
"""


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    repo = "/root/repo"
    for rep in range(reps):
        for lbl, d in POINTS:
            code = _CHILD.format(repo=repo, d=d, lbl=lbl)
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, cwd=repo, timeout=3600,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("EP6")]
            print(f"rep{rep} {line[0] if line else 'FAILED: ' + out.stderr[-400:]}",
                  flush=True)


if __name__ == "__main__":
    main()
