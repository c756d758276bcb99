"""Scale-curve measurement harness: time registered queries across
corpus decades with the contamination-proof protocol SCALING.md's
round-8 numbers were taken under.

Protocol (each point):
- a FRESH JVM per query family — cross-query JVM pressure (GC, memory,
  codecache) inflated a later query's wall time 8x in one shared
  session (r08 finding; best-of-2 did not save it);
- one unrelated warm-up query first (JIT/classloading);
- best-of-2 with the repo cache registry released between runs.

Usage:
    PYTHONPATH=. python tools/measure_scale.py QUERY[,QUERY...] \
        [label=sf_dir ...]

    # example: the round-8 curve
    PYTHONPATH=. python tools/measure_scale.py \
        dedup_prefix_filter_pairs,curation_dsir_selection \
        1x=/root/testdata/sf0.1 10x=.scratch/sf1x_docs

With no sf_dir args, measures 1x=/root/testdata/sf0.1 only. Each
query runs in its own subprocess; the parent only collects lines, so
a hung or OOM'd point never poisons the next family's JVM.
"""

from __future__ import annotations

import os
import subprocess
import sys

_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
from evidence_images_etl_airflow_spark.session import get_session
from evidence_images_etl_airflow_spark import workload as W
from evidence_images_etl_airflow_spark import caching

q = {q!r}
spark = get_session("measure-" + q[:12])
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
W.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").count()
for lbl, d in {points!r}:
    best, rows = None, None
    for _ in range(2):
        # hard release WITH the session: clearCache() is what actually
        # evicts plan-keyed SQL caches — without it, pass 2 of a query
        # that persists an intermediate re-attaches to pass 1's
        # InMemoryRelation and best-of-2 reports the warm-cache time
        # (observed r12: 1.9 s reported for a 23 s cold run).
        caching.release_all(spark, hard=True)
        t0 = time.time()
        # count() is NOT a safe materializer for grouping-less global
        # aggregates: the optimizer knows such plans produce exactly one
        # row and answers without executing the child (observed r12:
        # ml_roc_auc "measured" 0.68 s at 100x while a collect() showed
        # the real 18 s). Counting the EXECUTED plan's RDD forces the
        # full physical plan while keeping rows JVM-side.
        jdf = W.REGISTRY[q].fn(spark, d)._jdf
        rows = jdf.queryExecution().executedPlan().execute().count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print("POINT\\t%s\\t%s\\t%.2f\\t%d" % (q, lbl, best, rows), flush=True)
spark.stop()
"""


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    queries = sys.argv[1].split(",")
    points = [a.split("=", 1) for a in sys.argv[2:]] or [
        ["1x", "/root/testdata/sf0.1"]
    ]
    points = [(lbl, os.path.abspath(d)) for lbl, d in points]

    print(f"{'query':32s} {'scale':>6s} {'best-of-2':>10s} {'rows':>10s}")
    failed = []
    for q in queries:
        child = _CHILD.format(repo=repo, q=q, points=points)
        proc = subprocess.run(
            [sys.executable, "-c", child],
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": repo},
        )
        got = False
        for line in proc.stdout.splitlines():
            if line.startswith("POINT\t"):
                _, name, lbl, sec, rows = line.split("\t")
                print(f"{name:32s} {lbl:>6s} {sec:>9s}s {rows:>10s}")
                got = True
        if proc.returncode != 0 or not got:
            failed.append(q)
            tail = "\n".join(proc.stderr.splitlines()[-5:])
            print(f"{q:32s} FAILED (rc={proc.returncode})\n{tail}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
