"""Per-stage profiler for one registered query (optimization guide §1:
measure first, empirically — find WHERE the time goes before touching
anything).

Runs QUERY solo in a fresh JVM with the Spark UI enabled, executes it
twice (pass 1 = cold incl. JIT, pass 2 = steady state, cache registry
hard-released between passes), then pulls /api/v1 stage metrics and
prints the top stages of pass 2 by duration with their names — the
local-mode stand-in for the UI's Stages tab.

Usage: PYTHONPATH=. python tools/profile_query.py QUERY [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from evidence_images_etl_airflow_spark import caching  # noqa: E402
from evidence_images_etl_airflow_spark import workload as W  # noqa: E402
from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402


def _api(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    q = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_session(
        "profile-" + q[:16],
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    # warm-up: JIT + parquet footers, unrelated plan
    W.REGISTRY["q1_pricing_summary"].fn(spark, sf_dir).count()

    marks = []
    for pas in (1, 2):
        caching.release_all(spark, hard=True)
        sc = spark.sparkContext
        first_job = int(sc._jsc.sc().dagScheduler().nextJobId())
        t0 = time.perf_counter()
        W.REGISTRY[q].fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        marks.append((pas, first_job, dt))
        print(f"pass {pas}: {dt:.3f}s (jobs from {first_job})")

    apps = _api(4049, "applications")
    app_id = apps[0]["id"]
    jobs = _api(4049, f"applications/{app_id}/jobs?status=succeeded")
    stages = _api(4049, f"applications/{app_id}/stages?status=complete")
    # stages of pass 2 only
    _, job_lo, _ = marks[-1]
    want_stages = set()
    job_rows = []
    for j in jobs:
        if j["jobId"] >= job_lo:
            want_stages.update(j["stageIds"])
            job_rows.append(j)
    rows = []
    for s in stages:
        if s["stageId"] in want_stages:
            dur = s.get("executorRunTime", 0)
            rows.append(
                (
                    dur,
                    s["stageId"],
                    s.get("numCompleteTasks", 0),
                    s.get("inputBytes", 0),
                    s.get("shuffleReadBytes", 0),
                    s.get("shuffleWriteBytes", 0),
                    s.get("executorCpuTime", 0) / 1e9,
                    (s.get("completionTime") or ""),
                    (s.get("firstTaskLaunchedTime") or ""),
                    s.get("name", "")[:100],
                )
            )
    rows.sort(reverse=True)
    print(f"\npass-2 jobs: {len(job_rows)}, stages: {len(rows)}")
    print(
        f"{'runMs':>8} {'cpuS':>7} {'stage':>5} {'tasks':>5} "
        f"{'inMB':>7} {'shRdMB':>7} {'shWrMB':>7}  name"
    )
    for dur, sid, nt, inb, srb, swb, cpu, _ct, _ft, name in rows[:25]:
        print(
            f"{dur:>8} {cpu:>7.2f} {sid:>5} {nt:>5} "
            f"{inb / 1e6:>7.1f} {srb / 1e6:>7.1f} {swb / 1e6:>7.1f}  {name}"
        )
    total_run = sum(r[0] for r in rows)
    print(f"\nsum executorRunTime pass 2: {total_run} ms across {len(rows)} stages")
    spark.stop()


if __name__ == "__main__":
    main()
