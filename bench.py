"""Benchmark harness: runs the headline workload queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with a count-style
action (``df.foreach`` would move rows to Python; ``count()`` on the
final plan keeps everything JVM-side). One warm-up run of the
flagship query amortizes JVM/codegen startup out of the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402
from evidence_images_etl_airflow_spark.workload import headline_queries  # noqa: E402


def _host_cal() -> float:
    """Single-thread CPU calibration: seconds for a fixed pure-Python
    loop. Recorded alongside the timings because the bench host changes
    between rounds — round 5 measured every query (including untouched
    TPC-H plans) in a uniform ~2-3x band over round 2's numbers on a
    100%-idle machine, i.e. the host itself was slower. This constant
    lets a cross-round reader normalize before calling a regression."""
    return _cal_loop(None)


def _cal_loop(_arg) -> float:
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    return round(time.perf_counter() - t0, 3)


def _host_cal_parallel(procs: int = 8) -> float:
    """MAX wall seconds across ``procs`` forked concurrent copies of
    the calibration loop — the multi-core companion to the 1-thread
    cal. Needed because the single-thread number is blind to
    noisy-neighbor load on OTHER cores: r09 observed back-to-back runs
    at cal 0.672/0.674 (identical, in band) whose bench totals differed
    31% — the contention was multi-core only, invisible to one pinned
    loop but fatal to a 32-thread Spark local run. Forked processes
    (not threads: the pure-Python loop would serialize on the GIL)
    sample that contention directly. Recorded in the JSON for reading,
    not gating."""
    import multiprocessing as mp

    with mp.get_context("fork").Pool(procs) as pool:
        return round(max(pool.map(_cal_loop, range(procs))), 3)


# Quiet-host calibration band documented in BASELINE.md: every usable
# recorded run (r02-r08 quiet reruns) landed in [0.68, 1.47]; round-9
# quiet observations of 0.634-0.668 extended the lower edge (a FAST
# cal is an idler host, not noise — only the slow side signals a
# degraded host). The one official artifact outside the band (r08,
# cal 2.342 on a host measured 3.3x degraded) was unreadable without
# out-of-band reruns.
CAL_BAND = (0.63, 1.47)


def _calibrate(cal_fn=_host_cal, sleep_fn=time.sleep, wait_sec: float = 45.0):
    """Noisy-host guard (VERDICT r08 item 3): measure host calibration
    and, if it exceeds the quiet band's UPPER edge, sleep once and
    re-measure — a transient noisy-neighbor spike usually clears; a
    genuinely degraded host doesn't, and then BOTH samples land in the
    JSON artifact so it is self-certifying instead of needing
    out-of-band quiet reruns to interpret. Only the SLOW side triggers
    the retry: a fast cal is an idler/newer host, not noise (r09
    review — the first two-sided version burned a pointless 45 s sleep
    and flagged a perfectly good run when a quiet host measured 0.645).

    Returns (operative_cal, all_samples). ``cal_fn``/``sleep_fn`` are
    injectable for unit tests."""
    samples = [cal_fn()]
    if samples[0] > CAL_BAND[1]:
        sleep_fn(wait_sec)
        samples.append(cal_fn())
    return samples[-1], samples


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cal, cal_samples = _calibrate()
    cal_par = _host_cal_parallel()
    spark = get_session("bench")

    qs = headline_queries()
    only = os.environ.get("SPARK_GRAFT_QUERIES")
    if only:
        want = [q.strip() for q in only.split(",") if q.strip()]
        qs = {name: qs[name] for name in want if name in qs}
    # warm-up: JVM, codegen, parquet footer caches
    next(iter(qs.values()))(spark, sf_dir).count()

    # best-of-2 per query: steady-state throughput, not a one-shot
    # sample — this host is shared and a single pass can catch a
    # noisy-neighbor spike (measured 4x swings on identical plans)
    # opt-in experiment (r10): a JVM full-GC hint before each timing,
    # probing whether cross-query heap pressure (graph_triangle_stats
    # measures ~60% above its solo time in-sweep) is reclaimable
    gc_between = os.environ.get("SPARK_GRAFT_GC_BETWEEN") == "1"
    timings: dict[str, float] = {}
    for _ in range(2):
        # drop persisted intermediates so pass 2 recomputes the same
        # work instead of reading pass 1's cache
        spark.catalog.clearCache()
        for name, fn in qs.items():
            if gc_between:
                spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if name not in timings or dt < timings[name]:
                timings[name] = round(dt, 3)
    total = sum(timings.values())

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "host_cal_sec": cal,
                "host_cal_samples": cal_samples,
                # slow-side check only: see _calibrate
                "host_cal_in_band": cal <= CAL_BAND[1],
                "host_cal_par_sec": cal_par,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
