"""Banding-parameter A/B for ep3's remaining minhash+CC term (r13
verdict item 5): the r13 attribution named the dial — num_hashes /
bands trade candidate recall against band-join + verify volume — so
this harness measures, per (h, b) leg, the WALL of exactly the term
the dial controls (minhash_lsh_pairs -> connected_components ->
dropped-id count, the shape ep3/ep3_curated run verbatim) and the
PAIR RECALL against an exact lossless ground truth, so a cheaper
banding can't silently buy its speed with missed duplicates.

Ground truth: `prefix_filter_jaccard_pairs` at the SAME shingle_n=3
and threshold=0.5 — provably lossless (prefix-filter theorem), so its
output is the complete J>=0.5 pair set. Built once per corpus with
the `truth` leg and parqueted under .scratch; recall legs join
against it UNTIMED in the same JVM after their timed run.
minhash_lsh_pairs verifies exact Jaccard on candidates, so its output
is a SUBSET of truth and recall = |pairs| / |truth| after an id-pair
join sanity-intersect.

Protocol (the host-noise discipline SCALING.md's r13 section fixed):
one leg per fresh subprocess JVM, one unrelated warm-up query, one
cold timed run; interleave reps by invoking this tool repeatedly with
the same leg list and take per-leg medians.

Usage:
    PYTHONPATH=. python tools/ab_ep3_banding.py SF_DIR truth
    PYTHONPATH=. python tools/ab_ep3_banding.py SF_DIR h8b4,h6b3,h4b2
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

_TRUTH_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
from evidence_images_etl_airflow_spark.session import get_session
from evidence_images_etl_airflow_spark.operators.dedup import (
    prefix_filter_jaccard_pairs,
)

spark = get_session("ep3-truth")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
d = spark.read.parquet({sf_dir!r} + "/documents.parquet")
t0 = time.time()
truth = prefix_filter_jaccard_pairs(
    d, "doc_id", "text", n=3, threshold=0.5
).select("id_a", "id_b")
truth.write.mode("overwrite").parquet({truth_path!r})
n = spark.read.parquet({truth_path!r}).count()
print("RESULT truth", round(time.time() - t0, 2), "sec", n, "pairs",
      flush=True)
spark.stop()
"""

_LEG_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from evidence_images_etl_airflow_spark.session import get_session
from evidence_images_etl_airflow_spark.operators.dedup import (
    minhash_lsh_pairs, connected_components,
)
from evidence_images_etl_airflow_spark import workload as W
from evidence_images_etl_airflow_spark import caching

spark = get_session("ep3-band-{leg}")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
W.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").count()
caching.release_all(spark, hard=True)
d = spark.read.parquet({sf_dir!r} + "/documents.parquet")

t0 = time.time()
pairs = minhash_lsh_pairs(
    d, "doc_id", "text", num_hashes={h}, bands={b}, shingle_n=3,
    verify_threshold=0.5,
)
comp = connected_components(pairs, algorithm="two_phase")
n_dropped = comp.filter(F.col("node") != F.col("component")).count()
wall = round(time.time() - t0, 2)

# recall vs the lossless truth table — UNTIMED, same JVM
caching.release_all(spark, hard=True)
truth = spark.read.parquet({truth_path!r})
n_truth = truth.count()
got = minhash_lsh_pairs(
    d, "doc_id", "text", num_hashes={h}, bands={b}, shingle_n=3,
    verify_threshold=0.5,
).select("id_a", "id_b")
n_hit = got.join(truth, ["id_a", "id_b"]).count()
print("RESULT {leg}", wall, "sec", n_dropped, "dropped",
      n_hit, "/", n_truth, "pairs recall",
      round(n_hit / max(1, n_truth), 4), flush=True)
spark.stop()
"""


def main() -> int:
    sf_dir = sys.argv[1].rstrip("/")
    legs = sys.argv[2].split(",") if len(sys.argv) > 2 else ["h8b4"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    truth_path = os.path.join(
        repo, ".scratch",
        f"truth_pairs_{os.path.basename(sf_dir)}_n3_t05.parquet",
    )
    for leg in legs:
        if leg == "truth":
            child = _TRUTH_CHILD.format(
                repo=repo, sf_dir=sf_dir, truth_path=truth_path
            )
        else:
            m = re.fullmatch(r"h(\d+)b(\d+)", leg)
            if not m:
                print(f"bad leg {leg!r} (want hNbM or truth)")
                return 2
            child = _LEG_CHILD.format(
                repo=repo, sf_dir=sf_dir, truth_path=truth_path,
                leg=leg, h=int(m.group(1)), b=int(m.group(2)),
            )
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
