"""Routing A/B for the pair-heavy regime (r14 verdict item 6): the
r14 verify-width revert PROVED pair enumeration's cost is the pairs×
arrays verify materialization when candidates ≈ true pairs
(sf100x_de: 27.31M qualifying pairs), and the published caveat then
ADVISED "use minhash clustering in that regime" — argued from
structure, never measured. This harness measures the routing choice
itself, at the SAME dedup spec on both legs (4-token shingles,
J >= 0.6 — dedup_prefix_filter_pairs' published parameters):

  leg P  prefix_filter_jaccard_pairs(n=4, t=0.6)      — exact, recall 1
  leg M  minhash_lsh_pairs(h=8, b=4, n=4, t=0.6)      — banded, then
         exact-verified, so its pairs are a SUBSET of P's and
         recall = |M| / |P| needs no extra join

Wall per leg is the full pair-enumeration term a router would pay
before clustering; the recall column prices what minhash's banding
gives up. The crossover this records turns the prose advice into a
measured routing rule the autoplanner family can consume: route to
minhash when expected pair volume is candidate-dominated (duplication
density high), eat its recall gap; route to prefix-filter when pairs
are sparse and losslessness is free.

Protocol (MEMORY.md host-noise discipline): one leg per fresh
subprocess JVM, one unrelated warm-up query, one cold timed run;
legs interleaved P,M,P,M,... across reps; report per-leg medians.

Usage: PYTHONPATH=. python tools/ab_routing_pairheavy.py SF_DIR [reps]
  SF_DIR: .scratch/sf100x_de (pair-heavy) or .scratch/sf100x_docs
  (salted, pair-sparse) — running BOTH corpora records the crossover.
"""

from __future__ import annotations

import re
import statistics
import subprocess
import sys

REPO = "/root/repo"

_CHILD = """
import sys, time
sys.path.insert(0, {repo!r})
from evidence_images_etl_airflow_spark.session import get_session
from evidence_images_etl_airflow_spark import workload as W

spark = get_session("route-{leg}")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
W.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").count()
d = spark.read.parquet({sf_dir!r} + "/documents.parquet")
t0 = time.time()
{body}
print("RESULT {leg}", round(time.time() - t0, 2), "sec", n, "pairs",
      flush=True)
spark.stop()
"""

_BODIES = {
    "prefix": (
        "from evidence_images_etl_airflow_spark.operators.dedup import "
        "prefix_filter_jaccard_pairs\n"
        "n = prefix_filter_jaccard_pairs("
        "d, 'doc_id', 'text', n=4, threshold=0.6).count()"
    ),
    "minhash": (
        "from evidence_images_etl_airflow_spark.operators.dedup import "
        "minhash_lsh_pairs\n"
        "n = minhash_lsh_pairs("
        "d, 'doc_id', 'text', num_hashes=8, bands=4, shingle_n=4, "
        "verify_threshold=0.6).count()"
    ),
}


def run_leg(leg: str, sf_dir: str) -> tuple[float, int]:
    code = _CHILD.format(repo=REPO, leg=leg, sf_dir=sf_dir,
                         body=_BODIES[leg])
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO,
    )
    m = re.search(rf"RESULT {leg} ([\d.]+) sec (\d+) pairs", out.stdout)
    if not m:
        print(out.stdout[-2000:], file=sys.stderr)
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"leg {leg} produced no RESULT line")
    return float(m.group(1)), int(m.group(2))


def main() -> int:
    sf_dir = sys.argv[1].rstrip("/")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    walls: dict[str, list[float]] = {"prefix": [], "minhash": []}
    pairs: dict[str, int] = {}
    for rep in range(reps):
        for leg in ("prefix", "minhash"):
            wall, n = run_leg(leg, sf_dir)
            walls[leg].append(wall)
            pairs[leg] = n
            print(f"  rep{rep} {leg:8s} {wall:8.2f}s  {n} pairs",
                  flush=True)
    recall = pairs["minhash"] / pairs["prefix"] if pairs["prefix"] else 1.0
    for leg in ("prefix", "minhash"):
        med = statistics.median(walls[leg])
        print(
            f"RESULT {leg:8s} median {med:8.2f}s over {reps} reps,"
            f" {pairs[leg]} pairs"
            + (f", recall {recall:.4f}" if leg == "minhash" else
               ", recall 1.0000 (lossless)"),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
