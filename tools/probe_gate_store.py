"""Band-gate cost vs store size: gate a FIXED batch (sf0.1's new
fifth, 1,000 docs) against the persisted minhash band store of a
1x/10x/100x history — the isolated per-refresh GATE term of ep6's
"cost ∝ batch, never corpus" claim (probe_ep6's cold number conflates
it with the one-time bootstrap scoring; probe_incremental_ingest
already isolated the scoring append). The store is WRITTEN to parquet
and read back before timing, as a real loop would hold it — a lazy
store DataFrame would silently re-run signature building inside the
gate leg and time the wrong thing.

Usage: PYTHONPATH=. python tools/probe_gate_store.py [reps]
"""

from __future__ import annotations

import subprocess
import sys

POINTS = [
    ("1x", "/root/testdata/sf0.1"),
    ("10x", ".scratch/sf10x_docs"),
    ("100x", ".scratch/sf100x_docs"),
]

_CHILD = """
import sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from evidence_images_etl_airflow_spark.session import get_session
from evidence_images_etl_airflow_spark.operators.dedup import (
    minhash_band_store, minhash_lsh_against_store,
)
from evidence_images_etl_airflow_spark import workload as W

spark = get_session("probe-gate")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
W.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").count()

hist = spark.read.parquet({d!r} + "/documents.parquet").filter(
    F.col("doc_id") % 5 != 0
)
batch = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").filter(
    F.col("doc_id") % 5 == 0
)
store_path = tempfile.mkdtemp(prefix="sg_gatestore_") + "/store"
t0 = time.time()
minhash_band_store(hist, "doc_id", "text").write.parquet(store_path)
build = time.time() - t0
store = spark.read.parquet(store_path)
n_store = store.count()
walls = []
for _ in range(2):
    t0 = time.time()
    surv, _bands = minhash_lsh_against_store(batch, store, "doc_id", "text")
    n_surv = surv.count()
    walls.append(time.time() - t0)
print(f"GATE {lbl} store_rows={{n_store}} build={{build:.2f}} "
      f"gate={{min(walls):.2f}} walls={{[round(w,2) for w in walls]}} "
      f"survivors={{n_surv}}", flush=True)
"""


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    repo = "/root/repo"
    for rep in range(reps):
        for lbl, d in POINTS:
            code = _CHILD.format(repo=repo, d=d, lbl=lbl)
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, cwd=repo, timeout=3600,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("GATE")]
            print(
                f"rep{rep} {line[0] if line else 'FAILED: ' + out.stderr[-400:]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
