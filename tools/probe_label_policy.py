"""Changing-label-policy measurement for the curated score table
(r14 verdict item 4 done-condition): the table's design thesis is
that it stores POLICY-FREE carry columns (n_chars, token_count) and
the label threshold is a read-time choice — so re-labeling must cost
a warm column read (~flat in the threshold count), while the inline
path re-pays the scoring expression's corpus scan per re-label
(~linear). This probe measures exactly that claim at the 100x corpus:
in ONE JVM, build the shared curated table once, then sweep label
thresholds {128, 256, 512} computing the exact tie-aware ROC-AUC two
ways per threshold — (a) WARM: y derived from the stored n_chars
column over the curated table, (b) INLINE: re-score quality_score +
length over the raw corpus. Legs are INTERLEAVED per rep (this host's
load swings 2-6x between windows; serial one-shot A/Bs are not
defensible — MEMORY.md protocol) and the medians per (threshold, leg)
are reported.

If warm is NOT ~flat vs inline, the carry-column set is wrong and the
layer's design argument fails — that is worth knowing before r16
builds an incremental path on top of it.

Usage: PYTHONPATH=. python tools/probe_label_policy.py SF_DIR [reps]
  SF_DIR: .scratch/sf100x_de for the published row (the docs+
  embeddings second-wave corpus every scoring-metric SCALING row uses)
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from evidence_images_etl_airflow_spark import workload as W  # noqa: E402
from evidence_images_etl_airflow_spark.functions.text import (  # noqa: E402
    quality_score,
)
from evidence_images_etl_airflow_spark.operators.ml_curation import (  # noqa: E402
    roc_auc,
)
from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402

THRESHOLDS = [128, 256, 512]


def main() -> int:
    sf_dir = sys.argv[1].rstrip("/")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("probe-label-policy")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # warm the JVM/codegen on an unrelated query
    W.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").count()

    t0 = time.time()
    st = W._curated_doc_scores(spark, sf_dir)
    st.count()
    print(f"RESULT build_once {time.time() - t0:7.2f}s", flush=True)

    def warm(thresh: int) -> None:
        scored = st.select(
            "score", (F.col("n_chars") >= thresh).cast("int").alias("y")
        )
        roc_auc(scored, "score", "y", resolution=6).count()

    def inline(thresh: int) -> None:
        d = spark.read.parquet(f"{sf_dir}/documents.parquet")
        scored = d.select(
            quality_score(F.col("text")).alias("score"),
            (F.length("text") >= thresh).cast("int").alias("y"),
        )
        roc_auc(scored, "score", "y", resolution=6).count()

    walls: dict[tuple[str, int], list[float]] = {}
    for rep in range(reps):
        for thresh in THRESHOLDS:
            for leg, fn in (("warm", warm), ("inline", inline)):
                t0 = time.time()
                fn(thresh)
                wall = time.time() - t0
                walls.setdefault((leg, thresh), []).append(wall)
                print(
                    f"  rep{rep} {leg:6s} T={thresh:<4d} {wall:6.2f}s",
                    flush=True,
                )

    for leg in ("warm", "inline"):
        per_t = [statistics.median(walls[(leg, t)]) for t in THRESHOLDS]
        total = sum(per_t)
        detail = " ".join(
            f"T{t}={m:.2f}s" for t, m in zip(THRESHOLDS, per_t)
        )
        print(
            f"RESULT {leg:6s} 3-relabel sweep median total {total:7.2f}s"
            f"  ({detail})",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
