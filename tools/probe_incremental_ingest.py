"""Append-cost measurement for update_score_table (r14 verdict item 3
done-condition): prove the incremental curated-score ingest costs
∝ NEW docs, not corpus. In ONE JVM per corpus: (1) bootstrap the
score table from the 80% history (doc_id % 5 != 0), (2) time a FULL
re-crawl batch through update_score_table — the anti join discards
the 80% overlap and scores only the new fifth, (3) time a SMALL
re-crawl (the new fifth's own 10%, i.e. 2% of the corpus), (4) time
the full-rebuild alternative (materialize_score_table over
everything) for the denominator. If append cost tracked the corpus
rather than the batch, (2) and (3) would cost the same; the design
claim is (3) << (2) < (4) with (2) ≈ the scoring share of 20% of the
corpus plus the id-column anti join.

Usage: PYTHONPATH=. python tools/probe_incremental_ingest.py SF_DIR
  SF_DIR: .scratch/sf10x_de / .scratch/sf100x_de (the docs corpora
  the curated-layer SCALING rows use)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from evidence_images_etl_airflow_spark import workload as W  # noqa: E402
from evidence_images_etl_airflow_spark.functions.text import (  # noqa: E402
    quality_score,
    tokens,
)
from evidence_images_etl_airflow_spark.operators.ml_curation import (  # noqa: E402
    materialize_score_table,
    update_score_table,
)
from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402

CARRY = ["doc_id", "n_chars", "token_count"]


def enrich(df):
    return df.withColumn("n_chars", F.length("text")).withColumn(
        "token_count", F.size(tokens(F.col("text")))
    )


def main() -> int:
    sf_dir = sys.argv[1].rstrip("/")
    spark = get_session("probe-incr-ingest")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    W.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").count()

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_total = base.count()
    root = tempfile.mkdtemp(prefix="sg_probe_incr_")
    score = quality_score(F.col("text"))
    try:
        # (1) bootstrap: history = 80%
        path = f"{root}/scores"
        t0 = time.time()
        materialize_score_table(
            enrich(base.filter(F.col("doc_id") % 5 != 0)), score, path,
            carry_cols=CARRY,
        )
        print(
            f"RESULT bootstrap_80pct {time.time() - t0:7.2f}s"
            f"  ({n_total} docs total)",
            flush=True,
        )

        # (2) full re-crawl: 100% of corpus arrives, 20% is new
        t0 = time.time()
        update_score_table(enrich(base), score, path, "doc_id",
                           carry_cols=CARRY)
        print(
            f"RESULT append_full_recrawl_20pct_new {time.time() - t0:7.2f}s",
            flush=True,
        )
        n_after = spark.read.parquet(path).count()
        assert n_after == n_total, (n_after, n_total)

        # (3) small re-crawl against the now-complete table: rebuild
        # history at 98% so a 2% batch is genuinely new
        path2 = f"{root}/scores2"
        materialize_score_table(
            enrich(base.filter(F.col("doc_id") % 50 != 0)), score, path2,
            carry_cols=CARRY,
        )
        t0 = time.time()
        update_score_table(enrich(base), score, path2, "doc_id",
                           carry_cols=CARRY)
        print(
            f"RESULT append_full_recrawl_2pct_new {time.time() - t0:7.2f}s",
            flush=True,
        )

        # (4) the alternative: full rebuild
        path3 = f"{root}/scores3"
        t0 = time.time()
        materialize_score_table(enrich(base), score, path3,
                                carry_cols=CARRY)
        print(f"RESULT full_rebuild {time.time() - t0:7.2f}s", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
