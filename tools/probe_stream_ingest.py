"""Streaming score-ingest steady state at 100x: land the history as
the bootstrap file, then four 25k-doc crawl files one at a time, each
drained by its own availableNow restart of
score_ingest_stream_available_now against the SAME checkpoint — so
each drain processes exactly one new file and its wall IS the
per-batch cost (stream startup + listing + anti-join against the
growing stored id column + scoring the batch). The claim under test:
per-batch cost stays flat as the stored table grows 400k -> 500k rows.

Usage: PYTHONPATH=. python tools/probe_stream_ingest.py [sf_dir]
(default .scratch/sf100x_docs)
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402
from evidence_images_etl_airflow_spark import workload as W  # noqa: E402
from evidence_images_etl_airflow_spark.functions.text import (  # noqa: E402
    quality_score,
    tokens,
)
from evidence_images_etl_airflow_spark.streaming.file_stream import (  # noqa: E402
    score_ingest_stream_available_now,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf100x_docs"
    spark = get_session("probe-stream-ingest")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    W.REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.1").count()

    base = tempfile.mkdtemp(prefix="sg_streamprobe_")
    src, store, ck = f"{base}/src", f"{base}/store", f"{base}/ck"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def enrich(df, batch):
        return (
            df.withColumn("n_chars", F.length("text"))
            .withColumn("token_count", F.size(tokens(F.col("text"))))
            .withColumn("ingest_batch", F.lit(batch))
            .select("doc_id", "text", "n_chars", "token_count", "ingest_batch")
        )

    def drain():
        t0 = time.time()
        score_ingest_stream_available_now(
            spark,
            f"{src}/f*",
            "doc_id long, text string, n_chars int, "
            "token_count int, ingest_batch int",
            store,
            ck,
            quality_score(F.col("text")),
            "doc_id",
            ["doc_id", "n_chars", "token_count", "ingest_batch"],
        )
        wall = time.time() - t0
        return wall, spark.read.parquet(store).count()

    # bootstrap: the already-ingested history
    enrich(docs.filter(F.col("doc_id") % 5 != 0), 0).write.parquet(f"{src}/f0")
    wall, rows = drain()
    print(f"STREAM bootstrap wall={wall:.2f} stored={rows}", flush=True)

    # four quarters of the new fifth, landed and drained one at a time
    for i in range(4):
        batch = docs.filter(
            (F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 20 == i * 5)
        )
        enrich(batch, i + 1).write.parquet(f"{src}/f{i + 1}")
        wall, rows = drain()
        print(f"STREAM batch{i + 1} wall={wall:.2f} stored={rows}", flush=True)

    # idempotency: drain with nothing new
    wall, rows = drain()
    print(f"STREAM empty-drain wall={wall:.2f} stored={rows}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
