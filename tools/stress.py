"""Scale stress harness for the extension operators: amplifies the
sf0.1 documents/embeddings tables N× into /tmp (deterministic text
perturbations so near-dup structure survives), then times dedup/ANN
operators at each amplification to expose super-linear cliffs that
sf0.1 alone can't show.

Usage: PYTHONPATH=. python tools/stress.py [factors ...]  (default 1 4 16)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"


def amplify_documents(spark, factor: int, out: str) -> int:
    """factor copies of documents: copy 0 keeps the text verbatim (true
    dups across nothing — ids shift), other copies swap a token
    deterministically so each original gains near-dup variants."""
    d = spark.read.parquet(f"{SRC}/documents.parquet")
    n = d.count()
    copies = []
    for i in range(factor):
        c = d.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.when(F.lit(i) == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(f" variant{i}")))
            .alias("text"),
        )
        copies.append(c)
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    df.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return n * factor


def amplify_embeddings(spark, factor: int, out: str) -> int:
    e = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n = e.count()
    copies = []
    for i in range(factor):
        c = e.select(
            (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
            # perturb one coordinate deterministically per copy
            F.transform(
                F.col("embedding"),
                lambda v, j: F.when(j == i % 64, v + F.lit(0.01) * i).otherwise(v),
            ).alias("embedding"),
        )
        copies.append(c)
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    df.repartition(32).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return n * factor


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 4, 16]

    from evidence_images_etl_airflow_spark.operators.dedup import (
        dedup_exact,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash64,
    )
    from evidence_images_etl_airflow_spark.operators.similarity import brute_force_topk, lsh_topk
    from evidence_images_etl_airflow_spark.session import get_session
    from evidence_images_etl_airflow_spark.workload import _ANN_PLANES

    spark = get_session("stress")
    base = tempfile.mkdtemp(prefix="sgstress_")
    print(f"{'factor':>6} {'docs':>8} {'op':28s} {'sec':>8} {'rows':>10}")
    try:
        for factor in factors:
            out = f"{base}/x{factor}"
            n_docs = amplify_documents(spark, factor, out)
            n_vecs = amplify_embeddings(spark, factor, out)
            d = spark.read.parquet(f"{out}/documents.parquet")
            e = spark.read.parquet(f"{out}/embeddings.parquet")

            ops = {
                "dedup_exact": lambda: dedup_exact(d, "doc_id", "text").count(),
                "ngram_jaccard(t=.5,cap=1k)": lambda: ngram_jaccard_pairs(
                    d, "doc_id", "text", 3, 0.5, 1000
                ).count(),
                "minhash_lsh(8/4,t=.5)": lambda: minhash_lsh_pairs(
                    d, "doc_id", "text", 8, 4, 3, 0.5
                ).count(),
                "simhash64": lambda: simhash64(d, "doc_id", "text").count(),
                "ann_brute(5q,k=3)": lambda: brute_force_topk(
                    e, e.filter(F.col("vec_id") < 5), "vec_id", "embedding", 3
                ).count(),
                "ann_lsh(100q,k=3)": lambda: lsh_topk(
                    e, e.filter(F.col("vec_id") < 100), _ANN_PLANES, "vec_id", "embedding", 3
                ).count(),
            }
            for op_name, fn in ops.items():
                t0 = time.perf_counter()
                rows = fn()
                dt = time.perf_counter() - t0
                print(f"{factor:>6} {n_docs:>8} {op_name:28s} {dt:>8.2f} {rows:>10}")
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
