"""Docs/embeddings scale-up: replicate documents and embeddings N×
with SHIFTED ids — the right scaling for operators that measure
per-document/ per-vector work (PMI df counts, calibration bins, int8
quantization) where the standard datagen's copy-unchanged rule (which
protects the dedup benchmarks from manufactured dup structure) would
not grow the corpus at all. Queries whose panel is `vec_id < 5` keep
a FIXED query set while the corpus scales — the shape the ANN scale
curves measure.

Usage: python tools/scale_docs_embeddings.py <src_sf_dir> <dst_dir> [copies]
"""

from __future__ import annotations

import os
import sys

SHIFT = 1 << 40


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf10x_docs"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.session import get_session

    spark = get_session("scale-docs")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for t, key in [("documents", "doc_id"), ("embeddings", "vec_id")]:
        base = spark.read.parquet(f"{src}/{t}.parquet")
        out = None
        for i in range(copies):
            c = base.withColumn(key, F.col(key) + F.lit(i * SHIFT))
            out = c if out is None else out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"wrote {t} x{copies}")


if __name__ == "__main__":
    main()
