"""Scale-up generator for the DOCUMENTS table — the dedup-valid variant.

`tools/scale_datagen.py` deliberately copies documents unchanged,
because replicating identical texts manufactures a degenerate duplicate
structure (every copy of a doc is a perfect dup of every other copy)
that distorts dedup benchmarks instead of scaling them. This tool
replicates documents N× in a way that PRESERVES the corpus's duplicate
structure per copy while keeping copies disjoint:

- doc_id shifts by i*SHIFT per copy (same convention as scale_datagen);
- every whitespace token gets a per-copy suffix `~ci` — a bijection on
  the token alphabet, so any pair of docs that was an exact/near dup
  inside the original corpus remains one inside each copy (identical
  shingle-set relationships), while tokens from DIFFERENT copies never
  collide (cross-copy Jaccard is exactly 0, so no manufactured dups).

The result: an N× corpus whose duplicate rate, cluster-size
distribution, and shingle-blocking behavior are the original's, which
is what "the same workload at N× the data" means for MinHash/LSH and
the ep3 pipeline.

Usage:
    python tools/scale_docs.py <src_sf_dir> <dst_dir> [copies=10]
"""

from __future__ import annotations

import os
import sys

SHIFT = 1 << 40


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1x_docs"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.session import get_session

    spark = get_session("scale-docs")
    d = spark.read.parquet(f"{src}/documents.parquet")
    # Refuse already-scaled input: shifting a corpus whose ids already
    # carry an i*SHIFT offset lands copy (i, j) and copy (j, i) on the
    # SAME id ((i+j)*SHIFT + orig) — colliding ids silently merge
    # different docs in every id-grouped operator downstream. Scale
    # from the pristine source with a larger `copies` instead.
    max_id = d.agg(F.max("doc_id")).first()[0]
    if max_id is not None and max_id >= SHIFT:
        raise SystemExit(
            f"source {src} already looks scaled (max doc_id {max_id} >= "
            f"SHIFT {SHIFT}); re-run against the ORIGINAL corpus with the "
            f"product of both copy counts instead of re-scaling this output"
        )
    parts = [
        d.select(
            (F.col("doc_id") + F.lit(i * SHIFT)).alias("doc_id"),
            # suffix every token: '(\S+)' -> '$1~ci' — one codegen'd
            # regexp pass, global by default in Spark
            F.regexp_replace("text", r"(\S+)", f"$1~c{i}").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    n = spark.read.parquet(f"{dst}/documents.parquet").count()
    print(f"wrote {n} docs ({copies}x) to {dst}/documents.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
