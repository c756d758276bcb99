"""Scale-up data generator: replicate the driver's testdata fact
tables N× with shifted keys to measure scaling beyond sf0.1 (the
largest SF the driver ships). Dimension tables (region, nation,
supplier, part) are copied unchanged — dims grow far slower than facts
in a real warehouse, and keeping them fixed preserves the broadcast
join shapes. documents/embeddings are copied unchanged too: replicating
identical texts would manufacture a degenerate dup structure that
distorts the dedup benchmarks rather than scaling them.

Key-relationship preservation: each copy i shifts every fact key
(orderkey, custkey on both sides, event/user ids) by i*SHIFT, so join
fan-outs and group cardinalities scale exactly linearly.

Usage:
    python tools/scale_datagen.py <src_sf_dir> <dst_dir> [copies=10]
"""

from __future__ import annotations

import os
import sys

SHIFT = 1 << 40  # far above any real key

DIMS = ["region", "nation", "supplier", "part", "documents", "embeddings"]
FACT_KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1x"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.session import get_session

    spark = get_session("scale-datagen")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for t in DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"copied dim {t}")

    for t, keys in FACT_KEYS.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        out = None
        for i in range(copies):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            out = c if out is None else out.unionByName(c)
        # spread write parallelism; row-group sizes stay sane
        n = max(8, out.rdd.getNumPartitions())
        out.repartition(n).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"wrote fact {t} x{copies}")

    spark.stop()


if __name__ == "__main__":
    main()
