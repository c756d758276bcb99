"""Graph-growing scale corpus for the triangle/pagerank probes
(VERDICT r16 item 7): the stock fact-replication generator
(scale_datagen.py) shifts ORDER keys only, so the co-purchase part
graph collapses back to sf0.1's 20k-node graph under distinct — a
"10x" triangle point measured only the pre-distinct scan (SCALING.md
round-9 protocol note). This generator shifts EVERY graph-bearing key
(l_orderkey, l_partkey, l_suppkey; o_orderkey, o_custkey), so copy
i's orders reference copy i's parts/suppliers/customers: both the
co-purchase graph (graph_triangle_stats, nodes = partkeys) and the
bipartite customer-supplier graph (graph_pagerank_bipartite) become
N DISJOINT COPIES of the sf0.1 graph — nodes, edges, wedges and
triangles all scale exactly N x while every per-copy structural
property (degree distribution, orientation bound, rank mass per
copy) is preserved. Only lineitem and orders feed the two graph
queries; the other tables are copied unchanged so the directory is
loadable by any query.

Usage: python tools/scale_graph_datagen.py <src_sf_dir> <dst_dir> [copies=10]
"""

from __future__ import annotations

import os
import sys

SHIFT = 1 << 40  # far above any real key

COPY_UNCHANGED = [
    "region", "nation", "supplier", "customer", "part", "documents",
    "embeddings", "events",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sfgraph10x"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.session import get_session

    spark = get_session("scale-graph-datagen")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    for t in COPY_UNCHANGED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
        print(f"copied {t}")

    shifted = {
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    }
    for t, keys in shifted.items():
        base = spark.read.parquet(f"{src}/{t}.parquet")
        out = None
        for i in range(copies):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            out = c if out is None else out.unionByName(c)
        n = max(8, out.rdd.getNumPartitions())
        out.repartition(n).write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"wrote {t} x{copies} (shifted {keys})")

    spark.stop()


if __name__ == "__main__":
    main()
