"""Diagnostic probe for the prefix-filter VERIFY stage width (r14):
builds the operator's cached inputs ONCE (shingle table, canon
arrays, candidate pairs) in a single JVM, then times ONLY the verify
join at several explicit widths — isolating the exchange-width effect
from everything the interleaved A/B mixes in (host window, candidate
generation, stats passes).

Usage: PYTHONPATH=. python tools/probe_verify_width.py SF_DIR [widths]
       widths default: stock,advised,256,1024
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from evidence_images_etl_airflow_spark import caching  # noqa: E402
from evidence_images_etl_airflow_spark.operators import dedup  # noqa: E402
from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1].rstrip("/")
    n, threshold = 4, 0.6
    spark = get_session("probe-verify")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")

    t0 = time.time()
    sh = caching.materialize(dedup._doc_shingles(d, "doc_id", "text", n))
    n_parts = dedup._advise_shingle_shuffle_width(sh, 16 << 20)
    print(f"advised corpus width: {n_parts}  ({time.time()-t0:.1f}s)")

    sh2 = sh.repartition(n_parts, "shingle")
    freq = sh2.groupBy("shingle").agg(F.count("*").alias("df_"))
    attached = sh2.join(freq, "shingle").repartition(n_parts, "id")
    arr = (
        attached.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("df_", "shingle"))).alias("a"))
        .select(
            "id",
            F.transform("a", lambda s: s["shingle"]).alias("shingles"),
            F.size("a").alias("sz"),
        )
    )
    arr = caching.materialize(arr)
    t0 = time.time()
    per_doc_bytes = F.aggregate(
        "shingles", F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.length(x) + F.lit(20),
    )
    st = arr.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(per_doc_bytes).alias("avg_doc_bytes"),
    ).first()
    print(f"docs={st['n_docs']} avg_doc_bytes={st['avg_doc_bytes']:.0f}"
          f"  ({time.time()-t0:.1f}s arr-build+stats)")

    t_dec = F.lit(threshold).cast("decimal(12,9)")
    need = F.ceil(t_dec * F.col("sz")).cast("int")
    prefix = arr.select(
        "id", "sz",
        F.explode(
            F.slice(F.col("shingles"), F.lit(1), F.col("sz") - need + F.lit(1))
        ).alias("shingle"),
    ).repartition(n_parts, "shingle")
    a = prefix.select(F.col("id").alias("id_a"), "shingle", F.col("sz").alias("sz_a"))
    b = prefix.select(F.col("id").alias("id_b"), "shingle", F.col("sz").alias("sz_b"))
    cand = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.greatest("sz_a", "sz_b").cast("decimal(20,0)")
            * F.lit(threshold).cast("decimal(12,9)")
            <= F.least("sz_a", "sz_b").cast("decimal(20,0)")
        )
        .select("id_a", "id_b")
        .distinct()
    )
    cand = caching.materialize(cand)
    t0 = time.time()
    n_cand = cand.count()
    print(f"n_cand={n_cand}  ({time.time()-t0:.1f}s cand build)")

    avg_doc_bytes = max(1, int(st["avg_doc_bytes"]))
    verify_target = 4 * (16 << 20)
    v_auto = max(
        n_parts,
        min(200_000, (n_cand * 2 * avg_doc_bytes + verify_target - 1)
            // verify_target),
    )
    print(f"formula verify width: {v_auto}")

    widths = sys.argv[2].split(",") if len(sys.argv) > 2 else [
        "stock", "advised", "256", "1024",
    ]

    def verify(c):
        half = c.join(
            arr.select(F.col("id").alias("id_a"),
                       F.col("shingles").alias("sh_a"),
                       F.col("sz").alias("sz_a")),
            "id_a",
        )
        return half

    for w in widths:
        c = cand
        if w == "stock":
            half = verify(c)
        else:
            vw = v_auto if w == "advised" else int(w)
            c = c.repartition(vw, "id_a")
            half = verify(c).repartition(vw, "id_b")
        out = (
            half.join(
                arr.select(F.col("id").alias("id_b"),
                           F.col("shingles").alias("sh_b"),
                           F.col("sz").alias("sz_b")),
                "id_b",
            )
            .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn(
                "jaccard",
                F.round(F.col("inter")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b")
        )
        t0 = time.time()
        rows = out._jdf.queryExecution().executedPlan().execute().count()
        print(f"VERIFY width={w:>8}: {time.time()-t0:8.2f}s  rows={rows}",
              flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
