"""Interleaved A/B: plan_join_chain pre-flight statistics gathered as
ONE unioned action (current head, 62819c9) vs the r16 4-worker driver
pool vs fully sequential — isolated on exactly ep5's 7 statistics
(3 exact edge pricings + 4 table counts over the sf0.1 mart chain).
Legs alternate in one JVM (the ab_r16.py protocol) so all sample the
same host noise; the rest of the ep5 query is identical either way,
so this measures the only part 62819c9 changed.

Usage: PYTHONPATH=. python tools/ab_preflight_r17.py [reps] [sf_dir]
"""

from __future__ import annotations

import functools
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, ".")

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from evidence_images_etl_airflow_spark.operators.joins import (  # noqa: E402
    _estimate_join_rows_df,
    estimate_join_rows,
)
from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402


def _tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("ok"), F.col("l_extendedprice").alias("rev")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("ck")
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")
    )
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").alias("nk"), F.col("n_name").alias("nation")
    )
    tables = {"lineitem": li, "orders": orders, "customer": cust, "nation": nat}
    edges = [
        ("lineitem", "orders", "ok"),
        ("orders", "customer", "ck"),
        ("customer", "nation", "nk"),
    ]
    return tables, edges


def leg_union(tables, edges):
    stat_frames = [
        _estimate_join_rows_df(tables[a], tables[b], k).select(
            F.lit(f"e:{a}*{b}").alias("__k"), F.col("n")
        )
        for a, b, k in edges
    ] + [
        df.agg(F.count("*").cast("bigint").alias("n")).select(
            F.lit("t:" + t).alias("__k"), F.col("n")
        )
        for t, df in tables.items()
    ]
    return {
        r["__k"]: int(r["n"])
        for r in functools.reduce(DataFrame.unionByName, stat_frames).collect()
    }


def leg_pool(tables, edges):
    with ThreadPoolExecutor(max_workers=4) as pool:
        edge_futs = {
            f"e:{a}*{b}": pool.submit(estimate_join_rows, tables[a], tables[b], k)
            for a, b, k in edges
        }
        count_futs = {"t:" + t: pool.submit(df.count) for t, df in tables.items()}
        out = {lbl: int(f.result()) for lbl, f in edge_futs.items()}
        out.update({lbl: int(f.result()) for lbl, f in count_futs.items()})
    return out


def leg_seq(tables, edges):
    out = {
        f"e:{a}*{b}": estimate_join_rows(tables[a], tables[b], k)
        for a, b, k in edges
    }
    out.update({"t:" + t: df.count() for t, df in tables.items()})
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_session("ab-preflight-r17")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tables, edges = _tables(spark, sf_dir)
    legs = {"union": leg_union, "pool": leg_pool, "seq": leg_seq}
    # warm-up each leg once; also assert identical statistics
    base = None
    for name, fn in legs.items():
        got = fn(tables, edges)
        if base is None:
            base = got
        assert got == base, f"{name} stats differ: {got} vs {base}"
    times: dict[str, list[float]] = {n: [] for n in legs}
    for _ in range(reps):
        for name, fn in legs.items():
            t0 = time.perf_counter()
            fn(tables, edges)
            times[name].append(round(time.perf_counter() - t0, 3))
    for name, ts in times.items():
        print(
            f"{name:6s} med={statistics.median(ts):7.3f} min={min(ts):7.3f}  {ts}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
