"""Dump `.explain("formatted")` for the given queries to files — the
plans/r16/<query>_{before,after}.txt evidence the optimization rounds
commit (run once from a pre-change worktree with suffix `before`, once
from the optimized tree with suffix `after`).

Usage: PYTHONPATH=. python tools/dump_plans.py OUT_DIR SUFFIX QUERY[,QUERY...] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from evidence_images_etl_airflow_spark import caching  # noqa: E402
from evidence_images_etl_airflow_spark import workload as W  # noqa: E402
from evidence_images_etl_airflow_spark.session import get_session  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    queries = sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("plans-" + suffix)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for q in queries:
        caching.release_all(spark, hard=True)
        df = W.REGISTRY[q].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{q}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{q}: {len(plan)} bytes -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
