"""SparkSession factory (SURVEY.md §7 M0).

The reference runs single-process pandas inside Celery workers
(docker-compose.yaml:119-139); here one SparkSession owns the whole
pipeline. Defaults are tuned so the same code runs on local[N] for
tests and scales to a multi-executor cluster unchanged:

- AQE on: runtime re-plan (coalesce post-shuffle partitions, skew-join
  splitting, dynamic broadcast) — essential at 100 TB where static
  planning guesses wrong.
- shuffle.partitions sized to the local core count for tests; on a real
  cluster leave it to AQE's coalescing (initialPartitionNum high).
- UTC session timezone so timestamp semantics match the DuckDB oracle
  and are stable across executor locales.
- Arrow enabled for the pandas boundary (the only place the reference's
  pyarrow usage survives — blob_ingestion.py:25-27 is otherwise
  replaced by Spark's native vectorized parquet reader).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "evidence-images-spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the engine's SparkSession.

    On a cluster, ``master`` comes from spark-submit and the local[...]
    default is ignored; every other setting below is cluster-safe.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # --- planner / optimizer ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.partitions", str(cpus))
        # --- semantics ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.caseSensitive", "false")  # reference matches
        # columns case-insensitively (filter_columns.py:10)
        # --- python boundary ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- local-mode ergonomics ---
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
