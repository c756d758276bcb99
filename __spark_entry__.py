"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in
``evidence_images_etl_airflow_spark.workload`` — one entry per
implemented operator from SURVEY.md §2 plus the §7 M7 extensions
(dedup / similarity / multimodal / text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from evidence_images_etl_airflow_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the EP2 image_urls
    analog (join J1 + filter P3 + to_date T6 + split T4/element_at T7
    — the reference's richest single statement, SURVEY.md §3 EP2)."""
    return workload.flagship_image_urls(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7."""
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops
    (HLL sketches) are omitted → driver runs the rows-only check."""
    return workload.oracle_sql()
