"""U1 — multi-source union (SURVEY.md §2.3).

The reference concatenates the per-country pandas frames with
``pd.concat`` (common_helpers/concat_dfs.py:2-16), which aligns by
column *name* and null-fills columns missing from some inputs — so the
Spark translation is ``unionByName(allowMissingColumns=True)``, NOT the
positional ``union``. An empty input list returns an empty frame
(concat_dfs.py:15-16).

At scale prefer giving all paths to ONE ``spark.read.parquet(*paths)``
call (sources.parquet_source.scan_parquet) — a single scan with
partition-discovery parallelism beats N scans + union; this operator
exists for heterogeneous inputs that cannot share a reader.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def concat_dfs(
    dfs_list: Sequence[DataFrame],
    spark: SparkSession | None = None,
    empty_schema: T.StructType | None = None,
) -> DataFrame:
    """Union-by-name with null-fill for missing columns; empty list ->
    empty DataFrame (with ``empty_schema`` if given, else zero columns),
    mirroring concat_dfs.py:15-16."""
    dfs = [df for df in dfs_list if df is not None]
    if not dfs:
        if spark is None:
            raise ValueError("empty dfs_list requires a SparkSession to build an empty frame")
        return spark.createDataFrame([], empty_schema or T.StructType([]))
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
