"""P1/P2/U1 operator tests (SURVEY.md §2.2-2.3)."""

import pytest
from pyspark.sql import types as T

from evidence_images_etl_airflow_spark import schemas
from evidence_images_etl_airflow_spark.operators.filters import non_empty_rows
from evidence_images_etl_airflow_spark.operators.projection import filter_columns
from evidence_images_etl_airflow_spark.operators.union import concat_dfs


def test_filter_columns_case_insensitive(irmq_raw):
    out = filter_columns(irmq_raw, [c.upper() for c in schemas.IRMQ_KEEP])
    assert "_extra_junk_col" not in out.columns
    assert len(out.columns) == 11
    # original casing preserved (reference deletes in place)
    assert "SessionUID" in out.columns


def test_filter_columns_strict_raises(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError):
        filter_columns(df, ["a", "missing"], strict=True)


def test_non_empty_rows_drops_empty_string(irmq_raw):
    out = non_empty_rows(irmq_raw, "EvidenceImageURL")
    urls = [r.EvidenceImageURL for r in out.collect()]
    assert "" not in urls
    assert out.count() == irmq_raw.count() - 1


def test_concat_dfs_null_fills_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "k int, a string")
    b = spark.createDataFrame([(2, "y")], "k int, b string")
    out = concat_dfs([a, b])
    assert set(out.columns) == {"k", "a", "b"}
    rows = {r.k: (r.a, r.b) for r in out.collect()}
    assert rows[1] == ("x", None)
    assert rows[2] == (None, "y")


def test_concat_dfs_empty_list(spark):
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    out = concat_dfs([], spark=spark, empty_schema=schema)
    assert out.count() == 0
    assert out.columns == ["k"]
