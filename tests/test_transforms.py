"""Unit tests for the T1-T9 scalar/array surface (SURVEY.md §2.4),
golden outputs per FIXTURES.md §7's edge-case checklist."""

import datetime as dt

from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.functions.transforms import (
    coerce_bool_columns_to_int,
    coerce_bool_strings,
    first_element,
    fold_concat,
    normalize_nat,
    qualify_urls,
    session_date,
    session_length_seconds,
    split_names,
)


def test_coerce_bool_strings_mixed_column(spark):
    df = spark.createDataFrame(
        [("True",), ("False",), ("1",), ("other",), (None,)], "v string"
    )
    out = [r.v for r in coerce_bool_strings(df).orderBy(F.monotonically_increasing_id()).collect()]
    assert out == ["1", "0", "1", "other", None]


def test_coerce_bool_columns_to_int(spark):
    df = spark.createDataFrame(
        [("True",), ("False",), ("1",), ("0",), ("junk",), (None,)], "v string"
    )
    res = coerce_bool_columns_to_int(df, ["v"])
    assert dict(res.dtypes)["v"] == "int"
    vals = [r.v for r in res.collect()]
    assert vals == [1, 0, 1, 0, None, None]


def test_split_single_and_multi(spark):
    df = spark.createDataFrame([("a.jpg",), ("a.jpg,b.jpg",), (None,)], "n string")
    out = [r.arr for r in df.select(split_names("n").alias("arr")).collect()]
    assert out[0] == ["a.jpg"]  # single name -> 1-element list (ref :248)
    assert out[1] == ["a.jpg", "b.jpg"]
    assert out[2] is None


def test_qualify_urls_concat(spark):
    df = spark.createDataFrame([("http://x/", ["a.jpg", "b.jpg"])], "url string, names array<string>")
    out = df.select(qualify_urls("url", "names").alias("u")).collect()[0].u
    assert out == ["http://x/a.jpg", "http://x/b.jpg"]


def test_session_date_and_first_element(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2023, 8, 16, 23, 50), ["n1", "n2"])], "ts timestamp, arr array<string>"
    )
    row = df.select(
        session_date("ts").alias("d"), first_element("arr").alias("f")
    ).collect()[0]
    assert row.d == dt.date(2023, 8, 16)
    assert row.f == "n1"  # 1-indexed like Postgres arr[1]


def test_session_length_seconds(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2023, 8, 16, 10, 0), dt.datetime(2023, 8, 16, 10, 30))],
        "a timestamp, b timestamp",
    )
    v = df.select(session_length_seconds("b", "a").alias("s")).collect()[0].s
    assert v == 1800.0


def test_normalize_nat_nan_to_null(spark):
    df = spark.createDataFrame([(1.0,), (float("nan"),), (None,)], "x double")
    vals = [r.x for r in normalize_nat(df).collect()]
    assert vals == [1.0, None, None]


def test_fold_concat(spark):
    df = spark.createDataFrame([("math", "physics")], "a string, b string")
    assert df.select(fold_concat(["a", "b"]).alias("c")).collect()[0].c == "math and physics"
