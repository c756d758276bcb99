"""Generic file-format sources beyond parquet (SURVEY.md §2.1 breadth):
CSV, JSON-lines, and ORC, with the defaults that matter at 100 TB.

The rule all three share: **schema is explicit, never inferred**. CSV
and JSON schema inference each cost a FULL extra pass over the data
before the real job starts (Spark reads everything once just to guess
types) — at 100 TB that is a second 100 TB scan, and inference is also
nondeterministic under data drift (a later file with a stray string
flips a column to string for the whole dataset). Parquet/ORC carry
their schema in the footer, so they need none of this.

All readers return plain DataFrames — every downstream operator in the
engine is format-agnostic from here."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "orc", "csv", "json", "xml")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Text formats (csv/json) REQUIRE a
    schema (see module docstring); csv defaults to header=true and
    mode=FAILFAST — silently null-ing malformed rows (PERMISSIVE) is
    how a 100 TB load hides corruption until a downstream aggregate is
    quietly wrong. Pass mode='PERMISSIVE' plus a
    columnNameOfCorruptRecord explicitly if quarantining is wanted."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    if fmt in ("csv", "json", "xml") and schema is None:
        raise ValueError(
            f"{fmt} requires an explicit schema: inference costs a full "
            "extra pass over the data and is nondeterministic under drift"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        opts = {"header": "true", "mode": "FAILFAST"}
        opts.update(options)
        options = opts
    elif fmt == "json":
        opts = {"mode": "FAILFAST"}
        opts.update(options)
        options = opts
    elif fmt == "xml":
        # Spark 4 native XML source (no external package): rowTag is
        # mandatory context — default to the writer's choice below
        opts = {"rowTag": "row", "mode": "FAILFAST"}
        opts.update(options)
        options = opts
    return reader.options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Write ``df`` as ``fmt``. CSV writes a header; both text formats
    compress (gzip) by default — uncompressed text at scale wastes
    several-fold storage AND scan time. Note gzip text files are
    NON-SPLITTABLE: one file = one read task, so pair text exports with
    a sensible partition count upstream; columnar formats (parquet/orc)
    remain the only sane interchange at 100 TB."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        opts = {"header": "true", "compression": "gzip"}
        opts.update(options)
        options = opts
    elif fmt == "json":
        opts = {"compression": "gzip"}
        opts.update(options)
        options = opts
    elif fmt == "xml":
        opts = {"rootTag": "rows", "rowTag": "row", "compression": "gzip"}
        opts.update(options)
        options = opts
    writer.options(**options).save(path)


def convert_table(
    spark: SparkSession,
    src_path: str,
    src_fmt: str,
    dst_path: str,
    dst_fmt: str,
    schema: StructType | str | None = None,
) -> int:
    """Format migration (e.g. legacy CSV landing zone -> parquet lake):
    one distributed read + write, row count returned for a cheap load
    audit. The count rides the same job via a cached plan."""
    df = read_table(spark, src_path, src_fmt, schema=schema)
    df = df.persist()
    try:
        n = df.count()
        write_table(df, dst_path, dst_fmt)
    finally:
        df.unpersist()
    return n
