"""Sources: pruned parquet scans (S1-S5), JDBC reads (S6), and
file-arrival sensors (S7/S8) — SURVEY.md §2.1."""

from evidence_images_etl_airflow_spark.sources.parquet_source import (  # noqa: F401
    date_window,
    scan_parquet,
    scan_sources,
    SourceConfig,
)
