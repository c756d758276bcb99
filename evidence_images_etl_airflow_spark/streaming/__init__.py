"""Structured Streaming analogs of the reference's sensor-driven
ingestion (SURVEY.md §2.1 S7/S8, §7 M6)."""

from evidence_images_etl_airflow_spark.streaming.file_stream import (  # noqa: F401
    ingest_available_now,
    windowed_counts,
)
