"""Composed end-to-end plans: EP1 (evidence pipeline) and EP2
(image_urls enrichment) — SURVEY.md §3."""

from evidence_images_etl_airflow_spark.plans.image_urls import image_urls  # noqa: F401
from evidence_images_etl_airflow_spark.plans.evidence_pipeline import (  # noqa: F401
    transform_evidence_images,
    transform_sessions,
)
