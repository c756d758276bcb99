"""Relational operators: the reference's projection / filter / union /
upsert surface (SURVEY.md §2.2-2.5) plus the training-data-pipeline
extensions (dedup, similarity search — §7 M7)."""

from evidence_images_etl_airflow_spark.operators.projection import (  # noqa: F401
    filter_columns,
)
from evidence_images_etl_airflow_spark.operators.filters import (  # noqa: F401
    non_empty_rows,
)
from evidence_images_etl_airflow_spark.operators.union import concat_dfs  # noqa: F401
