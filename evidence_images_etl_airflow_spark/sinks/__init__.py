"""Sinks: validated append, idempotent conflict-skip upsert, and
staging+MERGE writers (SURVEY.md §2.7, §4.3)."""

from evidence_images_etl_airflow_spark.sinks.postgres import (  # noqa: F401
    PG_DIALECT,
    create_table_sql,
    insert_on_conflict_sql,
    merge_sql,
    mssql_keyed_update_sql,
    staged_merge_statements,
)
from evidence_images_etl_airflow_spark.sinks.writers import (  # noqa: F401
    validate_varchar_lengths,
    VarcharOverflowError,
    append_parquet,
    idempotent_append_parquet,
    merge_into_parquet,
)
