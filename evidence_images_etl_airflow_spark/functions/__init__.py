"""Column-expression library: the reference's scalar/array surface
(SURVEY.md §2.4) plus text-analysis and vector helpers for the
large-scale training-data extensions (§7 M7)."""

from evidence_images_etl_airflow_spark.functions.transforms import (  # noqa: F401
    coerce_bool_strings,
    cast_all_to_string,
    normalize_nat,
    split_names,
    qualify_urls,
    session_date,
    first_element,
    session_length,
    fold_concat,
)
