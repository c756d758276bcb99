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
from evidence_images_etl_airflow_spark.operators.asof import (  # noqa: F401
    asof_join_backward,
)
from evidence_images_etl_airflow_spark.operators.range_join import (  # noqa: F401
    range_join,
)
from evidence_images_etl_airflow_spark.operators.dedup import (  # noqa: F401
    connected_components,
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from evidence_images_etl_airflow_spark.operators.similarity import (  # noqa: F401
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
