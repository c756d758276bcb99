"""EP1 — the main evidence-images pipeline (SURVEY.md §3 EP1).

The reference runs this as 29 Airflow tasks serializing whole pandas
frames through XCom between every step
(evidence_images_processing.py:298-425). Here it is ONE lazy plan per
target table:

    scan (pruned, multi-path) -> unionByName -> case-insensitive
    projection -> bool coercion -> empty-URL filter -> split ->
    URL-qualify -> conflict-skip upsert write

The two post-processing UPDATE passes (T4 split at :230-260, T5
URL-qualify at :262-289 — each a full read-back of the target in the
reference) are fused *upstream* of the write: both derived arrays are
pure functions of columns already in flight (SURVEY §4.1
redundant-pass elimination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark import schemas
from evidence_images_etl_airflow_spark.functions.transforms import (
    coerce_bool_columns_to_int,
    qualify_urls,
    session_length,
    split_names,
)
from evidence_images_etl_airflow_spark.operators.filters import non_empty_rows
from evidence_images_etl_airflow_spark.operators.projection import filter_columns


def _lowercase_columns(df: DataFrame) -> DataFrame:
    """Source casing -> DB casing: the reference's keep-lists are source
    cased while the DDL is lowercase; matching is case-insensitive
    (filter_columns.py:10). Normalizing once keeps output schemas
    deterministic."""
    return df.select([F.col(c).alias(c.lower()) for c in df.columns])


def transform_evidence_images(raw: DataFrame) -> DataFrame:
    """Raw IRMQ export -> evidence_images shape (pre-write).

    Mirrors tasks at evidence_images_processing.py:404-425 in one plan:
    P1 projection (:366-378,404), T1 coercion (:408-410), P2 row filter
    (:416), then the fused T4 split (:248) and T5 URL-qualify (:278-284).
    """
    df = filter_columns(raw, schemas.IRMQ_KEEP)  # P1
    df = _lowercase_columns(df)
    df = coerce_bool_columns_to_int(df, ["reexportstatus", "reprocessedstatus"])  # T1
    df = non_empty_rows(df, "evidenceimageurl")  # P2
    df = df.withColumn(
        "formattedevidenceimagename", split_names("evidenceimagename")  # T4
    ).withColumn(
        "formattedevidenceimageurl",
        qualify_urls("evidenceimageurl", "formattedevidenceimagename"),  # T5
    )
    # order columns to the target DDL (evidence_images_processing.py:46-62)
    return df.select([f.name for f in schemas.EVIDENCE_IMAGES.fields])


# source-casing -> sessions-DDL column renames
# (keep-list :379-403 vs DDL :81-106)
_SESSION_RENAMES = {
    "sessionuid": "sessionuid",
    "sessionstartdatetime": "session_start_date",
    "sessionenddatetime": "session_end_date",
    "programid": "program_id",
    "programname": "program_name",
    "programitemid": "program_item_id",
    "programitemname": "program_item_name",
    "clientcode": "client_code",
    "subclientcode": "sub_client_code",
    "outletcode": "outlet_code",
    "outletname": "outlet_name",
    "countrycode": "country_code",
    "userid": "user_id",
    "userprofile": "user_profile",
    "sessionstatus": "sessionstatus",
    "latitude": "latitude",
    "longitude": "longitude",
    "cancelcallnote": "cancelcallnote",
    "cancelcallreason": "cancelcallreason",
    "cancelevidenceimageurl": "cancelevidenceimageurl",
    "cancelevidenceimagename": "cancelevidenceimagename",
    "sessionendlatitude": "sessionendlatitude",
    "sessionendlongitude": "sessionendlongitude",
}


def transform_sessions(raw: DataFrame) -> DataFrame:
    """Raw IRSession export -> sessions shape (pre-write), including
    ``session_length`` = end - start, implementing the reference's TODO
    (evidence_images_processing.py:85,:183 — T8)."""
    df = filter_columns(raw, schemas.SESSION_KEEP)  # P1 (:379-405)
    df = _lowercase_columns(df)
    for src, dst in _SESSION_RENAMES.items():
        if src != dst and src in df.columns:
            df = df.withColumnRenamed(src, dst)
    df = df.withColumn(
        "session_length", session_length("session_end_date", "session_start_date")  # T8
    )
    return df.select([f.name for f in schemas.SESSIONS.fields])
