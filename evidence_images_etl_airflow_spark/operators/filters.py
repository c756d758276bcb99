"""P2-P4 — row filters (SURVEY.md §2.2).

All plain Catalyst predicates; when applied directly after a scan they
push down into the parquet reader (row-group skipping) — the reference
applies them only after full download + transform
(evidence_images_processing.py:416).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def non_empty_rows(df: DataFrame, column: str = "EvidenceImageURL") -> DataFrame:
    """P2: keep rows with a non-empty-string image URL
    (evidence_images_processing.py:147-150). The reference compares
    ``!= ''`` only, so NULLs are *dropped* too (pandas NaN != '' is
    True, but in SQL NULL != '' is NULL -> row dropped; the reference's
    source encodes missing as '' so the distinction never bites there).
    We match the SQL semantics: NULL and '' both removed, documented.
    """
    return df.filter(F.col(column) != "")


def status_filter(df: DataFrame, column: str = "sessionstatus", value: str = "Complete") -> DataFrame:
    """P3: ``WHERE s.sessionstatus = 'Complete'`` (add_image_data.py:50)."""
    return df.filter(F.col(column) == value)


def multi_value_rows(column: str, delim: str = ",") -> Column:
    """P4: the commented-out ``LIKE '%,%'`` predicate
    (evidence_images_processing.py:234) — rows whose name field holds a
    delimited list."""
    return F.col(column).contains(delim)
