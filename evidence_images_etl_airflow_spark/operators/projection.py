"""P1 — case-insensitive column projection (SURVEY.md §2.2).

The reference deletes every column whose lowercased name is not in the
keep-list (common_helpers/filter_columns.py:1-14), applied with an
11-column IRMQ list and a 23-column session list
(evidence_images_processing.py:366-405). In Spark this is a plain
``select`` — which, unlike the reference's post-download delete,
Catalyst pushes into the parquet scan so non-kept columns are never
read off disk (column pruning; SURVEY §4.1).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame


def filter_columns(
    df: DataFrame,
    columns_to_keep: Iterable[str],
    strict: bool = False,
) -> DataFrame:
    """Keep exactly the columns in ``columns_to_keep``, matched
    case-insensitively (filter_columns.py:10), preserving the
    DataFrame's own column order and casing — the reference mutates the
    frame in place with ``del df[col]``, which keeps source order/casing.

    Keep-list entries absent from the frame are ignored (the reference
    tolerates files with missing columns; the later union null-fills
    them) unless ``strict``.
    """
    keep_lower = {c.lower() for c in columns_to_keep}
    if strict:
        have = {c.lower() for c in df.columns}
        missing = sorted(keep_lower - have)
        if missing:
            raise ValueError(f"columns missing from input: {missing}")
    kept = [c for c in df.columns if c.lower() in keep_lower]
    return df.select(*kept)
