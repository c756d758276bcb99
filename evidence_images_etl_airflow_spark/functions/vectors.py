"""Vector column expressions for embedding similarity (SURVEY.md §7 M7).

Embeddings live as ``array<float>`` columns. All arithmetic here uses
``zip_with`` + a sequential ``aggregate`` fold in DOUBLE precision —
JVM-side, codegen'd, and order-deterministic, which is what lets the
DuckDB oracle reproduce the numbers exactly (same left-to-right fp
addition order). A Pandas-UDF path would be faster per-row for huge
dims but non-reproducible bit-for-bit; 64-dim folds are cheap.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _d(col: str | Column) -> Column:
    """array<float> -> array<double> so folds accumulate in double."""
    return _c(col).cast("array<double>")


def dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity; NULL if either side has zero norm."""
    n = norm(a) * norm(b)
    return F.when(n > 0, dot(a, b) / n)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded Gaussian hyperplanes for sign-LSH, rounded to 6dp so the
    literal values embedded in Spark expressions and in oracle SQL are
    the identical finite decimals."""
    rng = np.random.default_rng(seed)
    return [[round(float(v), 6) for v in row] for row in rng.standard_normal((n_planes, dim))]


def hyperplane_signature(col: str | Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket key: one char per hyperplane, '1' if dot(v, h) >= 0
    else '0'. Nearby vectors collide with high probability; the bucket
    string is a join key for candidate generation (similarity.lsh_topk,
    dedup.embedding_near_dups)."""
    bits = []
    for plane in planes:
        p = F.array(*[F.lit(v) for v in plane])
        bits.append(F.when(dot(col, p) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)
