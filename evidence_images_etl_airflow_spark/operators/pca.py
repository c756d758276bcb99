"""Distributed PCA / whitening for embedding columns.

The standard preprocessing pass over a 100 TB embedding corpus before
indexing or similarity work: center, rotate onto the principal axes,
optionally whiten (unit variance per axis — which turns Euclidean/
cosine geometry isotropic and measurably improves retrieval for
anisotropic embedding models), and truncate to the top-k axes (the
spectral cousin of matryoshka truncation: optimal linear compression
for THIS corpus rather than trusting the model's coordinate order).

Scale decomposition (the only shape that works at 100 TB):
1. PARTIAL MOMENTS, one pass, Arrow-batched: each partition reduces to
   (n, sum x, sum outer(x, x)) — d + d^2 doubles — inside
   ``mapInPandas``; nothing row-sized ever leaves an executor.
2. DRIVER SOLVE, bounded: the per-partition moment rows (O(partitions),
   collected sorted so the float fold order is fixed) sum to the d x d
   covariance; ``numpy.linalg.eigh`` on a 64 x 64 symmetric matrix is
   microseconds. Eigenvector SIGN is normalized (largest-|component|
   coordinate made positive) so the basis is unique.
3. BROADCAST PROJECT, JVM-side: the k component vectors become literal
   arrays in a zip_with/aggregate dot-product expression
   (functions/vectors idiom) — centering + rotation + optional
   1/sqrt(eigenvalue) scaling run in whole-stage codegen, no Python in
   the projection path.

Float caveat, stated honestly: covariance entries are partition-order
float sums, so the low bits of eigenvalues/projections are not
engine-portable. The workload query therefore verifies THEOREMS
(orthonormal basis, descending spectrum, unit whitened variance,
centered projections, row preservation) rather than hash-comparing
floats — same discipline as the MLlib ops (ml_curation.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(df: DataFrame, vec_col: str, dim: int) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, covariance) of an ``array<float/double>`` column.
    One distributed pass reducing each partition to its moment triple;
    driver-side combination is O(partitions x d^2) and order-fixed.
    Population covariance (divide by n) — the solve's scaling choice,
    matched by the whitened-variance check."""
    out_schema = (
        "pidx long, n long, s array<double>, m array<double>"
    )

    def part(it):
        import pandas as pd

        n = 0
        s = np.zeros(dim)
        m = np.zeros((dim, dim))
        pidx = -1
        for pdf in it:
            if len(pdf):
                X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
                n += len(X)
                s += X.sum(axis=0)
                m += X.T @ X
                pidx = int(pdf["__pid"].iloc[0])
        if n:
            yield pd.DataFrame(
                [{"pidx": pidx, "n": n, "s": list(s), "m": list(m.ravel())}]
            )

    rows = (
        df.select(F.spark_partition_id().alias("__pid"), vec_col)
        .mapInPandas(part, out_schema)
        .collect()
    )
    rows.sort(key=lambda r: r.pidx)  # fixed fold order across runs
    n = sum(r.n for r in rows)
    s = np.sum([np.array(r.s) for r in rows], axis=0)
    m = np.sum([np.array(r.m).reshape(dim, dim) for r in rows], axis=0)
    mean = s / n
    cov = m / n - np.outer(mean, mean)
    return n, mean, cov


def pca_components(cov: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k (eigenvalues desc, components as rows) of a symmetric
    covariance, sign-normalized: each component's largest-|coordinate|
    entry is positive, making the basis unique (eigh's signs are
    arbitrary)."""
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return vals[order], comps


def project_embeddings(
    df: DataFrame,
    vec_col: str,
    mean: np.ndarray,
    components: np.ndarray,
    eigenvalues: np.ndarray | None = None,
    eps: float = 1e-9,
    out_col: str = "proj",
) -> DataFrame:
    """Append ``out_col`` = the centered (optionally whitened)
    projection onto ``components`` — pure JVM column expressions: the
    mean and each component embed as literal arrays, each output
    coordinate is one zip_with/aggregate dot-product fold. No Python
    in the hot path; the scan stays whole-stage-codegen'd."""
    mean_lit = F.array(*[F.lit(float(v)) for v in mean])
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"), mean_lit, lambda x, mu: x - mu
    )
    coords = []
    for i, comp in enumerate(components):
        c_lit = F.array(*[F.lit(float(v)) for v in comp])
        dot = F.aggregate(
            F.zip_with(centered, c_lit, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        if eigenvalues is not None:
            dot = dot / F.lit(float(np.sqrt(eigenvalues[i] + eps)))
        coords.append(dot)
    return df.withColumn(out_col, F.array(*coords))


def embedding_drift_profile(
    df: "DataFrame",
    vec_col: str,
    vintage_col: "F.Column",
) -> "DataFrame":
    """Per-dimension drift profile between two vintages of an
    embedding corpus (r11): the vector-space counterpart of the scalar
    PSI monitors (profile_drift_psi) — when the embedding MODEL or the
    upstream corpus shifts, retrieval quality degrades silently unless
    the embedding distribution itself is watched. ``vintage_col`` must
    evaluate to 0/1 (old/new). Output, one row per dimension: counts,
    per-vintage means and variances, and the absolute mean shift, plus
    ``z_shift`` — the two-sample z statistic of the mean difference
    (shift / sqrt(var_a/n_a + var_b/n_b)), the dimension-level alarm
    dial.

    Exactness discipline: elements round to 6dp and accumulate as
    DECIMAL(18,6) (the order-independent float-sum idiom), so the sums
    are bit-identical across engines/partitionings; means/variances
    are then single IEEE double ops on identical inputs.

    Scale shape (100 TB): posexplode feeds a map-side-combinable
    aggregation onto ``dim`` keys — each partition reduces to <= dim
    rows before the exchange, so the shuffle carries O(partitions x
    dim) rows no matter how many vectors scanned. No join, no window,
    no Python."""
    x = df.select(
        vintage_col.cast("int").alias("__vin"),
        F.posexplode(vec_col).alias("dim", "__v0"),
    ).select(
        "__vin",
        F.col("dim").cast("bigint").alias("dim"),
        F.col("__v0").cast("double").alias("__v"),
    )
    d6 = F.round(F.col("__v"), 6).cast("decimal(18,6)")
    s6 = F.round(F.col("__v") * F.col("__v"), 6).cast("decimal(18,6)")

    def _side(v: int, e):
        return F.sum(F.when(F.col("__vin") == v, e))

    per = x.groupBy("dim").agg(
        F.sum(F.when(F.col("__vin") == 0, 1).otherwise(0))
        .cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("__vin") == 1, 1).otherwise(0))
        .cast("bigint").alias("n_b"),
        _side(0, d6).alias("__sa"),
        _side(1, d6).alias("__sb"),
        _side(0, s6).alias("__qa"),
        _side(1, s6).alias("__qb"),
    )
    mean_a = F.round(F.col("__sa").cast("double") / F.col("n_a"), 6)
    mean_b = F.round(F.col("__sb").cast("double") / F.col("n_b"), 6)
    out = per.select(
        "dim", "n_a", "n_b",
        mean_a.alias("mean_a"), mean_b.alias("mean_b"),
        F.round(F.col("__qa").cast("double") / F.col("n_a"), 6).alias("__m2a"),
        F.round(F.col("__qb").cast("double") / F.col("n_b"), 6).alias("__m2b"),
    )
    # clamp at 0: 6dp rounding can push m2 - mean^2 slightly negative
    # for near-constant dimensions, and sqrt(negative) would NaN the
    # z_shift while the oracle engine diverges (ADVICE r11). The
    # oracle applies the identical greatest(..., 0).
    var_a = F.greatest(
        F.round(F.col("__m2a") - F.col("mean_a") * F.col("mean_a"), 6),
        F.lit(0.0),
    )
    var_b = F.greatest(
        F.round(F.col("__m2b") - F.col("mean_b") * F.col("mean_b"), 6),
        F.lit(0.0),
    )
    out = out.select(
        "dim", "n_a", "n_b", "mean_a", "mean_b",
        F.round(F.abs(F.col("mean_a") - F.col("mean_b")), 6).alias("mean_shift"),
        var_a.alias("var_a"),
        var_b.alias("var_b"),
    )
    se = F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b"))
    return out.select(
        "*",
        F.round(
            F.col("mean_shift") / F.nullif(se, F.lit(0.0)), 4
        ).alias("z_shift"),
    )
