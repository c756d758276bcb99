"""The sanctioned Python-UDF surface (SURVEY.md §2.9): scalar
``pandas_udf`` and grouped-map ``applyInPandas``, both Arrow-batched.

The rule this module demonstrates: Python enters the plan ONLY when the
semantics are genuinely outside Spark's expression language —
- ``normalize_text_nfkc``: Unicode NFKC normalization (ligatures,
  full-width forms, compatibility characters). Spark SQL has no
  normalization function; for text dedup pipelines, NFKC-before-hash is
  what makes visually-identical strings collide. Scalar pandas_udf:
  one Arrow batch in, one out, no shuffle.
- ``fit_group_trend``: per-key least-squares fit (slope/intercept/R²)
  via numpy on the whole group at once — the grouped-map shape where
  each group needs its own dense-matrix computation. One shuffle on the
  key, then vectorized math per group; the 100 TB caveat is the usual
  grouped-map one: a single group must fit one executor's memory, so
  key cardinality >> executor count and no giant keys (salt or
  pre-aggregate if a key is hot).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

TREND_SCHEMA = "slope double, intercept double, r2 double, n bigint"


@pandas_udf("string")
def normalize_text_nfkc(s: pd.Series) -> pd.Series:
    """NFKC-normalize a string column (vectorized over Arrow batches).
    E.g. 'ﬁ' -> 'fi', full-width 'Ａ' -> 'A', '²' -> '2' — the
    canonicalization step ahead of fingerprinting/dedup."""
    return s.map(lambda x: unicodedata.normalize("NFKC", x) if x is not None else None)


def fit_group_trend(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares trend of ``y_col`` over
    ``x_col`` via ``applyInPandas``: returns (keys..., slope,
    intercept, r2, n). x is mean-centered inside the group before the
    normal equations, so huge x magnitudes (epoch microseconds) don't
    lose precision. Groups of size 1 (or zero x-variance) yield NULL
    slope/intercept/r2 rather than dividing by zero."""
    import numpy as np

    out_schema = (
        ", ".join(f"{k} {dict(df.dtypes)[k]}" for k in key_cols) + ", " + TREND_SCHEMA
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {k: pdf[k].iloc[0] for k in key_cols}
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        n = len(pdf)
        xc = x - x.mean()
        sxx = float(xc @ xc)
        if n < 2 or sxx == 0.0:
            return pd.DataFrame(
                [{**keys, "slope": None, "intercept": None, "r2": None, "n": n}]
            )
        slope = float(xc @ (y - y.mean())) / sxx
        intercept = float(y.mean() - slope * x.mean())
        resid = y - (slope * x + intercept)
        syy = float(((y - y.mean()) ** 2).sum())
        r2 = 1.0 - float((resid**2).sum()) / syy if syy > 0 else None
        return pd.DataFrame([{**keys, "slope": slope, "intercept": intercept, "r2": r2, "n": n}])

    return df.select(*key_cols, x_col, y_col).groupBy(*key_cols).applyInPandas(fit, out_schema)


# --- grouped-agg pandas UDFs (Series -> scalar) ------------------------------
@pandas_udf("double")
def trimmed_mean_10(v: pd.Series) -> float:
    """10%-trimmed mean (GROUPED_AGG pandas UDF): drop the k smallest
    and k largest VALUES, k = floor(0.1 n), then average. Trimming a
    multiset by sorted position is tie- and order-independent, so the
    result is deterministic under any Spark partitioning. Each group
    materializes in one executor — use for bounded-cardinality groups;
    an unbounded group calls for the rank-window formulation."""
    import numpy as np

    s = np.sort(v.to_numpy(dtype="float64"))
    k = int(len(s) * 0.1)
    return float(s[k : len(s) - k].mean())


@pandas_udf("long")
def trimmed_count_10(v: pd.Series) -> int:
    """Rows surviving the 10% trim — n - 2*floor(0.1 n)."""
    n = len(v)
    return n - 2 * int(n * 0.1)
