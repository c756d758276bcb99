"""Distribution-drift monitoring (PSI) between two data slices.

A 100 TB ingest pipeline needs a standing answer to "did this batch's
data change shape?" before the batch poisons training mixtures or
dashboards. The standard instrument is the Population Stability Index:
for a partition of a feature's values into bins,

    PSI = sum over bins of (p_ref - p_cur) * ln(p_ref / p_cur)

with the conventional read: < 0.1 stable, 0.1-0.2 drifting, > 0.2
shifted. PSI is symmetric (a J-divergence), additive over bins, and
cheap: everything here is one pass of conditional aggregation.

Design for determinism (the repo's oracle discipline):
- numeric features bin EQUAL-WIDTH against the GLOBAL min/max (both
  slices), so bin edges are a pure function of the data and the two
  slices share them;
- proportions are rounded to 6dp, then clamped to ``eps`` (empty-bin
  smoothing) BEFORE the log — identical arithmetic in any engine;
- bins observed in neither slice contribute exactly 0 and may be
  absent; bins observed in one slice get a real count and an eps
  floor on the other side.

Scale shape: per feature, one 1-row min/max broadcast (numeric only),
one groupBy over observed bins with conditional counts (map-side
combinable), a 1-row totals broadcast, and a window over O(bins) rows.
The raw table is scanned once per feature and nothing larger than the
bin table ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def psi_from_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    feature: str,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI report from PRE-AGGREGATED per-bin counts — the composition
    point for incremental/streaming maintenance: any process that can
    keep (bin, n) counts up to date (a streaming aggregation, an
    incremental state table) gets the full PSI report for free by
    joining its counts against the frozen reference's. Inputs are
    (bin, n) frames; bins absent from one side count 0 there (the eps
    clamp supplies the smoothing)."""
    r = ref_counts.select(F.col("bin").alias("__rb"), F.col("n").alias("nr"))
    c = cur_counts.select(F.col("bin").alias("__cb"), F.col("n").alias("nc"))
    # null-SAFE bin equality: a NULL bin present in both slices must
    # collapse to one row (as groupBy does on the tagged path), not
    # two clamped half-rows that each add a spurious (p-eps)ln(p/eps)
    cnts = (
        r.join(c, r["__rb"].eqNullSafe(c["__cb"]), "full_outer")
        .select(
            F.coalesce(F.col("__rb"), F.col("__cb")).alias("bin"),
            F.coalesce(F.col("nr"), F.lit(0)).alias("nr"),
            F.coalesce(F.col("nc"), F.lit(0)).alias("nc"),
        )
    )
    return _psi_tail(cnts, feature, eps)


def _psi_terms(tagged: DataFrame, feature: str, eps: float) -> DataFrame:
    """(feature, bin, p_ref, p_cur, psi_term, psi) from a
    (``__period`` in {'ref','cur'}, ``bin``) frame."""
    cnts = tagged.groupBy("bin").agg(
        F.sum(F.when(F.col("__period") == "ref", 1).otherwise(0))
        .cast("bigint")
        .alias("nr"),
        F.sum(F.when(F.col("__period") == "cur", 1).otherwise(0))
        .cast("bigint")
        .alias("nc"),
    )
    return _psi_tail(cnts, feature, eps)


def _psi_tail(cnts: DataFrame, feature: str, eps: float) -> DataFrame:
    """Shared report tail over a (bin, nr, nc) counts frame: totals
    broadcast, 6dp-rounded eps-clamped proportions, per-bin terms and
    the feature-total window.

    An EMPTY slice (total 0 — e.g. a crawl batch whose every doc was
    dropped upstream) must not crash the plan under ANSI division:
    its proportions fall to the eps floor in every bin, so PSI reads
    as maximal drift. Callers that want vacuous-pass semantics for an
    empty slice gate on the slice count instead (ep6 does — an empty
    admitted batch reports psi NULL, not maximal drift). Values are
    unchanged whenever both totals are positive: the guard branch is
    taken only at total 0, where the old expression threw."""
    tot = cnts.agg(
        F.sum("nr").cast("bigint").alias("tr"),
        F.sum("nc").cast("bigint").alias("tc"),
    )
    p_ref = F.greatest(
        F.round(
            F.when(F.col("tr") > 0, F.col("nr") / F.col("tr")).otherwise(
                F.lit(0.0)
            ),
            6,
        ),
        F.lit(eps),
    )
    p_cur = F.greatest(
        F.round(
            F.when(F.col("tc") > 0, F.col("nc") / F.col("tc")).otherwise(
                F.lit(0.0)
            ),
            6,
        ),
        F.lit(eps),
    )
    term = (F.col("p_ref") - F.col("p_cur")) * F.log(
        F.col("p_ref") / F.col("p_cur")
    )
    w = Window.partitionBy(F.lit(1))
    return (
        cnts.crossJoin(F.broadcast(tot))
        .select(
            F.lit(feature).alias("feature"),
            "bin",
            p_ref.alias("p_ref"),
            p_cur.alias("p_cur"),
        )
        .withColumn("__term", term)
        .select(
            "feature",
            "bin",
            "p_ref",
            "p_cur",
            F.round(F.col("__term"), 6).alias("psi_term"),
            F.round(F.sum("__term").over(w), 6).alias("psi"),
        )
    )


def psi_numeric(
    df: DataFrame,
    col: str,
    period_col: str = "__period",
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI of a numeric column between the 'ref' and 'cur' slices of
    ``period_col``, over ``n_bins`` equal-width bins spanning the
    global [min, max] (shared edges by construction). The top edge
    folds into the last bin."""
    st = df.agg(
        F.min(col).cast("double").alias("mn"), F.max(col).cast("double").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / F.lit(n_bins)
    bin_ = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.floor((F.col(col).cast("double") - F.col("mn")) / width),
            F.lit(n_bins - 1),
        )
    )
    tagged = (
        df.select(F.col(period_col).alias("__period"), col)
        .crossJoin(F.broadcast(st))
        .select("__period", bin_.cast("string").alias("bin"))
    )
    return _psi_terms(tagged, col, eps)


def psi_categorical(
    df: DataFrame,
    col: str,
    period_col: str = "__period",
    eps: float = 1e-6,
) -> DataFrame:
    """PSI of a categorical column: each distinct value is its own
    bin."""
    tagged = df.select(
        F.col(period_col).alias("__period"), F.col(col).cast("string").alias("bin")
    )
    return _psi_terms(tagged, col, eps)


def psi_report(
    df: DataFrame,
    period: Column,
    numeric_cols: tuple[str, ...] = (),
    categorical_cols: tuple[str, ...] = (),
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Multi-feature drift report: one row per (feature, observed bin)
    with per-bin proportions, the bin's PSI term, and the feature's
    total PSI repeated on each of its rows. ``period`` is a Column
    evaluating to 'ref'/'cur'."""
    if not numeric_cols and not categorical_cols:
        raise ValueError(
            "psi_report needs at least one numeric or categorical column"
        )
    tagged = df.withColumn("__period", period)
    parts = [
        psi_numeric(tagged, c, n_bins=n_bins, eps=eps) for c in numeric_cols
    ] + [psi_categorical(tagged, c, eps=eps) for c in categorical_cols]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
