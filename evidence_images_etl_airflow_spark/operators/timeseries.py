"""Time-series diagnostics over regular (zero-filled) day grids:
CUSUM change-point detection and exact-weight EWMA smoothing.

Extension surface (SURVEY.md §2.6 has no reference analog): the
day-grain companions to the existing anomaly screens — where
events_anomaly_mad flags individual outlier DAYS, `cusum_changepoint`
finds the single most likely LEVEL SHIFT in the whole series (Page
1954's cumulative-sum statistic), and `ewma_smooth` is the classic
exponentially-weighted trend line the alerting literature layers
thresholds on.

Both operators assume the caller has zero-filled the series onto a
complete calendar grid first (the events_forecast_mase idiom: 1-row
bounds agg -> sequence -> left join) — lag/prefix math over a sparse
day set silently reaches across gaps.

Scale shape: every window here is ordered over the CALENDAR grid
(thousands of rows for a decade of days at ANY corpus size, never
row-bounded), so the single-partition window is grid-bounded — the
same argument events_forecast_mase makes. The day-grain counts that
FEED the grid are map-side-combinable aggregations upstream.

Exactness: integer day indexes and counts end-to-end; CUSUM's
statistic N·P_i − i·T and EWMA's weighted sums run in DECIMAL(38,0)
(counts at corpus scale push the products past int64), with ONE IEEE
divide per reported ratio at 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"


def cusum_changepoint(df: DataFrame, day_col: str, value_col: str) -> DataFrame:
    """Single change-point screen via the CUSUM statistic: for each
    day i of the N-day series, S_i = P_i − i·(T/N) measures how far
    the running sum has drifted from the constant-rate line; the day
    maximizing |S_i| is the most likely level-shift point (and the
    maximizer of the one-change-point likelihood under a constant-
    variance model). To stay exact, the statistic is scaled by N:
    NS_i = N·P_i − i·T, an integer — the argmax is unchanged.

    Tie-break: earliest day wins (deterministic). The last day always
    has NS_N = 0 and never wins unless the series is all-zero.

    Returns ONE row: ``n_days, total, cp_day, cp_index, ns_abs_max,
    mean_before, mean_after, normalized_stat`` where mean_before/
    after are the exact segment means around the change point (after
    is NULL when the change point is the final day) and
    normalized_stat = ns_abs_max / (N·|T|) in [0, ~0.25] for
    non-negative series (NULL when T = 0). Values may be negative:
    T is the exact series sum, not the prefix maximum."""
    w = Window.orderBy("__d")
    base = df.select(
        F.col(day_col).cast("bigint").alias("__d"),
        F.col(value_col).cast("bigint").alias("__y"),
    )
    pref = base.select(
        "__d",
        "__y",
        F.sum("__y").over(
            Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, 0)
        ).cast("bigint").alias("__p"),
        F.row_number().over(w).cast("bigint").alias("__i"),
    )
    tot = pref.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        # T is the series SUM, not max(prefix): the two agree only for
        # non-negative series, and value_col is an arbitrary bigint.
        F.coalesce(F.sum("__y"), F.lit(0)).cast("bigint").alias("__t"),
    )
    ns = pref.crossJoin(F.broadcast(tot)).withColumn(
        "__ns",
        (
            F.col("__n").cast(_D38) * F.col("__p").cast(_D38)
            - F.col("__i").cast(_D38) * F.col("__t").cast(_D38)
        ),
    )
    ranked = ns.withColumn(
        "__rk",
        F.row_number().over(Window.orderBy(F.abs(F.col("__ns")).desc(), "__d")),
    ).filter(F.col("__rk") == 1)
    before = F.col("__p").cast("double") / F.col("__i").cast("double")
    after_n = (F.col("__t") - F.col("__p")).cast("double")
    after_c = (F.col("__n") - F.col("__i")).cast("double")
    return ranked.select(
        F.col("__n").alias("n_days"),
        F.col("__t").alias("total"),
        F.col("__d").alias("cp_day"),
        F.col("__i").alias("cp_index"),
        F.abs(F.col("__ns")).cast("double").alias("ns_abs_max"),
        F.round(before, 6).alias("mean_before"),
        F.when(
            F.col("__i") < F.col("__n"), F.round(after_n / after_c, 6)
        ).alias("mean_after"),
        F.when(
            F.col("__t") != 0,
            F.round(
                F.abs(F.col("__ns")).cast("double")
                / (
                    F.col("__n").cast("double")
                    * F.abs(F.col("__t")).cast("double")
                ),
                6,
            ),
        ).alias("normalized_stat"),
    )


def ewma_smooth(
    df: DataFrame,
    day_col: str,
    value_col: str,
    decay_num: int = 7,
    decay_den: int = 10,
    window: int = 8,
) -> DataFrame:
    """Exponentially-weighted moving average with EXACT rational
    weights over a finite ``window``-day tail: the weight of the
    value ``k`` days back is decay^k with decay = decay_num/decay_den,
    held as the integer w_k = decay_num^k · decay_den^(window−1−k) so
    the weighted sum and the weight total are both exact integers —
    ewma_t = Σ w_k·y_{t−k} / Σ w_k collapses to ONE IEEE divide.
    Series-head days (fewer than ``window`` predecessors) renormalize
    over the weights actually available, exactly.

    The finite tail is what makes the classic recursive EWMA (an
    inherently sequential scan) distributable at all: with
    decay 0.7, the truncated 8-term window carries >94% of the
    infinite-sum mass, and each day needs only its own ``window``
    lags — a grid-bounded ordered window, no sequential state.

    Returns one row per input day: ``<day_col>, <value_col>, ewma,
    resid`` (resid = y − ewma from the same exact integers, its own
    single divide), both 6dp."""
    if not (0 < decay_num < decay_den):
        raise ValueError(
            f"decay must be in (0,1): got {decay_num}/{decay_den}"
        )
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = Window.orderBy("__d")
    base = df.select(
        F.col(day_col).cast("bigint").alias("__d"),
        F.col(value_col).cast("bigint").alias("__y"),
    )
    lagged = base.select(
        "__d",
        "__y",
        F.col("__y").alias("__l0"),
        *[
            F.lag("__y", k).over(w).alias(f"__l{k}")
            for k in range(1, window)
        ],
    )
    weights = [
        decay_num**k * decay_den ** (window - 1 - k) for k in range(window)
    ]
    num = None
    den = None
    for k, wk in enumerate(weights):
        avail = F.col(f"__l{k}").isNotNull()
        term = F.when(
            avail, F.col(f"__l{k}").cast(_D38) * F.lit(wk).cast(_D38)
        ).otherwise(F.lit(0).cast(_D38))
        wterm = F.when(avail, F.lit(wk).cast(_D38)).otherwise(
            F.lit(0).cast(_D38)
        )
        num = term if num is None else num + term
        den = wterm if den is None else den + wterm
    lagged = lagged.withColumn("__num", num).withColumn("__den", den)
    return lagged.select(
        F.col("__d").alias(day_col),
        F.col("__y").alias(value_col),
        F.round(
            F.col("__num").cast("double") / F.col("__den").cast("double"), 6
        ).alias("ewma"),
        F.round(
            (
                F.col("__y").cast(_D38) * F.col("__den") - F.col("__num")
            ).cast("double")
            / F.col("__den").cast("double"),
            6,
        ).alias("resid"),
    ).orderBy(day_col)
