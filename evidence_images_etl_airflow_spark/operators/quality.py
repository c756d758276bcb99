"""Data-quality constraint checking (data contracts).

The reference's only "validation" is catching varchar-overflow errors
AFTER a failed insert (evidence_images_processing.py:221-228 — K2).
The engine-grade version validates declaratively BEFORE the write: a
constraint list compiles into as few Spark jobs as the constraint mix
allows, and the output is a small report frame (one row per
constraint) a pipeline can gate on.

Scale design: all ROW-LOCAL constraints (not-null, in-set, range,
regex) compile into a SINGLE conditional aggregate over ONE scan —
adding a constraint adds a codegen'd sum(case when ...), not a pass.
Uniqueness is one groupBy on the key (map-side combined); a foreign-key
check is one anti-join with the dimension side broadcast when small.
Nothing collects the data; the report is O(#constraints) rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Check:
    name: str
    kind: str  # "rowlocal" | "unique" | "fk"
    # rowlocal: a boolean Column that is True when the row VIOLATES
    violation: Column | None = None
    cols: list[str] = field(default_factory=list)
    dim: DataFrame | None = None
    dim_col: str | None = None


def check_not_null(col: str) -> Check:
    return Check(f"not_null({col})", "rowlocal", F.col(col).isNull())


def check_in_set(col: str, values: list) -> Check:
    return Check(
        f"in_set({col})", "rowlocal", ~F.col(col).isin(values) | F.col(col).isNull()
    )


def check_range(col: str, lo=None, hi=None) -> Check:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    return Check(f"range({col})", "rowlocal", cond | F.col(col).isNull())


def check_regex(col: str, pattern: str) -> Check:
    return Check(
        f"regex({col})",
        "rowlocal",
        ~F.col(col).rlike(pattern) | F.col(col).isNull(),
    )


def check_unique(cols: list[str]) -> Check:
    return Check(f"unique({','.join(cols)})", "unique", cols=cols)


# Dimensions with at most this many rows get an explicit broadcast
# hint on the FK anti-join; bigger ones are left to AQE/planner choice
# (a blanket hint would force-broadcast an arbitrarily large dimension
# and OOM executors — round-4 ADVICE).
FK_BROADCAST_MAX_ROWS = 10_000_000


def check_fk(col: str, dim: DataFrame, dim_col: str) -> Check:
    return Check(f"fk({col})", "fk", cols=[col], dim=dim, dim_col=dim_col)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Report frame ``(check_name, violations, n_rows)`` — one row per
    constraint, all counts over the same input snapshot."""
    reports: list[DataFrame] = []

    rowlocal = [c for c in checks if c.kind == "rowlocal"]
    if rowlocal:
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.when(c.violation, 1).otherwise(0)).alias(f"v{i}")
            for i, c in enumerate(rowlocal)
        ]
        one = df.agg(*aggs)
        stack = ", ".join(f"'{c.name}', v{i}" for i, c in enumerate(rowlocal))
        reports.append(
            one.selectExpr(
                f"stack({len(rowlocal)}, {stack}) AS (check_name, violations)",
                "n_rows",
            )
        )

    n_rows_lit = None
    for c in checks:
        if c.kind == "unique":
            if n_rows_lit is None:
                n_rows_lit = df.count()
            dups = (
                df.groupBy(*c.cols)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .agg(F.coalesce(F.sum("__n"), F.lit(0)).alias("violations"))
            )
            reports.append(
                dups.select(
                    F.lit(c.name).alias("check_name"),
                    F.col("violations").cast("long"),
                    F.lit(n_rows_lit).cast("long").alias("n_rows"),
                )
            )
        elif c.kind == "fk":
            if n_rows_lit is None:
                n_rows_lit = df.count()
            side = c.dim.select(F.col(c.dim_col).alias(c.cols[0]))
            # hint broadcast only for genuinely small dimensions (one
            # pruned-scan count decides); larger ones go to the planner
            # — AQE still converts to broadcast at runtime if the
            # shuffle stats come in small
            if side.count() <= FK_BROADCAST_MAX_ROWS:
                side = F.broadcast(side)
            orphans = df.select(c.cols[0]).join(side, c.cols[0], "left_anti")
            reports.append(
                orphans.agg(F.count(F.lit(1)).alias("violations")).select(
                    F.lit(c.name).alias("check_name"),
                    F.col("violations").cast("long"),
                    F.lit(n_rows_lit).cast("long").alias("n_rows"),
                )
            )

    if not reports:
        # empty check list -> empty report with the right schema, not
        # an IndexError (round-4 ADVICE)
        return df.sparkSession.createDataFrame(
            [], "check_name string, violations long, n_rows long"
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "check_name", F.col("violations").cast("long").alias("violations"), "n_rows"
    )


def mad_outlier_screen(
    df: DataFrame,
    col: str,
    k: float = 3.0,
    cents_scale: int = 100,
    approx_accuracy: int | None = None,
) -> DataFrame:
    """Robust outlier screen on a monetary/metric column: median +
    MAD (median absolute deviation), the estimator that doesn't move
    when the outliers it hunts get bigger — unlike mean/stddev
    z-scores (events_anomaly_zscore), which a single extreme row can
    drag until it masks itself.

    Exactness discipline: values are scaled to INTEGER units first
    (``round(col * cents_scale)``), so both medians are interpolations
    of integers — exact dyadic doubles that agree bit-for-bit across
    engines, with no 6dp tolerance needed anywhere. Two exact-median
    passes (Spark ``median`` is the exact sort-based percentile) + two
    1-row broadcasts.

    The 100 TB dial (VERDICT r10 item 4) is ``approx_accuracy``: when
    set, both median passes run as ``approx_percentile(c, 0.5,
    accuracy)`` — a mergeable Greenwald-Khanna sketch with map-side
    combine and rank error <= 1/accuracy, instead of two full
    sort-based aggregations. The decision threshold then moves by at
    most the sketch's rank error at the median (the screen's verdict
    on any row changes only if its deviation sits inside that band).
    ``None`` (exact) stays the default and the cross-engine-oracle
    mode; ``10_000`` (0.01% rank error) is the recommended at-scale
    setting.

    Returns one report row: n_rows, n_outliers (|x - med| > k * MAD),
    median / MAD / cutoffs in original units (2dp)."""
    if approx_accuracy is not None and int(approx_accuracy) < 1:
        raise ValueError(
            f"approx_accuracy must be >= 1, got {approx_accuracy}"
        )

    def _median(c: str):
        if approx_accuracy is None:
            return F.median(c)
        return F.expr(
            f"approx_percentile({c}, 0.5, {int(approx_accuracy)})"
        ).cast("double")

    v = df.select(
        F.round(F.col(col) * cents_scale).cast("bigint").alias("c")
    )
    med = v.agg(_median("c").alias("med"))
    d = v.crossJoin(F.broadcast(med)).select(
        "c", "med", F.abs(F.col("c") - F.col("med")).alias("dev")
    )
    mad = d.agg(_median("dev").alias("mad"))
    r = d.crossJoin(F.broadcast(mad))
    s = float(cents_scale)
    return r.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("dev") > F.lit(k) * F.col("mad"), 1).otherwise(0)
        ).cast("bigint").alias("n_outliers"),
        F.round(F.max("med") / s, 2).alias("median_value"),
        F.round(F.max("mad") / s, 2).alias("mad_value"),
        F.round((F.max("med") - F.lit(k) * F.max("mad")) / s, 2).alias("lo_cut"),
        F.round((F.max("med") + F.lit(k) * F.max("mad")) / s, 2).alias("hi_cut"),
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols: list,
    k: int = 5,
) -> DataFrame:
    """k-anonymity screen over a set of quasi-identifier columns —
    the privacy gate a training-data pipeline runs BEFORE publishing a
    de-identified table: every row must be indistinguishable from at
    least k-1 others on the quasi-identifiers (Sweeney, k-anonymity,
    IJUFKS 2002), or a join with any public register re-identifies it.
    The reference ships evidence rows with person-adjacent attributes
    and no release screen at all (evidence_images_processing.py writes
    straight to the serving DB); this is the missing gate.

    ``qi_cols`` entries are column names or Column expressions (pass
    e.g. ``F.floor(F.col("salary") / 10_000)`` to generalize a
    continuous attribute into buckets — generalization is HOW tables
    are made k-anonymous, so the screen must accept the generalized
    form directly).

    Scale design: one QI-grain groupBy (map-side combined — the
    equivalence-class count stream is pre-aggregated per partition,
    so the shuffle carries at most one row per partition per class)
    followed by an O(#classes) report aggregate; nothing collects, no
    joins, report is ONE row. At 100 TB the only dial that matters is
    the QI-grain cardinality, which is the quantity under audit anyway.

    Returns one row: ``k, n_rows, n_classes, rows_below_k,
    classes_below_k, min_class_size, max_class_size, at_risk_share``
    (share of rows living in classes smaller than k, 6dp — integer
    ratio, one IEEE divide, exact cross-engine).
    """
    if int(k) < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not qi_cols:
        raise ValueError("qi_cols must name at least one quasi-identifier")
    classes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("__n"))
    rep = classes.agg(
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.coalesce(
            F.sum(F.when(F.col("__n") < k, F.col("__n"))), F.lit(0)
        ).cast("bigint").alias("rows_below_k"),
        F.coalesce(
            F.sum(F.when(F.col("__n") < k, 1)), F.lit(0)
        ).cast("bigint").alias("classes_below_k"),
        F.min("__n").cast("bigint").alias("min_class_size"),
        F.max("__n").cast("bigint").alias("max_class_size"),
    )
    return rep.select(
        F.lit(int(k)).cast("int").alias("k"),
        "n_rows",
        "n_classes",
        "rows_below_k",
        "classes_below_k",
        "min_class_size",
        "max_class_size",
        F.round(
            F.col("rows_below_k").cast("double") / F.col("n_rows"), 6
        ).alias("at_risk_share"),
    )


def k_anonymity_violations(
    df: DataFrame,
    qi_cols: list,
    k: int = 5,
    top_n: int = 100,
) -> DataFrame:
    """Drill-down companion to :func:`k_anonymity_report`: the actual
    equivalence classes smaller than k — what a curator must
    generalize or suppress — smallest (most identifying) first,
    bounded at ``top_n`` rows so the driver-facing result stays
    constant-sized regardless of table scale. Deterministic order:
    class size ASC, then the stringified QI tuple."""
    if int(k) < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    classes = (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .filter(F.col("class_size") < k)
    )
    order_key = F.concat_ws(
        "", *[F.col(c).cast("string") for c in classes.columns[:-1]]
    )
    return (
        classes.orderBy(F.col("class_size").asc(), order_key)
        .limit(int(top_n))
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    top_fraction: float = 0.1,
) -> DataFrame:
    """Exact Gini coefficient + top-slice share for a non-negative
    integer value column (pass money as cents-BIGINT upstream) — the
    concentration profile that decides whether a key distribution can
    be processed un-salted, whether one source dominates a training
    mixture, or how skewed customer revenue is before a campaign.

    Distributed shape: the textbook formula sorts all n rows and sums
    i·x_i — a global sort. Instead rows collapse to (value, count)
    blocks first (map-side combinable groupBy), and because tied
    values contribute the same x wherever they land inside their rank
    block, the rank-sum is exact from block prefix counts alone:
    ``Σ 2·i·x_i = Σ_v v·(2·c·ccb + c² + c)`` where ccb is the count of
    rows in strictly-smaller blocks. The only ordered pass runs over
    DISTINCT values — bounded by the value grid (price grids are
    ~1e7 cents), never the row count. The top-slice share takes the
    highest ``floor(n·top_fraction)`` rows block-partially (ties at
    the boundary split by count, deterministic because blocks are
    whole values).

    Exactness: counts BIGINT, all products in DECIMAL(38,0)
    (v·c·ccb reaches ~1e26 at corpus scale); Gini =
    ranksum2/(n·S) − (n+1)/n and the share are each a single IEEE
    step at 6dp. Returns ONE row: ``n, value_total, gini,
    top_share``; gini/top_share NULL when n = 0 or S = 0."""
    if not (0.0 < top_fraction < 1.0):
        raise ValueError(f"top_fraction must be in (0,1), got {top_fraction}")
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    # NULL values are excluded up front (r13 latent-defect pass): a
    # valueless row has no rank, and left in, the NULL block would
    # sort FIRST under Spark's window but LAST under DuckDB's,
    # shifting every prefix. Registered consumers aggregate non-null
    # money columns and never produce one.
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("bigint").alias("__v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    b = g.withColumn(
        "__ccb", F.coalesce(F.sum("__c").over(w), F.lit(0)).cast("bigint")
    )
    tot = b.agg(
        F.sum("__c").cast("bigint").alias("__n"),
        F.sum(F.col("__v").cast(d38) * F.col("__c").cast(d38)).alias("__s"),
    )
    j = b.crossJoin(F.broadcast(tot))
    # k must be EXACT integer arithmetic: floor(n * 0.1) in IEEE can
    # land one off from n // 10 near representation boundaries, and
    # the SQL oracle computes the integer form — so convert the
    # fraction to an exact rational and use integral div.
    from fractions import Fraction

    fr = Fraction(str(top_fraction))
    k = F.expr(f"(__n * {fr.numerator}) div {fr.denominator}").cast("bigint")
    above = F.col("__n") - F.col("__ccb") - F.col("__c")  # rows strictly above
    take = F.greatest(
        F.lit(0).cast("bigint"), F.least(F.col("__c"), k - above)
    )
    agg = j.agg(
        F.max("__n").alias("n"),
        F.max("__s").alias("__stot"),
        F.sum(
            F.col("__v").cast(d38)
            * (
                2 * F.col("__c").cast(d38) * F.col("__ccb").cast(d38)
                + F.col("__c").cast(d38) * F.col("__c").cast(d38)
                + F.col("__c").cast(d38)
            )
        ).alias("__rs2"),
        F.sum(F.col("__v").cast(d38) * take.cast(d38)).alias("__topv"),
    )
    nn = F.col("n").cast("double")
    ss = F.col("__stot").cast("double")
    defined = (F.col("n") > 0) & (F.col("__stot") > 0)
    return agg.select(
        "n",
        # report the total as DOUBLE (one cast): a DECIMAL(38,0) output
        # column round-trips as Decimal on Spark but float via the
        # DuckDB pandas fetch, breaking value-hash parity on TYPE alone
        F.col("__stot").cast("double").alias("value_total"),
        F.when(
            defined,
            F.round(
                F.col("__rs2").cast("double") / (nn * ss)
                - (nn + 1.0) / nn,
                6,
            ),
        ).alias("gini"),
        F.when(
            defined, F.round(F.col("__topv").cast("double") / ss, 6)
        ).alias("top_share"),
    )


def abc_classification(
    df: DataFrame,
    value_col: str,
    a_fraction: float = 0.7,
    b_fraction: float = 0.9,
) -> DataFrame:
    """Exact ABC (Pareto) classification of a non-negative integer
    value column (money as cents-BIGINT upstream): ranked by value
    descending, class A = the items carrying the first
    ``a_fraction`` of total value, B the next slice up to
    ``b_fraction``, C the tail — inventory analysis's 80/20 cut, and
    the same decision the mixture planner makes about which sources
    deserve dedup/curation effort first. An item BELONGS to a class
    when its cumulative value STARTS below the class boundary (the
    crossing item counts into the class it crosses from).

    Distributed shape: the gini_concentration idiom — rows collapse
    to (value, count) blocks (map-side combined), one ordered pass
    over DISTINCT values descending (value-grid bounded, never
    row-bounded), and the class boundary SPLITS a tied block by
    count with exact integer ceil-division: inside a block every row
    adds the same v, so the number of its rows starting below the
    boundary is ceil((num·T − den·sb)/(den·v)) clamped to [0, c]
    where sb is the value-sum of strictly-greater blocks and
    num/den the exact rational boundary. Zero-value blocks sort
    last, start exactly at T, and land in C.

    Exactness: BIGINT counts, DECIMAL(38,0) products (den·sb at
    corpus scale passes int64), boundaries as exact rationals
    (IEEE floor(n·0.7) can land one off), truncating integral div —
    identical in both engines for the non-negative dividends the
    >0 guard admits. Shares are one IEEE divide each at 6dp.

    Returns one row per class (only classes with at least one block
    materialize a row; empty input -> empty): ``cls, n_items,
    value_sum, value_share`` ordered A, B, C."""
    from fractions import Fraction

    fa = Fraction(str(a_fraction))
    fb = Fraction(str(b_fraction))
    if not (0 < fa < fb < 1):
        raise ValueError(
            f"need 0 < a_fraction < b_fraction < 1, got {a_fraction}, {b_fraction}"
        )
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    # same NULL exclusion as gini_concentration above (r13)
    g = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("bigint").alias("__v"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    w = Window.orderBy(F.col("__v").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    b = g.select(
        "__v",
        "__c",
        F.coalesce(
            F.sum(F.col("__v").cast(d38) * F.col("__c").cast(d38)).over(w),
            F.lit(0).cast(d38),
        ).alias("__sb"),
    )
    tot = g.agg(
        F.sum(F.col("__v").cast(d38) * F.col("__c").cast(d38)).alias("__t")
    )

    j = b.crossJoin(F.broadcast(tot))
    # common denominator for both boundaries so the two ceil-divs
    # share one expression shape
    den = fa.denominator * fb.denominator
    a_num = fa.numerator * fb.denominator
    b_num = fb.numerator * fa.denominator
    for tag, num in (("a", a_num), ("b", b_num)):
        margin = (
            F.lit(num).cast(d38) * F.col("__t")
            - F.lit(den).cast(d38) * F.col("__sb")
        )
        denom = F.lit(den).cast(d38) * F.col("__v").cast(d38)
        ceil_div = F.expr(
            f"CAST((__m_{tag} + __dv - 1) div __dv AS DECIMAL(38,0))"
        )
        j = (
            j.withColumn(f"__m_{tag}", margin)
            .withColumn("__dv", denom)
            .withColumn(
                f"__n_{tag}",
                F.when(
                    (F.col("__v") > 0) & (F.col(f"__m_{tag}") > 0),
                    F.least(F.col("__c").cast(d38), ceil_div),
                ).otherwise(F.lit(0).cast(d38)).cast("bigint"),
            )
            .drop("__dv")
        )
    per_block = j.select(
        "__v",
        "__c",
        F.col("__n_a").alias("__na"),
        (F.col("__n_b") - F.col("__n_a")).alias("__nb"),
        (F.col("__c") - F.col("__n_b")).alias("__nc"),
        "__t",
    )
    exploded = per_block.select(
        "__v",
        "__t",
        F.explode(
            F.array(
                F.struct(F.lit("A").alias("cls"), F.col("__na").alias("n")),
                F.struct(F.lit("B").alias("cls"), F.col("__nb").alias("n")),
                F.struct(F.lit("C").alias("cls"), F.col("__nc").alias("n")),
            )
        ).alias("e"),
    ).select("__v", "__t", F.col("e.cls").alias("cls"), F.col("e.n").alias("__n"))
    agg = exploded.groupBy("cls").agg(
        F.sum("__n").cast("bigint").alias("n_items"),
        F.sum(F.col("__v").cast(d38) * F.col("__n").cast(d38)).alias("__vs"),
        F.max("__t").alias("__t"),
    )
    return agg.select(
        "cls",
        "n_items",
        F.col("__vs").cast("double").alias("value_sum"),
        F.when(
            F.col("__t") > 0,
            F.round(
                F.col("__vs").cast("double") / F.col("__t").cast("double"), 6
            ),
        ).alias("value_share"),
    ).orderBy("cls")
