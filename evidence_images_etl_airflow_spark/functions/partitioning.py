"""Partition-layout helpers shared by the compute-heavy operators.

A single small parquet file arrives as ONE input split, which would
serialize tokenize/shingle/vector work on one core no matter how many
the session has (measured 5-25x slowdowns locally). At cluster scale
inputs have many splits and these helpers are no-ops.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame


def _size_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value ('134217728', '128m', '1g')."""
    s = str(v).strip().lower()
    units = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}
    if s and s[-1] == "b" and len(s) > 1 and s[-2] in units:
        s = s[:-1]
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def _estimate_scan_partitions(df: DataFrame) -> int | None:
    """Estimate how many input splits ``df``'s file scan produces,
    using Spark's own packing rule (FilePartition.maxSplitBytes +
    greedy bin-packing with the open-cost padding) over the local file
    sizes from ``df.inputFiles()``. Returns None when the frame has no
    file source (in-memory test frames) or a non-local path — callers
    fall back to the physical probe. This is a heuristic for a
    REPARTITION decision only: both decision outcomes compute the same
    rows, so an estimate miss costs at most one redundant exchange."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    sizes = []
    for f in files:
        if f.startswith("file:"):
            p = f[5:]
            while p.startswith("//"):
                p = p[1:]
        elif f.startswith("/"):
            p = f
        else:
            return None
        try:
            sizes.append(os.path.getsize(p))
        except OSError:
            return None
    conf = df.sparkSession.conf
    max_part = _size_bytes(conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    open_cost = _size_bytes(conf.get("spark.sql.files.openCostInBytes", "4194304"))
    sc = df.sparkSession.sparkContext
    min_pn_conf = conf.get("spark.sql.files.minPartitionNum", None)
    min_pn = int(min_pn_conf) if min_pn_conf else sc.defaultParallelism
    total = sum(s + open_cost for s in sizes)
    max_split = min(max_part, max(open_cost, total // max(min_pn, 1)))
    # split each file into max_split chunks, then pack padded chunks
    # greedily in descending size order (Spark's getFilePartitions)
    chunks: list[int] = []
    for s in sizes:
        while s > max_split:
            chunks.append(max_split)
            s -= max_split
        chunks.append(s)
    chunks.sort(reverse=True)
    n, cur = 0, 0
    for c in chunks:
        padded = c + open_cost
        if cur + padded > max_split and cur > 0:
            n += 1
            cur = 0
        cur += padded
    return n + (1 if cur > 0 else 0)


def spread(df: DataFrame, key: str | Column | None = None) -> DataFrame:
    """Repartition up to the session's default parallelism when the
    input has fewer partitions — so per-row compute downstream uses
    every core. Hash-partitions by ``key`` when given (keeps related
    rows together for later groupBys); round-robin otherwise.

    Cluster masters return immediately: there, inputs arrive in many
    splits (the module docstring's premise) and a partition-count
    probe would cost driver work per call for nothing — the helper's
    entire reason to exist is the small-local-file case. An AQE
    rebalance hint is NOT a substitute here: AQE coalesces by byte
    size, so a tiny input with heavy per-row compute (shingling,
    vector math) would collapse back to one partition.

    The partition count comes from the file-split estimate above when
    the frame scans local files (r17, guide §2.6: the old ``df.rdd``
    probe forced a physical-planning round-trip on the driver at EVERY
    dedup/text query construction — measured ~40 ms/call vs ~6 ms for
    the file listing, which Spark caches per session); frames without
    a file source keep the exact probe."""
    sc = df.sparkSession.sparkContext
    if not sc.master.startswith("local"):
        return df
    target = sc.defaultParallelism
    est = _estimate_scan_partitions(df)
    n_parts = est if est is not None else df.rdd.getNumPartitions()
    if n_parts >= target:
        return df
    return df.repartition(target, key) if key is not None else df.repartition(target)


def hash_split(
    df: DataFrame,
    id_col: str | Column,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic dataset split for training pipelines: adds a
    ``split`` column ('train'/'val'/...) assigned by md5(salt || id)
    mod 10000 against cumulative fraction buckets. Unlike
    ``randomSplit``, membership is a pure function of the id — stable
    across runs, partitionings, cluster sizes, and engines (the DuckDB
    oracle reproduces it exactly), and new rows never reshuffle old
    ones between splits. No shuffle: a row-local expression."""
    from pyspark.sql import functions as F

    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    # first 15 md5 hex chars fit a signed 64-bit int in every engine
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.lit(":"), c.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 10000
    )
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        hi = int(round(cum * 10000))
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr.otherwise(list(fractions)[-1]))


def temperature_fractions(
    df: DataFrame,
    strata_col: str,
    alpha: float,
    cap: float = 1.0,
) -> dict[str, float]:
    """Per-stratum keep-fractions realizing temperature-flattened
    mixture sampling (the multilingual-corpus reweighting standard):
    target stratum probability q_i ∝ p_i^alpha, achieved by Bernoulli
    fraction f_i ∝ p_i^(alpha-1), scaled so the largest fraction equals
    ``cap``. alpha=1 keeps the natural mixture (all fractions equal);
    alpha<1 flattens toward uniform by downsampling dominant strata
    (rare strata can only be upsampled by replication, which a
    keep-fraction can't express — lower alpha downsamples the head
    instead). Collects one count per stratum (strata cardinality is
    languages/sources — driver-tiny); feed the result to
    ``stratified_hash_sample``."""
    from pyspark.sql import functions as F

    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    raw = {k: (n / total) ** (alpha - 1.0) for k, n in counts.items()}
    peak = max(raw.values())
    return {k: cap * v / peak for k, v in raw.items()}


def stratified_hash_sample(
    df: DataFrame,
    id_col: str | Column,
    strata_col: str | Column,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample — the training-data
    mixture dial ('keep 30% of web, all of books'). A row survives iff
    ``md5(salt:stratum:id) % 10000 < fraction(stratum) * 10000``:
    membership is a pure function of (id, stratum), so it is stable
    across runs, partitionings, and engines (oracle-reproducible),
    re-sampling with a larger fraction is a SUPERSET of the smaller one
    (the property quota-by-shuffling lacks), and no shuffle happens —
    it's a row-local filter that pushes down to the scan. Strata absent
    from ``fractions`` fall back to ``default_fraction``."""
    from pyspark.sql import functions as F

    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} out of [0,1]: {frac}")
    c_id = F.col(id_col) if isinstance(id_col, str) else id_col
    c_st = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt), F.lit(":"), c_st.cast("string"),
                        F.lit(":"), c_id.cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    thresh = None
    for name, frac in fractions.items():
        hi = F.lit(int(round(frac * 10000)))
        thresh = F.when(c_st == name, hi) if thresh is None else thresh.when(c_st == name, hi)
    thresh = (
        thresh.otherwise(F.lit(int(round(default_fraction * 10000))))
        if thresh is not None
        else F.lit(int(round(default_fraction * 10000)))
    )
    return df.filter(bucket < thresh)


def weighted_hash_sample(
    df: DataFrame,
    id_col: str | Column,
    prob_col: str | Column,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic per-row Bernoulli sample with a ROW-VARYING keep
    probability — curation's soft filter ('keep documents with
    probability equal to their quality score' instead of a hard
    threshold, so mid-quality text is downweighted, not erased). A row
    survives iff ``md5(salt:id) % 10000 < round(prob * 10000)``:
    membership is a pure function of (id, prob), so re-runs, engines,
    and partitionings agree, and raising a row's probability can only
    ADD it (monotone supersets — the debuggability property sampling
    by rand() lacks). Row-local filter: no shuffle, and when ``prob``
    is a column of the scanned table the whole predicate pushes into
    the scan. ``prob`` outside [0,1] clamps.

    Cross-engine note: both engines compute the SAME double product
    and round half-up on positives, so the integer thresholds agree;
    keep ``prob`` low-precision (the callers pass 6dp-rounded scores)
    so the product stays far from .5 ties."""
    from pyspark.sql import functions as F

    c_id = F.col(id_col) if isinstance(id_col, str) else id_col
    c_p = F.col(prob_col) if isinstance(prob_col, str) else prob_col
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit(":"), c_id.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    clamped = F.least(F.greatest(c_p, F.lit(0.0)), F.lit(1.0))
    return df.filter(bucket < F.round(clamped * 10000, 0).cast("long"))


def weighted_reservoir_topk(
    df: DataFrame,
    keys: list[str],
    weight_col: str,
    id_col: str,
    k: int = 20,
    salt: str = "wres",
    key_col: str = "wkey",
) -> DataFrame:
    """Deterministic FIXED-SIZE weighted sample per group — the
    Efraimidis–Spirakis A-ES reservoir: each row draws a deterministic
    uniform u = (md5hash(salt:id)+1)/2^60 and the k rows with the
    largest u^(1/weight) win. Where ``weighted_hash_sample`` gives a
    Bernoulli sample of *expected* size (each row independent), this
    gives EXACTLY min(k, group size) rows with inclusion probability
    proportional to weight — the "pick 10k representative docs per
    language, favoring long ones" shape where a budget, not a rate, is
    fixed.

    Ranks on ``weight / ln(u)`` ascending — a monotone transform of
    u^(1/weight) (both orders agree; ln(u) <= 0) whose magnitude
    (|weight|-scaled) survives the repo's round-to-6dp-before-ranking
    idiom far from tie territory, unlike the raw key which crowds into
    (0,1). Zero-weight rows rank last (0 is the ascending supremum
    here), i.e. are only taken when a group has fewer than k positive-
    weight rows. Ties at 6dp break by id. Scale shape: row-local score,
    one rank-k window per key — WindowGroupLimit keeps at most k rows
    per group map-side, so the shuffle carries O(groups x k), never the
    corpus; the same reason the sample is reproducible under ANY
    repartitioning is why it is reproducible cross-engine."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    c_id = F.col(id_col)
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), c_id.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    u = (hv + F.lit(1)).cast("double") / F.lit(2.0**60)
    wc = F.col(weight_col).cast("double")
    # Degenerate branches, pinned explicitly so both engines and the
    # docstring agree: null/zero/negative weight -> key 0.0 (the
    # ascending supremum: taken only when a group lacks k
    # positive-weight rows); u rounding up to exactly 1.0 (the 15-hex
    # prefix within one double-ulp of 2^60, ~2^-53 per row) -> -inf,
    # because the true A-ES key u^(1/w) = 1 is the MAXIMUM and must
    # rank first, where w/ln(1) = w/0 would rank it last.
    wkey = F.round(
        F.when(wc.isNull() | (wc <= 0), F.lit(0.0))
        .when(F.log(u) >= 0, F.lit(float("-inf")))
        .otherwise(wc / F.log(u)),
        6,
    )
    w = Window.partitionBy(*keys).orderBy(F.col(key_col).asc(), c_id)
    return (
        df.withColumn(key_col, wkey)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def length_bucket_plan(
    df: DataFrame,
    length_col: str | Column,
    n_buckets: int = 8,
) -> DataFrame:
    """Equal-width length bucketing for padded-batch planning: assign
    each row ``bucket = min(n-1, len * n div (max_len + 1))`` (all
    integer math against one broadcast 1-row max) and report, per
    bucket, the padding economics a training/inference batcher cares
    about — every sequence in a batch pays the batch's max length, so
    ``padding_waste = max_len_in_bucket * n_rows - sum_len`` is the
    FLOP overhead bucketing exists to remove. Compare the per-bucket
    waste sum against the single-bucket (unbucketed) waste to price a
    bucket count.

    Scale: one aggregation for the max (broadcast, 1 row), one
    groupBy over ``n_buckets`` keys with map-side combine — never a
    global sort, unlike NTILE bucketing, which funnels 100 TB through
    one window partition. Equal-width (not equal-count) is the right
    shape for padding: waste is bounded by bucket WIDTH, and a skewed
    length distribution concentrating rows in few buckets wastes
    nothing extra — empty buckets are free."""
    from pyspark.sql import functions as F

    if int(n_buckets) <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    n = int(n_buckets)
    c = F.col(length_col) if isinstance(length_col, str) else length_col
    lens = df.select(c.cast("bigint").alias("len"))
    mx = lens.agg(F.coalesce(F.max("len"), F.lit(0)).alias("max_len"))
    bucketed = lens.crossJoin(F.broadcast(mx)).select(
        "len",
        F.least(
            F.lit(n - 1),
            F.expr(f"(len * {n}) div (max_len + 1)"),
        ).cast("int").alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("len").cast("bigint").alias("min_len"),
        F.max("len").cast("bigint").alias("max_len"),
        F.sum("len").cast("bigint").alias("sum_len"),
        (F.max("len") * F.count("*") - F.sum("len"))
        .cast("bigint")
        .alias("padding_waste"),
    )
