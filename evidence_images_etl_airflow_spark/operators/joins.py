"""Shuffle-reduction join patterns beyond broadcast (J1 extensions).

The reference's only join is a two-frame pandas merge
(`dags/evidence_images_processing.py:131-140`); at 100 TB the join
COST is dominated by shuffling non-matching big-side rows. Spark's
AQE injects runtime bloom filters for some shapes
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), but an EXPLICIT
operator matters when the filter must persist across queries/batches
(build once, reuse for a day of loads) or when the build side is a
prior pipeline stage AQE cannot see. This module composes the
DataFrame-native Bloom bitmap from `operators/dedup.py`
(`bloom_build` / `bloom_might_contain` — bit_or-mergeable rows, no
UDF) into join pre-filters.

Scale shape: the small side's KEY SET bloom is ~num_bits/64 rows
(~128 KiB at 2^23 bits) no matter how many rows the small side has —
broadcastable even when the small side itself is NOT. The big side is
pre-filtered entirely map-side (k broadcast word-lookups + bit
tests), so only might-match rows enter the join shuffle; false
positives (~0.1% at default sizing) are eliminated by the exact join
itself, so results are exact, never approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.operators.dedup import (
    bloom_build,
    bloom_might_contain,
)


def build_key_bloom(
    small: DataFrame, key: str, num_bits: int = 1 << 23
) -> DataFrame:
    """Bloom bitmap over ``small``'s distinct join keys — a tiny
    ``(word, bits)`` table to persist and broadcast into any number of
    later probe plans (the cross-batch reuse AQE's runtime filters
    cannot give you). Build cost: one pass over the small side's key
    column only."""
    return bloom_build(
        small.select(F.col(key).cast("string").alias("__k")).distinct(),
        "__k",
        num_bits=num_bits,
    )


def bloom_prefiltered_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    num_bits: int = 1 << 23,
    bloom: DataFrame | None = None,
) -> DataFrame:
    """Join ``big`` to ``small`` on ``key`` with the big side Bloom
    pre-filtered before any shuffle: rows whose key definitively is
    not in ``small`` drop map-side, so the join exchange carries only
    might-match rows. The exact join then removes Bloom false
    positives — output is identical to ``big.join(small, key, how)``
    (the oracle property the workload query pins). Pass a prebuilt
    ``bloom`` (from :func:`build_key_bloom`) to amortize the build
    across many probe queries/batches. Supported ``how``: inner /
    left_semi (shapes where dropped big-side rows cannot appear in
    the result)."""
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(f"bloom prefilter is only sound for inner/semi, got {how}")
    if bloom is None:
        bloom = build_key_bloom(small, key, num_bits)
    probed = bloom_might_contain(
        big.withColumn("__k", F.col(key).cast("string")),
        "__k",
        bloom,
        num_bits=num_bits,
    )
    survivors = probed.filter(F.col("__might_contain")).drop(
        "__k", "__might_contain"
    )
    return survivors.join(small, key, how)


def join_size_by_degree(
    left: DataFrame,
    right: DataFrame,
    key: str,
    top_n: int = 5,
) -> DataFrame:
    """EXACT equi-join output size + per-key skew attribution WITHOUT
    executing the join — the pre-flight check before any fact-fact
    join at 100 TB. |A join B| = sum over keys of n_a(k) * n_b(k), so
    aggregating each side to per-key degrees and joining THOSE (one
    row per distinct key, not per output row) prices the join and
    names the keys that dominate it. The report is what decides the
    strategy: a handful of keys carrying most of the output means
    salting / AQE skew-join; a bounded total means just run it; an
    astronomical total means the join predicate is wrong — discovered
    for the cost of two aggregates instead of an executor-killing
    shuffle. Returns the top_n heaviest keys:
    (key, n_left, n_right, pairs, pct_of_total, total_pairs, rank).

    Scale shape: two map-side-combinable groupBy counts (partial aggs
    shrink each side to its distinct keys before the shuffle), one
    join on the degree tables, a 1-row total broadcast back, and a
    global top-n window over the degree table (WindowGroupLimit keeps
    n rows per partition map-side). Nothing here is ever the size of
    the join output."""
    da = left.groupBy(F.col(key)).agg(F.count("*").cast("bigint").alias("n_left"))
    db = right.groupBy(F.col(key)).agg(F.count("*").cast("bigint").alias("n_right"))
    deg = da.join(db, key).select(
        key, "n_left", "n_right", (F.col("n_left") * F.col("n_right")).alias("pairs")
    )
    total = deg.agg(F.sum("pairs").cast("bigint").alias("total_pairs"))
    w = Window.orderBy(F.col("pairs").desc(), F.col(key))
    return (
        deg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .crossJoin(F.broadcast(total))
        .select(
            key,
            "n_left",
            "n_right",
            "pairs",
            F.round(
                F.col("pairs").cast("double") / F.col("total_pairs").cast("double"), 6
            ).alias("pct_of_total"),
            "total_pairs",
            "rank",
        )
    )


def estimate_join_rows(left: DataFrame, right: DataFrame, key: str) -> int:
    """EXACT |left ⋈ right| on ``key`` without executing the join:
    sum over distinct keys of deg_left(k) * deg_right(k) — the scalar
    form of :func:`join_size_by_degree` (which additionally names the
    heavy keys). Two map-side-combinable degree aggregations + one
    join at distinct-key cardinality; pure integer math, so the
    estimate is bit-identical cross-engine."""
    da = left.groupBy(key).agg(F.count("*").cast("bigint").alias("__nl"))
    db = right.groupBy(key).agg(F.count("*").cast("bigint").alias("__nr"))
    r = (
        da.join(db, key)
        .agg(
            F.coalesce(F.sum(F.col("__nl") * F.col("__nr")), F.lit(0))
            .cast("bigint")
            .alias("n")
        )
        .first()
    )
    return int(r.n)


def plan_join_chain(
    tables: dict[str, DataFrame],
    edges: list[tuple[str, str, str]],
    step_joiner=None,
) -> tuple[DataFrame, dict]:
    """Statistics-driven JOIN-ORDER planning for a chain/tree of
    equi-joins (r11) — the step above :func:`plan_equi_join`'s
    physical-strategy choice: before any strategy matters, joining in
    the wrong ORDER (two facts first, the dimension last) can
    materialize an intermediate orders of magnitude larger than the
    final result. Spark's CBO reorders joins only with pre-collected
    ANALYZE TABLE statistics, which ad-hoc pipeline inputs never have;
    this derives the needed cardinalities from the data itself.

    ``edges`` are ``(table_a, table_b, key)`` with ``key`` a column
    present in both frames (alias beforehand); the edge set must form
    a connected acyclic graph over ``tables`` (a chain or star — the
    shapes a key-structured pipeline join has).

    Algorithm (classic System R greedy, left-deep):

    1. price every edge EXACTLY: |A ⋈ B| via :func:`estimate_join_rows`
       (degree aggregations at distinct-key cardinality — the
       pre-flight cost, never the join output);
    2. start from the cheapest edge (ties: lexicographic edge label);
    3. repeatedly attach the frontier table minimizing the CHAINED
       estimate ``est(R ⋈ T) = est(R) * |X ⋈ T| div |X|`` where X is
       the already-joined endpoint — the textbook
       containment/uniformity assumption, in integer math so the
       whole decision is cross-engine oracle-able.

    Returns ``(joined, decision)``: the left-deep join in the chosen
    order (output rows/semantics identical to any other order), and
    ``decision`` = {"edge_rows": {label: exact}, "n_rows": {table:
    exact}, "order": [labels], "est_rows": [chained ints]}.

    ``step_joiner(left, right, key) -> DataFrame`` (optional) executes
    each step instead of the plain ``.join`` — pass a
    ``skew.plan_equi_join`` wrapper to compose the two planners
    (ORDER here, physical strategy per step there); it must preserve
    inner-equi-join semantics. The wrapper's decisions land in
    ``decision["step_decisions"]`` if the callable returns
    ``(df, dict)`` pairs."""
    if not edges:
        raise ValueError("plan_join_chain needs at least one edge")
    names = set(tables)
    for a, b, _k in edges:
        if a not in names or b not in names:
            raise ValueError(f"edge ({a}, {b}) references unknown table")
    if len(edges) != len(names) - 1:
        raise ValueError(
            f"{len(names)} tables need exactly {len(names) - 1} edges "
            f"(a connected acyclic chain/tree), got {len(edges)}"
        )

    def _label(a: str, b: str) -> str:
        return f"{a}*{b}"

    # Up-front shape validation (ADVICE r11): (a) parallel edges
    # between the same table pair collide in the 'a*b' label and would
    # silently overwrite edge_rows; (b) the canonical final select is
    # by NAME over all tables' non-key columns, so a non-key column
    # name shared by two tables would only surface as an
    # ambiguous-reference error at execution time. Fail loudly now,
    # like the other shape checks.
    seen_labels: set[str] = set()
    for a, b, _k in edges:
        for lbl in (_label(a, b), _label(b, a)):
            if lbl in seen_labels:
                raise ValueError(
                    f"duplicate edge between tables {a!r} and {b!r} — "
                    "parallel edges are not a chain/tree; pre-join or "
                    "alias one side"
                )
        seen_labels.add(_label(a, b))
    edge_keys = {k for _a, _b, k in edges}
    col_owner: dict[str, str] = {}
    for t, df in tables.items():
        for c in df.columns:
            if c in edge_keys:
                continue
            if c in col_owner:
                raise ValueError(
                    f"non-key column {c!r} appears in both tables "
                    f"{col_owner[c]!r} and {t!r} — the joined frame would "
                    "carry duplicate names; rename/alias before planning"
                )
            col_owner[c] = t

    # 1. exact per-edge pricing + per-table row counts (the row count
    # is the degree sum, so it falls out of the same aggregations; a
    # plain count() keeps the code obvious — both are one scan).
    # All pre-flight jobs are mutually independent 1-row aggregates, so
    # they are submitted CONCURRENTLY from a small driver pool (guide
    # §2.6 "overlap independent jobs"): Spark's scheduler interleaves
    # their tasks, so the pre-flight wall clock is ~max instead of sum
    # — on a cluster the later jobs back-fill executors idled by the
    # earlier jobs' stage tails. Decisions are unchanged: the same
    # exact statistics arrive, just sooner. CAVEAT (r16 ADVICE): jobs
    # submitted from pool workers do NOT inherit the caller thread's
    # Spark local properties — job groups/descriptions, scheduler
    # pool, job tags — so setJobGroup/cancelJobGroup does not scope
    # these pre-flight jobs, and a failed future's siblings run to
    # completion before the exception surfaces. A harness that needs
    # cancellation scoping should set the properties inside a submit
    # wrapper (sc.setLocalProperty per worker).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        edge_futs = {
            _label(a, b): pool.submit(
                estimate_join_rows, tables[a], tables[b], k
            )
            for a, b, k in edges
        }
        count_futs = {t: pool.submit(df.count) for t, df in tables.items()}
        edge_rows = {lbl: f.result() for lbl, f in edge_futs.items()}
        n_rows = {t: int(f.result()) for t, f in count_futs.items()}

    step_decisions: list = []

    def _join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
        if step_joiner is None:
            return left.join(right, key)
        out = step_joiner(left, right, key)
        if isinstance(out, tuple):  # (df, decision) — plan_equi_join shape
            step_decisions.append(out[1])
            return out[0]
        return out

    # 2. cheapest starting edge
    start = min(edges, key=lambda e: (edge_rows[_label(e[0], e[1])], _label(e[0], e[1])))
    a0, b0, k0 = start
    joined = _join(tables[a0], tables[b0], k0)
    in_plan = {a0, b0}
    order = [_label(a0, b0)]
    est = edge_rows[_label(a0, b0)]
    est_rows = [est]

    # 3. greedily attach the frontier table with the smallest chained
    # estimate until every table is in the plan
    remaining = [e for e in edges if e is not start]
    while remaining:
        best = None
        for e in remaining:
            a, b, k = e
            if (a in in_plan) == (b in in_plan):
                continue  # not a frontier edge (yet), or would cycle
            anchor, new = (a, b) if a in in_plan else (b, a)
            chained = est * edge_rows[_label(a, b)] // max(n_rows[anchor], 1)
            cand = (chained, _label(a, b), e, new, k)
            if best is None or cand[:2] < best[:2]:
                best = cand
        if best is None:
            raise ValueError("edges do not form a connected chain/tree")
        chained, label, e, new, k = best
        joined = _join(joined, tables[new], k)
        in_plan.add(new)
        order.append(label)
        est = chained
        est_rows.append(est)
        remaining.remove(e)

    # canonical column order, independent of the chosen join order:
    # join keys in edge-list order, then each table's remaining
    # columns in the caller's ``tables`` order (so two different
    # plans over the same inputs produce position-identical frames).
    keys_in_order: list[str] = []
    for _a, _b, k in edges:
        if k not in keys_in_order:
            keys_in_order.append(k)
    rest = [
        c
        for t in tables
        for c in tables[t].columns
        if c not in keys_in_order
    ]
    joined = joined.select(*keys_in_order, *rest)

    decision = {
        "edge_rows": edge_rows,
        "n_rows": n_rows,
        "order": order,
        "est_rows": est_rows,
    }
    if step_decisions:
        decision["step_decisions"] = step_decisions
    return joined, decision
