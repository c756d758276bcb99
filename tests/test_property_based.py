"""Property-based differential tests (hypothesis): the custom operators
whose semantics mirror a well-defined external reference are checked
against that reference on generated inputs, not just fixtures —
asof_join_backward vs pandas.merge_asof, ngram_jaccard_pairs vs a
brute-force python Jaccard, and the hash sampler/split invariants."""

from __future__ import annotations

import itertools

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.functions.partitioning import hash_split
from evidence_images_etl_airflow_spark.operators.asof import asof_join_backward
from evidence_images_etl_airflow_spark.operators.dedup import ngram_jaccard_pairs

# one shared strategy: small keyed event tables with int timestamps
_ts = st.integers(min_value=0, max_value=100)
_key = st.sampled_from(["a", "b"])

_left_rows = st.lists(st.tuples(_key, _ts), min_size=1, max_size=12)
_right_rows = st.lists(
    st.tuples(_key, _ts, st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32))),
    min_size=0,
    max_size=12,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(left=_left_rows, right=_right_rows)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    # right side must be unique per (key, ts) — documented precondition
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())
    ldf = spark.createDataFrame(left, "key string, ts long")
    rdf = spark.createDataFrame(right, "key string, rts long, px double")
    out = asof_join_backward(
        ldf, rdf, keys=["key"], left_ts="ts", right_ts="rts", payload=["px"]
    ).toPandas()

    lp = pd.DataFrame(left, columns=["key", "ts"]).sort_values("ts", kind="stable")
    rp = pd.DataFrame(right, columns=["key", "rts", "px"]).sort_values("rts", kind="stable")
    if len(rp):
        expected = pd.merge_asof(
            lp, rp, left_on="ts", right_on="rts", by="key", direction="backward"
        )
    else:
        expected = lp.assign(px=None)

    got = sorted(
        ((r.key, r.ts, None if pd.isna(r.px) else round(r.px, 6)) for r in out.itertuples()),
    )
    want = sorted(
        ((r.key, r.ts, None if pd.isna(r.px) else round(r.px, 6)) for r in expected.itertuples()),
    )
    assert got == want


_doc = st.lists(st.sampled_from(["red", "green", "blue", "dog", "cat"]), min_size=0, max_size=8)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(docs=st.lists(_doc, min_size=2, max_size=6))
def test_ngram_jaccard_matches_bruteforce(spark, docs):
    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=2, threshold=0.0, max_doc_freq=None
        ).collect()
    }

    def shingles(d):
        return {" ".join(d[i : i + 2]) for i in range(len(d) - 1)}

    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(docs), 2):
        sa, sb = shingles(a), shingles(b)
        inter = len(sa & sb)
        if inter:  # blocked candidates: pairs exist only on shared shingles
            want[(i, j)] = round(inter / len(sa | sb), 6)
    assert out == want


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=50, unique=True))
def test_hash_split_partition_invariant(spark, ids):
    # split assignment is a pure function of the id: any subset of rows,
    # any partitioning, same verdicts
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    full = {
        r.doc_id: r.split
        for r in hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    sub = {
        r.doc_id: r.split
        for r in hash_split(
            df.repartition(5).limit(len(ids)), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert sub == full


def test_group_split_no_leakage(spark):
    """Hashing the GROUP column means a group never straddles splits:
    every doc from one source gets that source's split — the property
    that keeps near-duplicate pages within a domain out of both train
    and test at once."""
    rows = [(i, f"src{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = hash_split(
        df, "source", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="gsplit"
    )
    per_source = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("k"))
        .collect()
    )
    assert all(r.k == 1 for r in per_source)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    base=st.lists(
        st.sampled_from("abcdefgh"), min_size=10, max_size=20
    ),
    offset_a=st.integers(min_value=0, max_value=8),
    offset_b=st.integers(min_value=0, max_value=8),
)
def test_winnowing_guarantee_on_generated_overlaps(spark, base, offset_a, offset_b):
    """Schleimer et al. theorem, property-tested: whenever two docs
    share a contiguous token run of length >= w+k-1, winnowing selects
    at least one common fingerprint in both."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        winnowing_pairs,
    )

    k, w = 3, 4
    shared = [f"s{i}" for i in range(w + k - 1)]  # 6 unique shared tokens
    doc_a = [f"a{i}" for i in range(offset_a)] + shared + ["atail1", "atail2"]
    doc_b = [f"b{i}" for i in range(offset_b)] + shared + ["btail1", "btail2", "btail3"]
    df = spark.createDataFrame(
        [(1, " ".join(doc_a)), (2, " ".join(doc_b)), (3, " ".join(base))],
        "doc_id long, text string",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in winnowing_pairs(
            df, "doc_id", "text", k=k, w=w, min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    xs=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60, unique=True),
    ys=st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60, unique=True),
    k=st.sampled_from([4, 8, 16]),
)
def test_kmv_union_merge_equals_direct_sketch(spark, xs, ys, k):
    """Mergeability property: kmv_union of two group sketches equals
    the sketch built directly over the concatenated data, for any
    inputs and any k — the invariant that licenses per-batch sketching
    with later merges."""
    from evidence_images_etl_airflow_spark.operators.sketches import (
        kmv_sketches,
        kmv_union,
    )

    rows = [("x", v) for v in xs] + [("y", v) for v in ys] + [
        ("u", v) for v in set(xs) | set(ys)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    sk = {r.g: r.kmv for r in kmv_sketches(df, ["g"], "v", k=k).collect()}
    merged = (
        spark.range(1)
        .select(
            kmv_union(
                F.array(*[F.lit(v) for v in sk["x"]]),
                F.array(*[F.lit(v) for v in sk["y"]]),
                k,
            ).alias("u")
        )
        .collect()[0]
        .u
    )
    assert merged == sk["u"]


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    docs=st.lists(_doc, min_size=2, max_size=6),
    threshold=st.sampled_from([0.2, 0.34, 0.5, 0.55, 0.75, 0.9]),
)
def test_prefix_filter_lossless_on_generated_corpora(spark, docs, threshold):
    """The AllPairs/PPJoin completeness theorem, checked against the
    same brute-force reference as the blocked join: for ANY generated
    corpus and threshold, the prefix-filtered join returns exactly the
    pairs with shingle-Jaccard >= t (after the repo's 6dp round)."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_pairs(
            df, "doc_id", "text", n=2, threshold=threshold
        ).collect()
    }

    def shingles(d):
        return {" ".join(d[i : i + 2]) for i in range(len(d) - 1)}

    want = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(docs), 2):
        sa, sb = shingles(a), shingles(b)
        inter = len(sa & sb)
        if inter:
            jac = round(inter / len(sa | sb), 6)
            if jac >= threshold:
                want[(i, j)] = jac
    assert out == want


_snapshot_rows = st.dictionaries(
    st.integers(min_value=0, max_value=30),  # key
    st.tuples(
        st.sampled_from(["a", "b", None]),   # payload s (NULLs included)
        st.integers(min_value=-5, max_value=5),  # payload p
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(v1=_snapshot_rows, v2=_snapshot_rows)
def test_apply_table_diff_identity_property(spark, v1, v2):
    """r11 CDF law, property form: for ANY two keyed snapshots —
    arbitrary inserts/deletes/updates, NULL payloads included —
    apply(v1, table_diff(v1, v2)) reconstructs v2 exactly."""
    from evidence_images_etl_airflow_spark.operators.recon import (
        apply_table_diff,
        table_diff,
    )

    def frame(d):
        rows = [(k, s, p) for k, (s, p) in sorted(d.items())]
        return spark.createDataFrame(
            rows, "k long, s string, p long"
        ) if rows else spark.createDataFrame([], "k long, s string, p long")

    f1, f2 = frame(v1), frame(v2)
    got = apply_table_diff(f1, table_diff(f1, f2, ["k"]), ["k"])
    assert got.exceptAll(f2).count() == 0
    assert f2.exceptAll(got).count() == 0


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # coarse score grid -> ties
            st.integers(min_value=0, max_value=1),
        ),
        min_size=2,
        max_size=30,
    )
)
def test_roc_auc_matches_bruteforce_pairwise(spark, rows):
    """roc_auc's block prefix-sum formulation == the O(P·N) pairwise
    definition (wins + half-ties), on generated tied data."""
    from evidence_images_etl_airflow_spark.operators.ml_curation import roc_auc

    df = spark.createDataFrame(
        [(s / 20.0, y) for s, y in rows], "score double, y int"
    )
    r = roc_auc(df, "score", "y").collect()[0]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    if not pos or not neg:
        assert r["auc"] is None and r["gini_rank"] is None
        return
    u = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos
        for n in neg
    )
    auc = u / (len(pos) * len(neg))
    assert r["auc"] == round(auc, 6)
    assert r["gini_rank"] == round(2 * auc - 1, 6)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=25
    )
)
def test_gini_concentration_matches_sorted_formula(spark, vals):
    """gini_concentration's value-block formulation == the textbook
    sorted Σ i·x_i formula and an explicit top-slice take."""
    from evidence_images_etl_airflow_spark.operators.quality import (
        gini_concentration,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = gini_concentration(df, "v", top_fraction=0.3).collect()[0]
    n, s = len(vals), sum(vals)
    assert r["n"] == n and r["value_total"] == float(s)
    if s == 0:
        assert r["gini"] is None and r["top_share"] is None
        return
    xs = sorted(vals)
    gini = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * s) - (n + 1) / n
    k = (n * 3) // 10
    top = sum(sorted(vals, reverse=True)[:k])
    assert r["gini"] == round(gini, 6)
    assert r["top_share"] == round(top / s, 6)
