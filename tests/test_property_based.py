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


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ys=st.lists(st.integers(min_value=0, max_value=50), min_size=2, max_size=24))
def test_cusum_matches_bruteforce_argmax(spark, ys):
    from evidence_images_etl_airflow_spark.operators.timeseries import (
        cusum_changepoint,
    )

    df = spark.createDataFrame(list(enumerate(ys, 1)), "d bigint, y bigint")
    r = cusum_changepoint(df, "d", "y").collect()[0]

    n, t = len(ys), sum(ys)
    pref, best = 0, None
    for i, y in enumerate(ys, 1):
        pref += y
        ns = n * pref - i * t
        # max |NS|, earliest day wins ties
        if best is None or abs(ns) > best[0]:
            best = (abs(ns), i, pref)
    assert (r["n_days"], r["total"]) == (n, t)
    assert (r["cp_index"], r["cp_day"]) == (best[1], best[1])
    assert r["ns_abs_max"] == float(best[0])
    assert r["mean_before"] == round(best[2] / best[1], 6)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(ys=st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=20))
def test_ewma_matches_bruteforce_weights(spark, ys):
    from evidence_images_etl_airflow_spark.operators.timeseries import (
        ewma_smooth,
    )

    df = spark.createDataFrame(list(enumerate(ys, 1)), "d bigint, y bigint")
    out = {
        r["d"]: r
        for r in ewma_smooth(
            df, "d", "y", decay_num=7, decay_den=10, window=8
        ).collect()
    }
    weights = [7**k * 10 ** (7 - k) for k in range(8)]
    for t in range(1, len(ys) + 1):
        num = den = 0
        for k, w in enumerate(weights):
            if t - 1 - k >= 0:
                num += ys[t - 1 - k] * w
                den += w
        assert out[t]["ewma"] == round(num / den, 6)
        assert out[t]["resid"] == round((ys[t - 1] * den - num) / den, 6)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(vals=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=30))
def test_abc_matches_bruteforce_rowwise_assignment(spark, vals):
    from evidence_images_etl_airflow_spark.operators.quality import (
        abc_classification,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    out = {r["cls"]: r for r in abc_classification(df, "v").collect()}

    # brute force: sort desc, assign each ROW by where its cumulative
    # value STARTS relative to the 70%/90% boundaries
    t = sum(vals)
    want = {"A": [0, 0], "B": [0, 0], "C": [0, 0]}  # [count, value]
    cum = 0
    for v in sorted(vals, reverse=True):
        if v > 0 and 10 * cum < 7 * t:
            cls = "A"
        elif v > 0 and 10 * cum < 9 * t:
            cls = "B"
        else:
            cls = "C"
        want[cls][0] += 1
        want[cls][1] += v
        cum += v
    for cls in ("A", "B", "C"):
        assert out[cls]["n_items"] == want[cls][0], (cls, vals)
        assert out[cls]["value_sum"] == float(want[cls][1]), (cls, vals)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_score_alignment_matches_bruteforce_midranks(spark, rows):
    from evidence_images_etl_airflow_spark.operators.ml_curation import (
        source_score_alignment,
    )

    df = spark.createDataFrame(
        [(s, v / 10.0) for s, v in rows], "source string, score double"
    )
    out = {
        r["source"]: r
        for r in source_score_alignment(df, "source", "score").collect()
    }

    scores = sorted(v / 10.0 for _, v in rows)
    n = len(scores)

    def midrank(x):
        lo = sum(1 for s in scores if s < x)
        c = sum(1 for s in scores if s == x)
        return lo + (c + 1) / 2

    med = scores[(n + 1) // 2 - 1]  # exact lower median value
    by_src = {}
    for s, v in rows:
        by_src.setdefault(s, []).append(v / 10.0)
    for s, vs in by_src.items():
        r = out[s]
        assert r["n_docs"] == len(vs)
        assert r["mean_pctile"] == round(
            sum(midrank(x) for x in vs) / (len(vs) * n), 6
        )
        assert r["n_above_median"] == sum(1 for x in vs if x > med)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.tuples(
                st.integers(-50, 50), st.integers(-50, 50)
            ),
        ),
        min_size=4,
        max_size=24,
    ).filter(lambda r: len({lbl for lbl, _ in r}) >= 2)
)
def test_silhouette_matches_numpy_bruteforce(spark, rows):
    from evidence_images_etl_airflow_spark.operators.similarity import (
        label_centroid_silhouette,
    )

    data = [
        (i, [float(a), float(b)], lbl)
        for i, (lbl, (a, b)) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<double>, label int"
    )
    out = {
        r["label"]: r
        for r in label_centroid_silhouette(
            df, "vec_id", "embedding", "label"
        ).collect()
    }

    # brute force with the SAME rounding discipline: centroid
    # components are decimal-exact sums / count, silhouettes rounded
    # to 6dp before averaging
    from collections import defaultdict

    groups = defaultdict(list)
    for _, vec, lbl in data:
        groups[lbl].append(vec)
    cents = {
        lbl: [sum(v[d] for v in vs) / len(vs) for d in range(2)]
        for lbl, vs in groups.items()
    }
    per_label = defaultdict(list)
    for _, vec, lbl in data:
        d2 = {
            cl: (vec[0] - c[0]) ** 2 + (vec[1] - c[1]) ** 2
            for cl, c in cents.items()
        }
        a = d2[lbl]
        b = min(v for cl, v in d2.items() if cl != lbl)
        s = 0.0 if max(a, b) == 0 else round((b - a) / max(a, b), 6)
        per_label[lbl].append(s)
    for lbl, sils in per_label.items():
        r = out[lbl]
        assert r["n_vectors"] == len(sils)
        assert r["n_negative"] == sum(1 for s in sils if s < 0)
        assert abs(r["mean_silhouette"] - round(sum(sils) / len(sils), 6)) <= 2e-6


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    cents=st.lists(
        st.integers(min_value=0, max_value=500_000), min_size=3, max_size=40
    )
)
def test_poisson_bootstrap_matches_hashlib_reimplementation(spark, cents):
    """Cross-IMPLEMENTATION check: the whole bootstrap (md5 draws,
    integer-CDF weights, replicate means, rank-1/39 order statistics)
    recomputed in pure Python via hashlib — independent md5 code path,
    independent arithmetic — must reproduce the operator's row."""
    import hashlib

    from evidence_images_etl_airflow_spark.operators.sketches import (
        POISSON1_CDF_1E6,
        poisson_bootstrap_mean_ci,
    )

    rows = [(i, c / 100.0) for i, c in enumerate(cents)]
    df = spark.createDataFrame(rows, "id bigint, price double")
    r = poisson_bootstrap_mean_ci(
        df, "id", "price", replicates=40, salt="boot"
    ).collect()[0]

    def weight(b, i):
        # r13 substream draw: one digest per group of 4 replicates,
        # replicate b reads 8-hex window b % 4
        g, j = divmod(b, 4)
        h = hashlib.md5(f"boot:{g}:{i}".encode()).hexdigest()
        u = int(h[8 * j:8 * j + 8], 16) % 1_000_000
        return sum(u >= t for t in POISSON1_CDF_1E6)

    means = []
    for b in range(40):
        ws = [(weight(b, i), c) for i, c in enumerate(cents)]
        n = sum(w for w, _ in ws)
        if n > 0:
            s = sum(w * c for w, c in ws)
            means.append((round(s / (n * 100.0), 6), b))
    means.sort()
    assert r["n_total"] == len(cents)
    assert r["n_replicates"] == len(means)
    assert r["exact_mean"] == round(
        sum(cents) / (len(cents) * 100.0), 6
    )
    if len(means) >= 39:
        assert r["boot_lo"] == means[0][0]   # rank 1 of 40
        assert r["boot_hi"] == means[38][0]  # rank 39 of 40


_gopher_word = st.sampled_from(
    ["the", "be", "to", "of", "word", "a", "#tag", "...", "12", "-", "*"]
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    lines=st.lists(
        st.lists(_gopher_word, min_size=0, max_size=20), min_size=1, max_size=4
    )
)
def test_gopher_rules_match_python_re_reimplementation(spark, lines):
    """Cross-implementation check against Python's `re` (independent
    regex engine from the JVM's): every rule boolean and count must
    agree on generated texts mixing stopwords, symbols, bullets,
    ellipses, and blank lines."""
    import re

    from evidence_images_etl_airflow_spark.functions.text import (
        GOPHER_STOPWORDS,
        gopher_rule_columns,
    )

    text = "\n".join(" ".join(ws) for ws in lines)
    df = spark.createDataFrame([(0, text)], "doc_id bigint, text string")
    cols = gopher_rule_columns(F.col("text"))
    got = df.select(*[v.alias(k) for k, v in cols.items()]).collect()[0]

    # trim() in BOTH engines strips SPACES only (not newlines) — the
    # reference must mirror that, not Python's broader str.strip()
    # (hypothesis found the divergence on a lone-"\n" text)
    toks = re.split(r"\s+", text.strip(" "))
    tlines = text.split("\n")
    n_words, n_lines = len(toks), len(tlines)
    sum_len = sum(len(w) for w in toks)
    n_hash = text.count("#")
    n_ell = len(text.split("...")) - 1
    n_bullet = sum(1 for l in tlines if re.search(r"^[ \t]*[-*]", l))
    n_ellend = sum(1 for l in tlines if re.search(r"\.\.\.[ \t]*$", l))
    n_alpha = sum(1 for w in toks if re.search(r"[A-Za-z]", w))
    low = [w.lower() for w in toks]
    n_stop = sum(1 for sw in GOPHER_STOPWORDS if sw in low)

    assert got["n_words"] == n_words and got["n_lines"] == n_lines
    assert got["n_stopwords"] == n_stop
    assert got["r_word_count"] == (50 <= n_words <= 100000)
    assert got["r_mean_word_len"] == (3 * n_words <= sum_len <= 10 * n_words)
    assert got["r_symbol_ratio"] == (10 * (n_hash + n_ell) <= n_words)
    assert got["r_bullet_lines"] == (10 * n_bullet <= 9 * n_lines)
    assert got["r_ellipsis_lines"] == (10 * n_ellend <= 3 * n_lines)
    assert got["r_alpha_words"] == (10 * n_alpha >= 8 * n_words)
    assert got["r_stopwords"] == (n_stop >= 2)


_psi_vals = st.lists(
    st.tuples(
        st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
        st.booleans(),  # True -> 'cur', False -> 'ref'
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(vals=_psi_vals)
def test_psi_total_properties_on_arbitrary_slices(spark, vals):
    """PSI invariants over arbitrary slice assignments, INCLUDING the
    one-sided slices the r15 empty-slice guard exists for: (a) never
    crashes, one psi per feature repeated on every bin row; (b)
    symmetric — swapping ref/cur preserves the total (the formula is
    a J-divergence; proportions are 6dp-rounded on both sides so the
    rounding is slice-symmetric too); (c) identical slices give
    exactly 0."""
    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.operators.drift import psi_report

    df = spark.createDataFrame(
        [(float(v), b) for v, b in vals], "x double, is_cur boolean"
    )
    per = F.when(F.col("is_cur"), "cur").otherwise("ref")
    rows = psi_report(df, per, numeric_cols=("x",), n_bins=5).collect()
    assert rows
    psis = {r.psi for r in rows}
    assert len(psis) == 1  # the feature total on every bin row
    psi = psis.pop()
    assert psi == psi and psi >= 0.0  # defined, non-negative

    flipped = psi_report(
        df, F.when(F.col("is_cur"), "ref").otherwise("cur"),
        numeric_cols=("x",), n_bins=5,
    ).collect()
    assert {r.psi for r in flipped} == {psi}  # symmetric

    same = psi_report(
        df.withColumn("__copy", F.lit(True)),
        F.when(F.col("__copy"), "ref").otherwise("cur"),
        numeric_cols=("x",), n_bins=5,
    )
    # identical-slice baseline: ref == everything, cur empty is the
    # eps-floor case; true zero needs BOTH slices populated
    # identically — tag by row duplication instead
    both = df.select("x", F.lit("ref").alias("p")).unionAll(
        df.select("x", F.lit("cur").alias("p"))
    )
    zero = psi_report(
        both, F.col("p"), numeric_cols=("x",), n_bins=5
    ).collect()
    assert {r.psi for r in zero} == {0.0}
    assert same.count() >= 1  # eps-floor path executes, no crash
