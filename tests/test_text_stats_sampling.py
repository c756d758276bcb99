"""Unit tests for the corpus-quality stats (repetition, contamination)
and the deterministic stratified sampler."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.functions.partitioning import (
    stratified_hash_sample,
    temperature_fractions,
)
from evidence_images_etl_airflow_spark.functions.text import scrub_pii
from evidence_images_etl_airflow_spark.operators.text_stats import (
    cooccurrence_pmi,
    dictionary_encode,
    length_percentile_trim,
    ngram_contamination,
    pack_documents,
    repetition_signals,
)


def test_repetition_signals_detects_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),  # one bigram repeated 4x
            (2, "the quick brown fox jumps"),  # all bigrams distinct
            (3, "one"),  # < n tokens -> zeros
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in repetition_signals(docs, "doc_id", "text", n=2).collect()}
    assert out[1]["n_ngrams"] == 4
    assert out[1]["dup_ngram_fraction"] == 0.75  # 1 distinct of 4
    assert out[1]["top_ngram_share"] == 1.0
    assert out[2]["dup_ngram_fraction"] == 0.0
    assert out[2]["top_ngram_share"] == 0.25
    assert out[3]["n_ngrams"] == 0
    assert out[3]["dup_ngram_fraction"] == 0.0


def test_ngram_contamination_finds_leaked_spans(spark):
    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "unrelated words entirely here now")],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "XX alpha beta gamma delta YY"), (101, "nothing in common at all")],
        ["doc_id", "text"],
    )
    out = ngram_contamination(train, ev, "doc_id", "text", n=3).collect()
    pairs = {(r["eval_id"], r["train_id"]): r["shared_ngrams"] for r in out}
    # eval 100 shares exactly the 3-grams "alpha beta gamma" and
    # "beta gamma delta" with train 1
    assert pairs == {(100, 1): 2}


def test_stratified_sample_superset_and_determinism(spark):
    df = spark.range(0, 2000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("books").alias("src"),
    )
    small = stratified_hash_sample(df, "id", "src", {"web": 0.2, "books": 1.0})
    big = stratified_hash_sample(df, "id", "src", {"web": 0.6, "books": 1.0})
    small_ids = {r["id"] for r in small.collect()}
    big_ids = {r["id"] for r in big.collect()}
    assert small_ids <= big_ids  # growing a fraction only adds rows
    # all of books kept
    assert len([i for i in big_ids if i % 2 == 1]) == 1000
    # web fraction lands near its target
    n_web = len([i for i in small_ids if i % 2 == 0])
    assert 130 <= n_web <= 270
    # deterministic across invocations
    again = {r["id"] for r in
             stratified_hash_sample(df, "id", "src", {"web": 0.2, "books": 1.0}).collect()}
    assert again == small_ids
    # unknown strata fall back to default_fraction (0 -> dropped)
    none_kept = stratified_hash_sample(df, "id", "src", {"other": 1.0})
    assert none_kept.count() == 0
    with pytest.raises(ValueError):
        stratified_hash_sample(df, "id", "src", {"web": 1.5})


def test_temperature_fractions_flatten_the_head(spark):
    df = spark.createDataFrame(
        [("en",)] * 900 + [("sw",)] * 100, "lang string"
    )
    # alpha=1: natural mixture, equal keep-fractions
    f1 = temperature_fractions(df, "lang", alpha=1.0)
    assert f1 == {"en": 1.0, "sw": 1.0}
    # alpha<1 downsamples the dominant stratum; rare keeps everything
    f = temperature_fractions(df, "lang", alpha=0.5)
    assert f["sw"] == 1.0
    # f_en / f_sw = (p_en/p_sw)^(alpha-1) = 9^-0.5 = 1/3
    assert abs(f["en"] - 1 / 3) < 1e-9
    # realized mixture is flatter than natural: en share drops from 0.9
    kept = stratified_hash_sample(df.withColumn("id", F.monotonically_increasing_id()),
                                  "id", "lang", f).groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in kept}
    en_share = got["en"] / (got["en"] + got["sw"])
    assert 0.5 < en_share < 0.9
    with pytest.raises(ValueError):
        temperature_fractions(df, "lang", alpha=0)


def test_length_percentile_trim_closed_interval(spark):
    df = spark.createDataFrame([(i, i) for i in range(1, 101)], "id long, n long")
    kept = {r["id"] for r in length_percentile_trim(df, "id", "n", 0.1, 0.9).collect()}
    # p10 of 1..100 (interpolated) = 10.9, p90 = 90.1 -> keep 11..90
    assert kept == set(range(11, 91))


def test_pack_documents_budget_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(40)] + [(1000, 5000)],  # one oversized doc
        "doc_id long, tok int",
    )
    out = pack_documents(df, "doc_id", "tok", budget=300, shards=4).collect()
    by_pack = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append(r)
    # quotient-packing invariant: all docs in a pack START within one
    # budget window, so total minus the last doc is under budget
    for pid, rows in by_pack.items():
        rows.sort(key=lambda r: r["doc_id"])
        total = sum(r["tok"] for r in rows)
        assert total - rows[-1]["tok"] < 300
    # every doc appears exactly once
    assert sorted(r["doc_id"] for r in out) == sorted(
        list(range(40)) + [1000]
    )
    # deterministic across partitionings
    again = pack_documents(df.repartition(7), "doc_id", "tok", budget=300, shards=4).collect()
    assert {(r["doc_id"], r["pack_id"]) for r in again} == {
        (r["doc_id"], r["pack_id"]) for r in out
    }
    with pytest.raises(ValueError):
        pack_documents(df, "doc_id", "tok", budget=0)


def test_scrub_pii_redacts_typed_spans(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@foo.co.uk now"),
            (2, "server 192.168.1.254 down"),
            (3, "call +44 20 7946 0958 or 555-123-4567"),
            (4, "nothing sensitive here v2.0"),
        ],
        ["id", "text"],
    )
    out = {r["id"]: r["s"] for r in df.select("id", scrub_pii("text").alias("s")).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server <IP> down"
    assert out[3] == "call <PHONE> or <PHONE>"
    assert out[4] == "nothing sensitive here v2.0"


def test_dictionary_encode_vocab_order_and_unk(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a rare b")],
        ["doc_id", "text"],
    )
    out = {r["id"]: r["token_ids"] for r in
           dictionary_encode(docs, "doc_id", "text", vocab_size=2).collect()}
    # vocab: b (4) -> 0, a (3) -> 1; c and rare are OOV -> -1
    assert out[1] == [0, 0, 0, 1, 1, -1]
    assert out[2] == [1, -1, 0]


def test_source_reputation_dup_rate_and_filter(spark):
    from evidence_images_etl_airflow_spark.operators.text_stats import (
        source_reputation,
        source_reputation_filter,
    )

    rows = (
        # good: 4 docs, all unique, quality 0.8
        [(i, "good", 0.8, f"fp{i}") for i in range(4)]
        # spammy: 4 docs but only 1 distinct fingerprint -> dup_rate 0.75
        + [(10 + i, "spam", 0.9, "same") for i in range(4)]
        # lowq: unique but quality 0.2
        + [(20 + i, "lowq", 0.2, f"lfp{i}") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, quality double, fp string")
    rep = {r["source"]: r for r in source_reputation(df, "source", "quality", "fp").collect()}
    assert rep["spam"]["dup_rate"] == 0.75 and rep["good"]["dup_rate"] == 0.0
    assert rep["lowq"]["mean_quality"] == 0.2
    kept = source_reputation_filter(
        df, "source", "quality", "fp", min_mean_quality=0.5, max_dup_rate=0.5
    )
    assert {r["source"] for r in kept.collect()} == {"good"}


def test_bpe_train_and_segment(spark):
    from evidence_images_etl_airflow_spark.operators.bpe import (
        bpe_segment,
        bpe_train,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "low lower lowest low low") for i in range(4)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, "text", n_merges=3)
    assert [m[0] for m in merges] == [1, 2, 3]
    # 'l o' and 'o w' both appear in every word (weighted count 20);
    # tie breaks to the lexicographically smaller pair ('l', 'o')
    assert (merges[0][1], merges[0][2]) == ("l", "o")
    assert merges[0][4] == 20
    # merged symbol of round 1 feeds round 2: 'lo w' -> 'low'
    assert merges[1][3] == "low"
    # training is deterministic across reruns
    assert bpe_train(docs, "text", n_merges=3) == merges

    seg = docs.limit(1).select(
        bpe_segment(F.lit("lowest"), merges).alias("s")
    ).first()["s"]
    # after 3 merges ('l o', 'lo w', 'low</w>'): lowest -> low + chars
    assert seg[0] == "low"
    assert "".join(seg).replace("</w>", "") == "lowest"


def test_weighted_sample_monotone_and_deterministic(spark):
    from evidence_images_etl_airflow_spark.functions.partitioning import (
        weighted_hash_sample,
    )
    from pyspark.sql import functions as F

    base = spark.range(2000).select(
        F.col("id"), (F.col("id") % 100 / 100.0).alias("p")
    )
    lo = {r.id for r in weighted_hash_sample(base, "id", "p").collect()}
    # determinism across reruns and partitionings
    lo2 = {
        r.id
        for r in weighted_hash_sample(base.repartition(7), "id", "p").collect()
    }
    assert lo == lo2
    # raising every probability only ADDs rows (monotone supersets)
    hi = {
        r.id
        for r in weighted_hash_sample(
            base.withColumn("p", F.least(F.col("p") * 2, F.lit(1.0))), "id", "p"
        ).collect()
    }
    assert lo <= hi
    # boundary semantics: p=0 keeps nothing, p=1 keeps everything
    zero_p = {r.id for r in base.collect() if r.p == 0.0}
    assert not (lo & zero_p)
    all_in = weighted_hash_sample(
        base.withColumn("p", F.lit(1.0)), "id", "p"
    ).count()
    assert all_in == 2000
    # out-of-range probabilities clamp instead of erroring
    assert (
        weighted_hash_sample(
            base.withColumn("p", F.lit(5.0)), "id", "p"
        ).count()
        == 2000
    )


def test_weighted_reservoir_fixed_size_and_weight_bias(spark):
    """A-ES reservoir: exactly min(k, group) rows per group; across
    many salts a 10x-heavier item is sampled far more often than a
    light one; and the sample is deterministic for a fixed salt."""
    from evidence_images_etl_airflow_spark.functions.partitioning import (
        weighted_reservoir_topk,
    )

    rows = [("g", i, 1000 if i < 5 else 10) for i in range(40)] + [
        ("tiny", 100, 7),
        ("tiny", 101, 7),
    ]
    df = spark.createDataFrame(rows, "grp string, id long, w long")

    out = weighted_reservoir_topk(df, ["grp"], "w", "id", k=8, salt="s0")
    sizes = {r.grp: r.n for r in out.groupBy("grp").count().withColumnRenamed("count", "n").collect()}
    assert sizes == {"g": 8, "tiny": 2}  # exact budget; small group passes whole

    # determinism: same salt twice -> identical ids
    a = sorted(r.id for r in out.filter("grp = 'g'").collect())
    b = sorted(
        r.id
        for r in weighted_reservoir_topk(df, ["grp"], "w", "id", k=8, salt="s0")
        .filter("grp = 'g'")
        .collect()
    )
    assert a == b

    # weight bias: over 30 salts, heavy ids (w=1000) appear in nearly
    # every sample; each light id (w=10) in a minority
    heavy_hits = light_hits = 0
    for s in range(30):
        ids = {
            r.id
            for r in weighted_reservoir_topk(
                df.filter("grp = 'g'"), ["grp"], "w", "id", k=8, salt=f"m{s}"
            ).collect()
        }
        heavy_hits += sum(1 for i in range(5) if i in ids)
        light_hits += sum(1 for i in range(5, 40) if i in ids)
    # heavy inclusion rate per item vs light inclusion rate per item
    heavy_rate = heavy_hits / (5 * 30)
    light_rate = light_hits / (35 * 30)
    assert heavy_rate > 0.9
    assert light_rate < 0.35
    assert heavy_rate > 2.5 * light_rate


def test_weighted_reservoir_null_weight_ranks_last(spark):
    """Null weights behave as zero weight (taken only when the group
    lacks k positive-weight rows) — not NULLS FIRST preemption."""
    from evidence_images_etl_airflow_spark.functions.partitioning import (
        weighted_reservoir_topk,
    )

    rows = [("g", 1, None), ("g", 2, 10), ("g", 3, 10), ("g", 4, None)]
    df = spark.createDataFrame(rows, "grp string, id long, w long")
    picked = sorted(
        r.id for r in weighted_reservoir_topk(df, ["grp"], "w", "id", k=2).collect()
    )
    assert picked == [2, 3]
    # underfull group: nulls backfill after every weighted row,
    # tie-broken by id — so rank 3 is the lowest-id null row
    by_rank = {
        r.rank: r.id
        for r in weighted_reservoir_topk(df, ["grp"], "w", "id", k=3).collect()
    }
    assert sorted(by_rank) == [1, 2, 3]
    assert {by_rank[1], by_rank[2]} == {2, 3}
    assert by_rank[3] == 1


def test_shard_shuffle_deterministic_and_splice_stable(spark):
    """Appending documents never reorders existing ones' RELATIVE
    positions within a shard (they splice in at their key), and the
    layout is identical across runs."""
    from evidence_images_etl_airflow_spark.workload import REGISTRY
    import tempfile, os

    d1 = spark.createDataFrame([(i, "t") for i in range(50)], "doc_id long, text string")
    d2 = spark.createDataFrame([(i, "t") for i in range(80)], "doc_id long, text string")
    tmp = tempfile.mkdtemp()
    for name, df in [("a", d1), ("b", d2)]:
        os.makedirs(f"{tmp}/{name}", exist_ok=True)
        df.write.mode("overwrite").parquet(f"{tmp}/{name}/documents.parquet")

    fn = REGISTRY["data_shard_shuffle"].fn

    def order_map(sf):
        rows = fn(spark, sf).collect()
        return {r.doc_id: (r.shard, r.pos_in_shard) for r in rows}

    small = order_map(f"{tmp}/a")
    small_again = order_map(f"{tmp}/a")
    assert small == small_again  # run-to-run determinism
    big = order_map(f"{tmp}/b")
    # same shard assignment for surviving docs; relative order preserved
    for doc, (sh, _) in small.items():
        assert big[doc][0] == sh
    by_shard_small = {}
    by_shard_big = {}
    for doc, (sh, pos) in small.items():
        by_shard_small.setdefault(sh, []).append((pos, doc))
    for doc, (sh, pos) in big.items():
        if doc < 50:
            by_shard_big.setdefault(sh, []).append((pos, doc))
    for sh in by_shard_small:
        a = [d for _, d in sorted(by_shard_small[sh])]
        b = [d for _, d in sorted(by_shard_big[sh])]
        assert a == b  # splice stability


def test_canonicalize_url_hand_cases(spark):
    """Hand-computed canonical forms: every normalization rule hit at
    least once, plus the cases that must NOT change (non-default port,
    unknown scheme, already-canonical)."""
    from evidence_images_etl_airflow_spark.functions.text import (
        canonicalize_url,
    )

    cases = [
        # scheme/host case, www., default https port, trailing slash,
        # tracking param, param sort, fragment -- all at once
        ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag",
         "https://example.com/a/b?a=1&b=2"),
        # http default port + bare root path collapse
        ("http://example.com:80/", "http://example.com"),
        # only tracking params -> no query at all
        ("http://example.com/path?utm_campaign=z&fbclid=1&gclid=2&ref=t",
         "http://example.com/path"),
        # no path, no query -- untouched
        ("https://sub.example.com", "https://sub.example.com"),
        # NON-default port survives; params keep-and-sort
        ("https://host.com:8443/x?z=1&a=2", "https://host.com:8443/x?a=2&z=1"),
        # unknown scheme: port untouched (no default to strip)
        ("ftp://Host.com:21/file", "ftp://host.com:21/file"),
        # multiple trailing slashes
        ("https://h.co/a///", "https://h.co/a"),
        # 'reference=' is NOT the tracking param 'ref=' (anchored regex)
        ("https://h.co/a?reference=9", "https://h.co/a?reference=9"),
        # a '?' INSIDE the fragment must not resurrect a query string
        ("https://h.co/a#what?x=1", "https://h.co/a"),
        # non-hierarchical / scheme-less inputs pass through unchanged
        # instead of collapsing to the degenerate '://' key
        ("example.com/a", "example.com/a"),
        ("//cdn.example.com/lib.js", "//cdn.example.com/lib.js"),
        ("mailto:a@b.com", "mailto:a@b.com"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], ["i", "url"]
    )
    got = {
        r.i: r.c
        for r in df.select(
            "i", canonicalize_url("url").alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_strip_markup_hand_cases(spark):
    """Hand-computed visible-text extraction: script/style bodies are
    dropped wholesale (even when they contain bare < > & "), entities
    unescape exactly one level, tags become whitespace."""
    from evidence_images_etl_airflow_spark.functions.text import (
        strip_markup,
    )

    cases = [
        # script with bare < > & and quotes inside -- must vanish whole
        ('<p>a</p><script>if (1<2 && x>"y") { f(); }</script><p>b</p>',
         "a b"),
        # style block likewise
        ("<style>p > a { color: #fff; }</style>hello", "hello"),
        # entity unescape, &amp; last: literal &lt; survives one level
        ("x &amp;lt; y &lt; z &quot;q&quot; &#39;s&#39; a&nbsp;b",
         'x &lt; y < z "q" \'s\' a b'),
        # tags become separators; whitespace collapses
        ("<div>one</div><br/><span>two</span>\n\n three", "one two three"),
        # escaped markup is text, not tags
        ("&lt;script&gt;not code&lt;/script&gt;", "<script>not code</script>"),
        # no markup at all -- just trim/collapse
        ("  plain   text  ", "plain text"),
        # legacy uppercase tags: block removal is case-insensitive
        ('<SCRIPT>if (1<2) x();</SCRIPT>text', "text"),
        ("<Style>p > a {}</Style>visible", "visible"),
        # a comment containing '>' must vanish whole, not leak its tail
        ("<!-- a > b -->after", "after"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], ["i", "html"]
    )
    got = {
        r.i: r.t
        for r in df.select("i", strip_markup("html").alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_token_entropy_hand_computed(spark):
    """Hand-computed entropy/TTR: H = ln(N) - sum(cnt*ln(cnt))/N.
    'a a b b' -> ln4 - 4ln2/4 = ln2; uniform distinct -> ln(N);
    constant doc -> 0; empty doc drops out entirely."""
    import math

    from evidence_images_etl_airflow_spark.workload import REGISTRY
    import tempfile, os

    docs = spark.createDataFrame(
        [
            (1, "a a b b"),
            (2, "w x y z"),
            (3, "x x x x"),
            (4, "   "),
        ],
        ["doc_id", "text"],
    )
    tmp = tempfile.mkdtemp(prefix="entropy_t_")
    docs.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    out = {
        r.doc_id: r
        for r in REGISTRY["text_token_entropy"].fn(spark, tmp).collect()
    }
    assert set(out) == {1, 2, 3}  # the empty doc is gone
    assert out[1].entropy_nats == round(math.log(2), 6)
    assert out[1].ttr == 0.5
    assert out[2].entropy_nats == round(math.log(4), 6)
    assert out[2].ttr == 1.0
    assert out[3].entropy_nats == 0.0
    assert out[3].n_tokens == 4 and out[3].n_types == 1


def test_crossdoc_dup_fraction_hand_computed(spark):
    """Residual-dup metric: earlier-doc shingles count, same-doc first
    occurrences don't; exact copies score 1.0; short docs drop out."""
    from evidence_images_etl_airflow_spark.operators.text_stats import (
        crossdoc_dup_fraction,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),   # shingles {abc, bcd} -- all first here
            (2, "a b c x"),   # {abc (dup of 1), bcx (fresh)} -> 0.5
            (3, "a b c d"),   # exact copy of 1 -> 1.0
            (4, "x y"),       # < 3 tokens -> no shingles, absent
        ],
        ["doc_id", "text"],
    )
    out = {
        r.id: r
        for r in crossdoc_dup_fraction(docs, "doc_id", "text").collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].dup_frac == 0.0 and out[1].n_shingles == 2
    assert out[2].dup_frac == 0.5 and out[2].n_dup == 1
    assert out[3].dup_frac == 1.0 and out[3].n_dup == 2


def test_source_overlap_detects_mirror(spark):
    """A source re-hosting another's content lights up exactly one
    off-diagonal (copier, origin) cell per direction, never counting a
    (doc, shingle) pair twice."""
    import os
    import tempfile

    from evidence_images_etl_airflow_spark.workload import REGISTRY

    docs = spark.createDataFrame(
        [
            (1, "p q r s", "en", "src_a", 7),
            (2, "p q r s", "en", "src_b", 7),  # mirror of doc 1
            (3, "u v w x", "en", "src_b", 7),  # original content
            (4, "u v w y", "en", "src_a", 7),  # copies one shingle of 3
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    tmp = tempfile.mkdtemp(prefix="overlap_t_")
    docs.write.mode("overwrite").parquet(
        os.path.join(tmp, "documents.parquet")
    )
    out = {
        (r.copier_source, r.origin_source): (r.n_shingles, r.n_docs)
        for r in REGISTRY["curation_source_overlap"].fn(spark, tmp).collect()
    }
    assert out == {("src_b", "src_a"): (2, 1), ("src_a", "src_b"): (1, 1)}


def test_pack_documents_keep_cols_passthrough(spark):
    """keep_cols (r09): extra columns ride through the packing window
    unchanged, and pack assignment is identical to a run without them —
    so pipelines need no join back to their (expensive) input."""
    df = spark.createDataFrame(
        [(i, 100, f"lang{i % 3}", i / 10.0) for i in range(20)],
        "doc_id long, tok int, lang string, quality double",
    )
    plain = pack_documents(df, "doc_id", "tok", budget=300, shards=4)
    kept = pack_documents(
        df, "doc_id", "tok", budget=300, shards=4, keep_cols=("lang", "quality")
    )
    assert set(kept.columns) == {"doc_id", "tok", "shard", "pack_id", "lang", "quality"}
    got = {r["doc_id"]: r for r in kept.collect()}
    for r in plain.collect():
        k = got[r["doc_id"]]
        assert (k["shard"], k["pack_id"]) == (r["shard"], r["pack_id"])
    for i in range(20):
        assert (got[i]["lang"], got[i]["quality"]) == (f"lang{i % 3}", i / 10.0)


@pytest.fixture()
def pmi_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta delta"),
            (3, "alpha gamma delta"),
            (4, "beta gamma delta epsilon epsilon"),
        ],
        "doc_id long, text string",
    )


def test_cooccurrence_pmi_hand_case(spark, pmi_corpus):
    """4 docs, dfs alpha/beta/gamma/delta = 3 each, epsilon = 1
    (dropped by min_df=2; its in-doc duplicate also proves the
    distinct). Every surviving pair co-occurs exactly twice, so every
    PMI is ln(2*4/(3*3)) = ln(8/9); order falls to the token names."""
    import math

    out = cooccurrence_pmi(
        pmi_corpus, "doc_id", "text", min_df=2, min_pair=2
    ).collect()
    assert [(r.token_a, r.token_b) for r in out] == [
        ("alpha", "beta"), ("alpha", "delta"), ("alpha", "gamma"),
        ("beta", "delta"), ("beta", "gamma"), ("delta", "gamma"),
    ]
    want = round(math.log(8 / 9), 6)
    for r in out:
        assert (r.n_pair, r.df_a, r.df_b) == (2, 3, 3)
        assert r.pmi == want


def test_cooccurrence_pmi_max_df_cut_and_cap(spark, pmi_corpus):
    # max_df_share = 0.5 -> df <= 2 -> every kept token (df=3) drops
    assert (
        cooccurrence_pmi(
            pmi_corpus, "doc_id", "text", min_df=2, max_df_share=0.5,
            min_pair=1,
        ).count()
        == 0
    )
    # per_doc_cap=2 keeps the 2 alphabetically-first equal-df tokens
    # per doc -> only pairs among {alpha, beta, delta(d3: alpha,delta)}
    out = cooccurrence_pmi(
        pmi_corpus, "doc_id", "text", min_df=2, per_doc_cap=2, min_pair=2
    ).collect()
    assert [(r.token_a, r.token_b, r.n_pair) for r in out] == [
        ("alpha", "beta", 2)
    ]


def test_cooccurrence_pmi_validation(spark, pmi_corpus):
    with pytest.raises(ValueError, match="per_doc_cap"):
        cooccurrence_pmi(pmi_corpus, "doc_id", "text", per_doc_cap=1)
    with pytest.raises(ValueError, match="max_df_share"):
        cooccurrence_pmi(pmi_corpus, "doc_id", "text", max_df_share=0.0)


def test_gopher_rules_hand_cases(spark):
    from evidence_images_etl_airflow_spark.functions.text import (
        gopher_rule_columns,
    )

    good = " ".join(
        ["the", "be", "to", "of", "and"] + ["word"] * 60
    )  # 65 words, all alpha, mean len ~4, 5 stopwords
    short = "the be tiny"  # fails word count, passes stopwords
    bullets = "\n".join(["- item one two", "- item three four"]) + "\n" + good
    symbols = " ".join(["#tag"] * 30 + ["the", "be"] + ["word"] * 30)
    rows = [(0, good), (1, short), (2, bullets), (3, symbols), (4, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    cols = gopher_rule_columns(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in cols.items()]
        ).collect()
    }
    g = out[0]
    assert g["n_words"] == 65 and g["n_stopwords"] == 5
    assert all(
        g[k]
        for k in (
            "r_word_count", "r_mean_word_len", "r_symbol_ratio",
            "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
            "r_stopwords", "pass_gopher",
        )
    )
    s = out[1]
    assert not s["r_word_count"] and s["r_stopwords"] and not s["pass_gopher"]
    b = out[2]
    # 2 bullet lines of 3 -> 20 <= 27 passes; Gopher (Rae et al. 2021)
    # removes docs with MORE THAN 90% bullet lines, so the boundary is
    # inclusive: exactly 90% still passes, only > 90% fails
    assert b["r_bullet_lines"]
    two_of_two = spark.createDataFrame(
        [(9, "- a b\n- c d")], "doc_id bigint, text string"
    )
    bb = two_of_two.select(
        *[v.alias(k) for k, v in gopher_rule_columns(F.col("text")).items()]
    ).collect()[0]
    assert not bb["r_bullet_lines"]  # 100% bullet lines: 20 > 18
    nine_of_ten = spark.createDataFrame(
        [(10, "\n".join(["- b"] * 9 + ["plain text line"]))],
        "doc_id bigint, text string",
    )
    b9 = nine_of_ten.select(
        *[v.alias(k) for k, v in gopher_rule_columns(F.col("text")).items()]
    ).collect()[0]
    assert b9["r_bullet_lines"]  # exactly 90%: 90 <= 90 kept (paper)
    sy = out[3]
    # 30 '#' in 62 words: 300 > 62 -> symbol rule fails
    assert not sy["r_symbol_ratio"] and not sy["pass_gopher"]
    e = out[4]
    # empty text: split('') -> [''] so 1 zero-length word
    assert e["n_words"] == 1 and not e["r_word_count"]
    assert not e["r_alpha_words"] and not e["pass_gopher"]


def test_novelty_curve_partitions_distinct_shingles(spark):
    """Every distinct shingle is novel exactly once, at its first
    occurrence: sum(n_novel) over deciles == |distinct shingles|."""
    from evidence_images_etl_airflow_spark.workload import REGISTRY
    from evidence_images_etl_airflow_spark.functions.text import (
        shingles_from_tokens,
        tokens,
    )

    rows = REGISTRY["text_novelty_curve"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert 1 <= len(rows) <= 10
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_distinct = (
        d.select(
            F.explode(
                shingles_from_tokens(tokens(F.col("text")), 3)
            ).alias("s")
        )
        .agg(F.countDistinct("s"))
        .collect()[0][0]
    )
    assert sum(r["n_novel"] for r in rows) == n_distinct
    for r in rows:
        assert 0.0 <= r["novelty_rate"] <= 1.0
        assert r["n_novel"] <= r["n_occurrences"]
