"""M7 extension operators: text functions, dedup, similarity,
multimodal plumbing (SURVEY.md §7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.functions.text import (
    fingerprint_md5,
    lang_id,
    quality_score,
    token_count,
    word_shingles,
)
from evidence_images_etl_airflow_spark.functions.vectors import (
    cosine,
    hyperplane_signature,
    random_hyperplanes,
)
from evidence_images_etl_airflow_spark.operators.dedup import (
    connected_components,
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_pairs,
)
from evidence_images_etl_airflow_spark.operators.multimodal import (
    attach_binary,
    decode_image_metadata,
    real_image_decode,
    sample_frames,
)
from evidence_images_etl_airflow_spark.operators.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (4, "completely different text about spark engines here"),
        (5, "ab"),  # shorter than one shingle
        (6, "  the   quick\tbrown fox jumps over the lazy dog "),  # ws-variant of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("one two",)], "t string")
    assert df.select(F.size(word_shingles(F.col("t"), 3)).alias("n")).first().n == 0


def test_token_count_and_quality_bounds(docs):
    out = docs.select(token_count("text").alias("n"), quality_score("text").alias("q")).collect()
    assert all(r.n >= 1 for r in out)
    assert all(0.0 <= r.q <= 1.0 for r in out)


def test_lang_id_basic(spark):
    rows = [
        (1, "the cat is on the mat and it is happy"),
        (2, "el gato es un animal que vive en la casa"),
        (3, "xyzzy plugh qwerty"),  # no stopword hits
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.lang for r in df.select("id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "und"


def test_fingerprint_normalizes_whitespace_and_case(docs):
    fps = {r.doc_id: r.fp for r in docs.select("doc_id", fingerprint_md5(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[3] == fps[6]  # dup + whitespace variant collapse
    assert fps[1] != fps[2]


def test_dedup_exact_keeps_lowest_id(docs):
    survivors = {r.doc_id for r in dedup_exact(docs, "doc_id", "text").select("doc_id").collect()}
    assert 1 in survivors and 3 not in survivors and 6 not in survivors
    assert {2, 4, 5} <= survivors


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.4).collect()}
    assert (1, 2) in pairs  # 8-token docs differing in last token
    assert all(0.0 <= j <= 1.0 for j in pairs.values())
    # exact dups have jaccard 1.0
    assert pairs[(1, 3)] == 1.0


def test_minhash_lsh_candidates_superset_verified(docs):
    verified = minhash_lsh_pairs(docs, "doc_id", "text", verify_threshold=0.4)
    cands = minhash_lsh_pairs(docs, "doc_id", "text", verify_threshold=None)
    v = {(r.id_a, r.id_b) for r in verified.collect()}
    c = {(r.id_a, r.id_b) for r in cands.collect()}
    assert v <= c
    assert (1, 3) in v  # exact dups always collide in every band


def test_simhash_dups_match_and_near_dups_close(docs):
    sh = {r.id: r.simhash for r in simhash64(docs, "doc_id", "text").collect()}
    assert sh[1] == sh[3]  # identical token multisets
    ham_12 = sum(a != b for a, b in zip(sh[1], sh[2]))
    ham_14 = sum(a != b for a, b in zip(sh[1], sh[4]))
    assert ham_12 < ham_14  # near-dup closer than unrelated


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.7, 0.7, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_identities(spark, vectors):
    a = vectors.filter("vec_id = 0").select(F.col("embedding").alias("a"))
    pairs = a.crossJoin(vectors.select(F.col("vec_id"), F.col("embedding").alias("b")))
    got = {r.vec_id: round(r.c, 6) for r in pairs.select("vec_id", cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert got[0] == 1.0
    assert got[2] == 0.0
    assert got[3] == -1.0


def test_brute_force_topk_ranks_nearest_first(vectors):
    res = brute_force_topk(vectors, vectors.filter("vec_id = 0"), "vec_id", "embedding", k=2).collect()
    assert [r.neighbor_id for r in sorted(res, key=lambda r: r.rank)] == [1, 4]


def test_lsh_topk_subset_of_bucket(vectors):
    planes = random_hyperplanes(4, 3, seed=5)
    res = lsh_topk(vectors, vectors.filter("vec_id = 0"), planes, "vec_id", "embedding", k=3)
    # every returned neighbor shares the query's bucket
    sigs = {
        r.vec_id: r.b
        for r in vectors.select("vec_id", hyperplane_signature(F.col("embedding"), planes).alias("b")).collect()
    }
    for r in res.collect():
        assert sigs[r.neighbor_id] == sigs[0]


def test_ivf_topk_cells_and_probes(spark, vectors):
    from evidence_images_etl_airflow_spark.operators.similarity import (
        assign_cells,
        ivf_topk,
    )

    # codebook: vec 0 (x-axis) and vec 2 (y-axis)
    cents = vectors.filter("vec_id in (0, 2)").select(
        F.col("vec_id").alias("cid"), "embedding"
    )
    cells = {r.vec_id: r.cell for r in assign_cells(vectors, cents).collect()}
    # 1 hugs the x axis; 3 = -x scores cos -1 vs 0 on x but 0 vs y ->
    # cell 2; 4 ties at 45 degrees -> smallest cid wins
    assert cells == {0: 0, 1: 0, 2: 2, 3: 2, 4: 0}

    # nprobe=2 probes every cell here -> IVF degenerates to exact
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(vectors, vectors.filter("vec_id = 0"), k=2).collect()
    }
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(
            vectors, vectors.filter("vec_id = 0"), cents, k=2, nprobe=2
        ).collect()
    }
    assert ivf == exact

    # nprobe=1 searches only the query's own cell: cell 2 = {2, 3}, so
    # the true nearest (4, at 45 degrees, in cell 0) is missed — the
    # recall trade IVF makes
    got = ivf_topk(vectors, vectors.filter("vec_id = 2"), cents, k=5, nprobe=1)
    assert {r.neighbor_id for r in got.collect()} == {3}


def test_ivf_index_materialized_search_prunes_partitions(spark, tmp_path):
    from evidence_images_etl_airflow_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter("vec_id < 16").select(F.col("vec_id").alias("cid"), "embedding")
    queries = emb.filter("vec_id < 5")
    path = str(tmp_path / "ivf_index")
    build_ivf_index(emb, cents, path)

    direct = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in ivf_topk(emb, queries, cents, k=3, nprobe=2).collect()
    }
    indexed_df = ivf_topk_indexed(spark, path, queries, cents, k=3, nprobe=2)
    indexed = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in indexed_df.collect()
    }
    assert indexed == direct

    # the scan must be partition-pruned to the probed cells, and the
    # index layout is one file per cell directory
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan.replace("#", " #") or "cell IN" in plan
    import glob as _glob

    cell_dirs = _glob.glob(f"{path}/cell=*")
    assert len(cell_dirs) >= 2
    for d in cell_dirs:
        assert len(_glob.glob(f"{d}/*.parquet")) == 1


def test_ivf_pq_index_materialized_search_prunes_partitions(spark, tmp_path):
    from evidence_images_etl_airflow_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_topk,
        ivf_pq_topk_indexed,
        pq_codebooks_from_rows,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter("vec_id < 16").select(F.col("vec_id").alias("cid"), "embedding")
    cbs = pq_codebooks_from_rows(emb, m=4, n_codes=8)
    queries = emb.filter("vec_id < 5")
    path = str(tmp_path / "ivf_pq_index")
    build_ivf_pq_index(emb, cents, cbs, path, m=4)

    direct = {
        (r.query_id, r.rank): (r.neighbor_id, r.approx_ip)
        for r in ivf_pq_topk(emb, queries, cents, cbs, k=3, nprobe=2).collect()
    }
    indexed_df = ivf_pq_topk_indexed(spark, path, queries, cents, cbs, k=3, nprobe=2)
    indexed = {
        (r.query_id, r.rank): (r.neighbor_id, r.approx_ip)
        for r in indexed_df.collect()
    }
    assert indexed == direct

    # probed cells must reach the codes scan as a partition filter, the
    # layout is one code file per cell directory, and the index rows
    # carry only (id, codes) — the embeddings never re-read at search
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan.replace("#", " #") or "cell IN" in plan
    import glob as _glob

    cell_dirs = _glob.glob(f"{path}/cell=*")
    assert len(cell_dirs) >= 2
    for d in cell_dirs:
        assert len(_glob.glob(f"{d}/*.parquet")) == 1
    cols = set(spark.read.parquet(path).columns)
    assert cols == {"id", "code_0", "code_1", "code_2", "code_3", "cell"}


def test_multimodal_decode_schema_and_determinism(docs):
    out = decode_image_metadata(attach_binary(docs, "text", "payload"), "doc_id", "payload")
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_bytes", "width", "height", "format"]
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_bytes == len("the quick brown fox jumps over the lazy dog")
    assert rows[1].format in ("png", "jpeg")
    # identical payloads decode identically
    assert tuple(rows[1])[1:] == tuple(rows[3])[1:]


def test_real_image_decode_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        real_image_decode(b"\x89PNG...")


def test_sample_frames_strides(docs):
    out = sample_frames(attach_binary(docs.filter("doc_id = 1"), "text", "payload"), every_n_bytes=16)
    rows = sorted(out.collect(), key=lambda r: r.frame_offset)
    n = len("the quick brown fox jumps over the lazy dog")
    assert [r.frame_offset for r in rows] == list(range(0, n, 16))
    assert all(1 <= len(r.frame_bytes) <= 8 for r in rows)


def test_connected_components_chain_and_islands(spark):
    """A 5-node path (needs multiple propagation rounds), a 2-node
    island, and a node pair order that exercises the symmetric edge
    expansion."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9), (7, 9)],
        "id_a long, id_b long",
    )
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 7: 7, 8: 7, 9: 7}


def test_resize_images_plumbing(docs):
    from evidence_images_etl_airflow_spark.operators.multimodal import (
        attach_binary,
        resize_images,
    )

    out = resize_images(attach_binary(docs, "text", "payload"), width=8, height=4)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    for r in rows.values():
        assert (r.width, r.height) == (8, 4)
        assert len(r.payload) == 32  # exactly width*height bytes
    # short payload zero-padded, long payload truncated
    assert bytes(rows[5].payload).startswith(b"ab\x00")
    assert bytes(rows[1].payload) == b"the quick brown fox jumps over t"


def test_simhash_near_pairs_within_hamming(docs):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    # exact dups / whitespace variants: identical signatures, distance 0
    assert pairs[(1, 3)] == 0 and pairs[(1, 6)] == 0 and pairs[(3, 6)] == 0
    assert all(h <= 3 for h in pairs.values())
    # candidates came only from block agreement, so every reported pair
    # must also be reachable brute-force: cross-check against full
    # signatures (pigeonhole guarantees no pair <= 3 is missed)
    sh = {r.id: r.simhash for r in simhash64(docs, "doc_id", "text").collect()}
    brute = {
        (a, b)
        for a in sh
        for b in sh
        if a < b and sum(x != y for x, y in zip(sh[a], sh[b])) <= 3
    }
    assert set(pairs) == brute


def test_normalize_text_nfkc_scalar_pandas_udf(spark):
    from evidence_images_etl_airflow_spark.operators.grouped import normalize_text_nfkc

    df = spark.createDataFrame(
        [(1, "ﬁne"), (2, "Ｆｕｌｌ"), (3, "x²"), (4, None)], "id long, t string"
    )
    got = {r.id: r.n for r in df.select("id", normalize_text_nfkc("t").alias("n")).collect()}
    assert got == {1: "fine", 2: "Full", 3: "x2", 4: None}


def test_fit_group_trend_matches_numpy(spark):
    import numpy as np

    from evidence_images_etl_airflow_spark.operators.grouped import fit_group_trend

    rows = []
    # user a: exact line y = 3x + 2; user b: noisy; user c: single point
    for x in range(10):
        rows.append(("a", float(x), 3.0 * x + 2.0))
        rows.append(("b", float(x), 0.5 * x + ((-1) ** x) * 0.25))
    rows.append(("c", 1.0, 9.9))
    df = spark.createDataFrame(rows, "user string, x double, y double")
    got = {r.user: r for r in fit_group_trend(df, ["user"], "x", "y").collect()}

    assert abs(got["a"].slope - 3.0) < 1e-9
    assert abs(got["a"].intercept - 2.0) < 1e-9
    assert abs(got["a"].r2 - 1.0) < 1e-12
    bx = np.arange(10, dtype="float64")
    by = 0.5 * bx + ((-1.0) ** bx) * 0.25
    exp_slope, exp_int = np.polyfit(bx, by, 1)
    assert abs(got["b"].slope - exp_slope) < 1e-9
    assert abs(got["b"].intercept - exp_int) < 1e-9
    assert 0 < got["b"].r2 < 1
    assert got["c"].slope is None and got["c"].n == 1


def test_plan_pair_enumeration_routes_by_density(spark):
    """The r15 routing rule (SCALING.md two-corpus measurement) as an
    operator: a dup-dense corpus (salted copies, high band-bucket
    volume) must route to minhash; a corpus of distinct docs must
    route to the lossless prefix filter; the statistic itself must be
    the exact band-bucket sum."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        minhash_lsh_pairs,
        plan_pair_enumeration,
    )

    # 8 salted near-copies of one doc + 2 unrelated docs: the copies
    # collide in every band, so cand_pairs_upper >= C(8,2) * 1 band
    base = "the quick brown fox jumps over the lazy dog again and again"
    dense_rows = [(i, f"{base} v{i % 2}") for i in range(8)] + [
        (100, "completely different text about spark shuffles here"),
        (101, "another unrelated document discussing parquet footers"),
    ]
    dense = spark.createDataFrame(dense_rows, "doc_id bigint, text string")
    plan = plan_pair_enumeration(dense, "doc_id", "text").collect()[0]
    assert plan["n_docs"] == 10
    assert plan["route"] == "minhash"
    assert plan["pairs_per_doc"] >= 2.0
    # upper bound: at least the true candidate volume (each of the 4
    # bands double-counts pairs agreeing on it)
    cands = minhash_lsh_pairs(
        dense, "doc_id", "text", verify_threshold=None
    ).count()
    assert plan["cand_pairs_upper"] >= cands

    sparse_rows = [
        (i, f"document number {i} about topic {i * 7} with words {i * 13}")
        for i in range(10)
    ]
    sparse = spark.createDataFrame(sparse_rows, "doc_id bigint, text string")
    plan2 = plan_pair_enumeration(sparse, "doc_id", "text").collect()[0]
    assert plan2["route"] == "prefix_filter"

    # empty corpus: deterministic, no divide-by-zero under ANSI mode
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    plan3 = plan_pair_enumeration(empty, "doc_id", "text").collect()[0]
    assert plan3["n_docs"] == 0
    assert plan3["pairs_per_doc"] is None
    assert plan3["route"] == "prefix_filter"


def test_routed_duplicate_clusters_executes_both_legs(spark):
    """routed_duplicate_clusters must actually take the leg the plan
    names, carry the route in the output, and produce the same
    clusters either way on a corpus where both legs are exact (exact
    duplicates hit every band)."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        routed_duplicate_clusters,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    dense = spark.createDataFrame(
        [(i, base) for i in range(6)]
        + [(10, "unrelated words entirely different from the cluster")],
        "doc_id bigint, text string",
    )
    got = routed_duplicate_clusters(dense, "doc_id", "text").collect()
    assert {r["route"] for r in got} == {"minhash"}
    by_comp = {}
    for r in got:
        by_comp.setdefault(r["component"], set()).add(r["doc_id"])
    assert by_comp == {0: {0, 1, 2, 3, 4, 5}}

    sparse = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different text about spark and parquet files"),
        ],
        "doc_id bigint, text string",
    )
    got2 = routed_duplicate_clusters(sparse, "doc_id", "text").collect()
    assert {r["route"] for r in got2} == {"prefix_filter"}
    assert {(r["doc_id"], r["component"]) for r in got2} == {(1, 1), (2, 1)}


def test_minhash_lsh_against_store_incremental(spark):
    """Incremental near-dup gate: an exact copy of a historical doc
    (all bands collide) is dropped; a distinct doc survives and its
    band rows come back for the store append."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        minhash_band_store,
        minhash_lsh_against_store,
    )

    hist = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "completely different content about spark shuffles and partitions"),
        ],
        "doc_id long, text string",
    )
    store = minhash_band_store(hist, "doc_id", "text")
    batch = spark.createDataFrame(
        [
            # identical to doc 1 -> identical signature -> every band collides
            (10, "the quick brown fox jumps over the lazy dog near the river bank"),
            (11, "entirely novel text mentioning catalyst optimizer rules and codegen stages"),
        ],
        "doc_id long, text string",
    )
    survivors, new_bands = minhash_lsh_against_store(batch, store, "doc_id", "text")
    assert [r.doc_id for r in survivors.collect()] == [11]
    assert {r.id for r in new_bands.collect()} == {11}
    # appending keeps the gate closed for a re-crawl of the same doc
    store2 = store.unionByName(new_bands)
    again, _ = minhash_lsh_against_store(
        spark.createDataFrame(
            [(20, "entirely novel text mentioning catalyst optimizer rules and codegen stages")],
            "doc_id long, text string",
        ),
        store2,
        "doc_id",
        "text",
    )
    assert again.count() == 0


def test_bloom_prescreen_identical_survivors_and_candidate_drop(spark):
    """The Bloom pre-screen must not change survivors (no false
    negatives) and must shrink the set reaching the anti-join."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        bloom_build,
        bloom_might_contain,
        dedup_against_store,
        dedup_exact,
    )

    hist = spark.createDataFrame(
        [(i, f"historical document number {i} body") for i in range(200)],
        "doc_id long, text string",
    )
    store = dedup_exact(hist, "doc_id", "text")
    batch = spark.createDataFrame(
        # 5 re-crawls of history + 245 novel docs
        [(1000 + i, f"historical document number {i} body") for i in range(5)]
        + [(2000 + i, f"fresh crawl text {i} about something new") for i in range(245)],
        "doc_id long, text string",
    )
    plain = dedup_against_store(batch, store, "doc_id", "text")
    bloomed = dedup_against_store(
        batch, store, "doc_id", "text", bloom_bits=1 << 20
    )
    assert sorted(r.doc_id for r in plain.collect()) == sorted(
        r.doc_id for r in bloomed.collect()
    )
    # the filter itself: every store member flags True (no false
    # negatives), and nearly all novel fingerprints are ruled out
    bloom = bloom_build(store.select("fingerprint"), num_bits=1 << 20)
    in_batch = dedup_exact(batch, "doc_id", "text")
    flagged = bloom_might_contain(in_batch, "fingerprint", bloom, 1 << 20)
    n_batch = in_batch.count()
    n_cand = flagged.filter("__might_contain").count()
    assert n_cand >= 5  # the 5 true dups MUST be candidates
    assert n_cand <= 10  # fpp at 1M bits / 200 entries is ~0
    assert n_batch == 250


def test_bloom_bitmaps_merge_with_bit_or(spark):
    """Incremental maintenance: union + bit_or of two batch bitmaps
    equals the bitmap of the union — the property a 100 TB ingest
    loop relies on to avoid rebuilding the filter."""
    from pyspark.sql import functions as F

    from evidence_images_etl_airflow_spark.operators.dedup import bloom_build

    a = spark.createDataFrame([(f"fp_a_{i}",) for i in range(50)], ["fingerprint"])
    b = spark.createDataFrame([(f"fp_b_{i}",) for i in range(50)], ["fingerprint"])
    merged = (
        bloom_build(a, num_bits=1 << 12)
        .unionByName(bloom_build(b, num_bits=1 << 12))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    direct = bloom_build(a.unionByName(b), num_bits=1 << 12)
    assert {(r.word, r.bits) for r in merged.collect()} == {
        (r.word, r.bits) for r in direct.collect()
    }


def test_pq_encode_and_adc_search(spark):
    from evidence_images_etl_airflow_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebooks_from_rows,
        pq_encode,
    )

    # 8-dim vectors, m=2 subspaces of 4; codebook = vecs 0 and 1:
    # sub-axes x and y per subspace
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0, 0.9, 0.1, 0.0, 0.0]),  # ~vec 0
        (3, [0.1, 0.9, 0.0, 0.0, 0.1, 0.9, 0.0, 0.0]),  # ~vec 1
        (4, [1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0]),  # mixed subs
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cbs = pq_codebooks_from_rows(vecs, m=2, n_codes=2)
    assert cbs.count() == 4  # 2 subs x 2 codes
    codes = {r.id: (r.code_0, r.code_1) for r in pq_encode(vecs, cbs, m=2).collect()}
    # each vector snaps to its nearest codeword per subspace
    assert codes[0] == (0, 0)
    assert codes[1] == (1, 1)
    assert codes[2] == (0, 0)
    assert codes[3] == (1, 1)
    assert codes[4] == (0, 1)  # first sub ~code0, second sub ~code1

    res = pq_adc_topk(
        pq_encode(vecs, cbs, m=2), vecs.filter("vec_id = 0"), cbs, m=2, k=2
    ).collect()
    got = [r.neighbor_id for r in sorted(res, key=lambda r: r.rank)]
    # vec 2 shares vec 0's codes -> top neighbor; vec 4 shares one sub
    assert got[0] == 2
    assert got[1] == 4


def test_span_dedup_first_occurrence_wins(spark):
    from evidence_images_etl_airflow_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),      # chunks (span=2): "a b", "c d"
            (2, "a b x y"),      # "a b" duplicates doc 1 -> dropped
            (3, "c d"),          # whole doc is a dup chunk
        ],
        "doc_id long, text string",
    )
    out = {
        r.id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in span_dedup(docs, "doc_id", "text", span_tokens=2).collect()
    }
    assert out[1] == ("a b c d", 2, 0)
    assert out[2] == ("x y", 1, 1)
    assert out[3] == ("", 0, 1)


def test_span_dedup_sliding_hand_computed(spark):
    """ADVICE r06: hand-computed expectations for span_dedup_sliding —
    a boundary-straddling duplicate is removed (which fixed-grid
    span_dedup would miss), a sub-span-length doc passes through
    intact, and a whole-doc duplicate yields empty clean_text."""
    from evidence_images_etl_airflow_spark.operators.dedup import span_dedup_sliding

    docs = spark.createDataFrame(
        [
            # doc 1: source of the repeated passage; windows (span=4,
            # stride=2) start at 0,2,4 — all first occurrences.
            (1, "w1 w2 w3 w4 w5 w6 w7 w8"),
            # doc 2: repeats doc 1's "w3 w4 w5 w6" at offset 2 — NOT on
            # the fixed 4-token chunk grid (chunks would be "p q w3 w4"
            # / "w5 w6 r s", neither a doc-1 chunk), but the sliding
            # window at start=2 matches doc 1's start=2 window exactly.
            (2, "p q w3 w4 w5 w6 r s"),
            # doc 3: shorter than one span -> no windows, intact.
            (3, "a b"),
            # doc 4: exact duplicate of doc 1 -> every window is a dup,
            # every token covered.
            (4, "w1 w2 w3 w4 w5 w6 w7 w8"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.id: (r.clean_text, r.n_tokens_kept, r.n_tokens_dropped)
        for r in span_dedup_sliding(
            docs, "doc_id", "text", span_tokens=4, stride=2
        ).collect()
    }
    assert out[1] == ("w1 w2 w3 w4 w5 w6 w7 w8", 8, 0)
    assert out[2] == ("p q r s", 4, 4)
    assert out[3] == ("a b", 2, 0)
    assert out[4] == ("", 0, 8)


def test_matryoshka_truncate_renormalized_unit_norm(spark):
    from evidence_images_etl_airflow_spark.operators.similarity import (
        matryoshka_truncate,
    )

    rows = [
        (0, [3.0, 4.0, 100.0, -7.0]),
        (1, [0.0, 0.0, 5.0, 5.0]),   # zero prefix -> no renorm divide
        (2, [1.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: r.t
        for r in matryoshka_truncate(
            df, "embedding", dims=2, out_col="t"
        ).collect()
    }
    # prefix kept, tail dropped, unit norm after renormalize
    assert out[0] == pytest.approx([0.6, 0.8])
    # zero-norm prefix passes through unscaled (no div-by-zero NULLs)
    assert out[1] == pytest.approx([0.0, 0.0])
    assert sum(v * v for v in out[2]) == pytest.approx(1.0)


def test_matryoshka_prefix_cosine_equals_renormalized_cosine(spark):
    from evidence_images_etl_airflow_spark.operators.similarity import (
        matryoshka_truncate,
    )

    rows = [(0, [1.0, 2.0, 9.0, -4.0]), (1, [2.0, 1.0, -3.0, 8.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pref = matryoshka_truncate(df, "embedding", dims=2, renormalize=False)
    ren = matryoshka_truncate(df, "embedding", dims=2, renormalize=True)

    def cos_pair(d):
        a = d.filter("vec_id = 0").select(F.col("embedding").alias("a"))
        b = d.filter("vec_id = 1").select(F.col("embedding").alias("b"))
        return a.crossJoin(b).select(
            cosine(F.col("a"), F.col("b")).alias("c")
        ).collect()[0].c

    # cosine is invariant under the renormalization (the operator's
    # documented contract that lets the oracle use the raw prefix)
    assert cos_pair(pref) == pytest.approx(cos_pair(ren), abs=1e-12)


def test_ngram_containment_asymmetric_snippet(spark):
    """The case Jaccard misses: a 5-shingle snippet quoted inside a
    much longer page. Containment names the contained side at ~1.0
    while Jaccard stays far below any dedup threshold."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    snippet = "alpha beta gamma delta epsilon zeta eta"
    page = (
        "intro words here one two three four five six seven "
        + snippet
        + " trailing content eight nine ten eleven twelve thirteen"
    )
    df = spark.createDataFrame(
        [(1, snippet), (2, page), (3, "unrelated text with different tokens")],
        "doc_id long, text string",
    )
    rows = ngram_containment_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, max_doc_freq=None
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.contained_id, r.container_id) == (1, 2)
    assert r.containment == 1.0
    assert r.jaccard < 0.25  # symmetric dedup at any sane threshold keeps both
    # and the symmetric operator indeed misses it
    assert (
        ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=None
        ).count()
        == 0
    )


def test_winnowing_detection_guarantee_and_density(spark):
    """Schleimer et al. guarantees: (1) any shared token run of length
    >= w+k-1 produces a shared selected fingerprint; (2) selection
    density is well below 1 (the whole point vs hashing every gram);
    (3) disjoint docs share nothing."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        winnowing_fingerprints,
        winnowing_pairs,
    )

    shared = "one two three four five six"  # 6 tokens = w+k-1 at (3,4)
    rows = [
        (1, "aa bb cc " + shared + " dd ee ff gg hh"),
        (2, "zz yy " + shared + " xx ww vv uu tt ss rr"),
        (3, "p q r s t u v w x y z p2 q2 r2 s2 t2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in winnowing_pairs(
            df, "doc_id", "text", k=3, w=4, min_shared=1
        ).collect()
    }
    assert (1, 2) in pairs  # the guarantee
    assert (1, 3) not in pairs and (2, 3) not in pairs

    fps = winnowing_fingerprints(df, "doc_id", "text", k=3, w=4)
    n_sel = fps.filter("id = 3").count()
    n_grams = 16 - 2  # 16 tokens -> 14 3-grams
    assert 0 < n_sel < n_grams * 0.75  # sparse selection
    # positions are valid gram indexes
    assert fps.filter("pos < 0 OR pos >= 14").filter("id = 3").count() == 0


def test_audio_features_hand_computed_and_empty(spark):
    """Frame count / peak selection match a hand evaluation of the
    deterministic codec; empty payloads yield the sentinel row."""
    import hashlib

    from evidence_images_etl_airflow_spark.operators.multimodal import (
        deterministic_fake_audio_features,
        extract_audio_features,
    )

    text = "x" * 70  # 3 frames: 32 + 32 + 6 chars
    exp_energies = [
        int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % 1000
        for f in (text[0:32], text[32:64], text[64:70])
    ]
    n, mean, peak, pe = deterministic_fake_audio_features(text, 32)
    assert n == 3
    assert mean == round(sum(exp_energies) / 3, 6)
    assert peak == exp_energies.index(max(exp_energies))
    assert pe == max(exp_energies)

    df = spark.createDataFrame(
        [(1, text), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in extract_audio_features(df).collect()}
    assert (out[1].n_frames, out[1].peak_energy) == (3, pe)
    assert (out[2].n_frames, out[2].mean_energy, out[2].peak_frame, out[2].peak_energy) == (0, 0.0, -1, 0)


def test_prefix_filter_equals_uncapped_blocked_join(spark, docs):
    """Losslessness of the AllPairs/PPJoin prefix filter: on any input
    the prefix-filtered join must return EXACTLY the pairs of the
    uncapped shared-shingle blocked join — same ids, same jaccard."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    # fixture docs + a deterministic overlapping-slice corpus (every
    # doc shares sliding slices of a common token stream, so prefixes,
    # size filter, and verify all get exercised at several thresholds)
    base = "t%d"
    stream = [base % (i % 17) for i in range(60)]
    rows = [
        (100 + i, " ".join(stream[i : i + 20 + (i % 5)])) for i in range(25)
    ]
    corpus = docs.unionByName(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    for t in (0.3, 0.5, 0.8):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in prefix_filter_jaccard_pairs(
                corpus, "doc_id", "text", n=3, threshold=t
            ).collect()
        }
        want = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(
                corpus, "doc_id", "text", n=3, threshold=t, max_doc_freq=None
            ).collect()
        }
        assert got == want, f"threshold {t}: prefix filter lost/added pairs"
        assert want, f"threshold {t}: vacuous check"


def test_prefix_filter_immune_to_hot_shingles(spark):
    """The capped blocked join LOSES a pair whose every common shingle
    is hot; the prefix filter keeps it — the exact failure mode the
    operator exists to remove."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    hot = "alpha beta gamma"  # one 3-shingle shared by every doc
    rows = [(i, hot) for i in range(1, 12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.9, max_doc_freq=10
    )
    assert capped.count() == 0  # df=11 > cap: every true pair lost
    pf = prefix_filter_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.9)
    assert pf.count() == 55  # all C(11,2) identical pairs found


def test_rrf_fuse_hand_case(spark):
    """r10: reciprocal-rank fusion — doc in both legs outranks either
    leg's solo #1; per-leg ranks surfaced, absences NULL."""
    from evidence_images_etl_airflow_spark.operators.similarity import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
    )
    vec = spark.createDataFrame(
        [(20, 1), (40, 2), (30, 3)], "doc_id long, rank long"
    )
    out = {r.doc_id: r for r in rrf_fuse(
        {"lex": lex, "vec": vec}, top=4
    ).collect()}
    # doc 20: 1/62 + 1/61 beats doc 10 (1/61) and doc 30 (2/63)
    assert out[20].fused_rank == 1
    assert out[20].lex_rank == 2 and out[20].vec_rank == 1
    assert out[30].fused_rank == 2  # 1/63 + 1/63 = 0.031746
    assert abs(out[30].rrf_score - 0.031746) < 1e-9
    assert out[10].vec_rank is None and out[40].lex_rank is None
    # deterministic tie-break: 10 and 40 tie at 1/61 vs 1/62 -> 10 first
    assert out[10].fused_rank == 3 and out[40].fused_rank == 4

    import pytest as _pt
    with _pt.raises(ValueError, match="at least one leg"):
        rrf_fuse({})


def test_rrf_fuse_rejects_colliding_leg_names(spark):
    from evidence_images_etl_airflow_spark.operators.similarity import rrf_fuse

    leg = spark.createDataFrame([(1, 1)], "doc_id long, rank long")
    import pytest as _pt
    with _pt.raises(ValueError, match="collide"):
        rrf_fuse({"fused": leg})


def test_rrf_fuse_rejects_leg_rank_shadowing_id_col(spark):
    """r11 (ADVICE r10): a leg whose '<name>_rank' output equals
    id_col silently produced a duplicate output column."""
    from evidence_images_etl_airflow_spark.operators.similarity import rrf_fuse

    leg = spark.createDataFrame([(1, 1)], "vec_rank long, rank long")
    import pytest as _pt
    with _pt.raises(ValueError, match="collide"):
        rrf_fuse({"vec": leg}, id_col="vec_rank")


def test_int8_quantize_roundtrip_error_bound(spark):
    """r12: |dequant(quant(x)) - x| <= s_d/254 per dimension (half a
    quantization step, round-half-up), codes are tinyint in
    [-127, 127], and a zero-scale dimension round-trips to exactly
    0.0 instead of dividing by zero."""
    from evidence_images_etl_airflow_spark.operators.similarity import (
        int8_dequantize,
        int8_quantize,
        int8_scales,
    )

    df = spark.createDataFrame(
        [(0, [1.0, -0.5, 0.0]), (1, [-2.0, 0.25, 0.0]), (2, [0.3, 0.5, 0.0])],
        "vec_id long, embedding array<float>",
    )
    scales = int8_scales(df, "embedding", dim=3)
    assert scales == [2.0, 0.5, 0.0]
    q = int8_quantize(df, scales, "embedding", "codes")
    assert dict(q.dtypes)["codes"] == "array<tinyint>"
    out = int8_dequantize(q, scales, "codes", "deq").collect()
    for r in out:
        for x, c, xh, s in zip(r.embedding, r.codes, r.deq, scales):
            assert -127 <= c <= 127
            if s == 0.0:
                assert c == 0 and xh == 0.0
            else:
                assert abs(xh - x) <= s / 254 + 1e-12
    # extremes hit the clamp boundary exactly
    by_id = {r.vec_id: r.codes for r in out}
    assert by_id[1][0] == -127 and by_id[0][0] == 64


def test_int8_recall_preserves_wellseparated_neighbors(spark):
    """Quantized cosine retrieval returns the identical top-1 when
    neighbors are far apart relative to the quantization step."""
    from evidence_images_etl_airflow_spark.operators.similarity import (
        brute_force_topk,
        int8_dequantize,
        int8_quantize,
        int8_scales,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    qs = df.filter("vec_id = 0")
    truth = brute_force_topk(df, qs, k=1).first().neighbor_id
    scales = int8_scales(df, "embedding", dim=3)
    deq = int8_dequantize(
        int8_quantize(df, scales, "embedding", "codes"), scales, "codes", "demb"
    ).select("vec_id", F.col("demb").alias("embedding"))
    got = brute_force_topk(deq, deq.filter("vec_id = 0"), k=1).first().neighbor_id
    assert got == truth == 1


def test_label_centroid_silhouette_separable_vs_mixed(spark):
    from evidence_images_etl_airflow_spark.operators.similarity import (
        label_centroid_silhouette,
    )

    # two tight, far-apart label bundles -> silhouette near 1 for both
    rows = [
        (1, [0.0, 0.0], 0), (2, [0.2, 0.0], 0),
        (3, [10.0, 0.0], 1), (4, [10.2, 0.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["label"]: r for r in
           label_centroid_silhouette(df, "vec_id", "embedding", "label").collect()}
    assert out[0]["n_vectors"] == 2 and out[1]["n_vectors"] == 2
    assert out[0]["n_negative"] == 0 and out[1]["n_negative"] == 0
    assert out[0]["mean_silhouette"] > 0.99
    # a point sitting INSIDE the other label's bundle is negative
    mixed = rows + [(5, [10.1, 0.0], 0)]
    df2 = spark.createDataFrame(
        mixed, "vec_id long, embedding array<double>, label int"
    )
    out2 = {r["label"]: r for r in
            label_centroid_silhouette(df2, "vec_id", "embedding", "label").collect()}
    assert out2[0]["n_negative"] == 1


def test_label_centroid_silhouette_single_label_is_null(spark):
    from evidence_images_etl_airflow_spark.operators.similarity import (
        label_centroid_silhouette,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 1.0], 0), (2, [1.0, 0.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    r = label_centroid_silhouette(df, "vec_id", "embedding", "label").collect()[0]
    assert r["n_vectors"] == 2 and r["mean_silhouette"] is None


def test_prefix_filter_advisor_width_floors_at_session(spark):
    """The shuffle-width advisor (r13): on a tiny corpus the measured
    shingle bytes sit far below one 16 MiB target partition, so the
    advised width must CLAMP UP to the session's shuffle width (the
    floor — the advisor only ever scales up), and the advised run must
    return exactly the stock (shuffle_target_bytes=None) pairs."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        _advise_shingle_shuffle_width,
        _doc_shingles,
        prefix_filter_jaccard_pairs,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sh = _doc_shingles(df, "doc_id", "text", 3)
    width = _advise_shingle_shuffle_width(sh, 16 << 20)
    assert width == int(spark.conf.get("spark.sql.shuffle.partitions"))

    def key(r):
        return (r["id_a"], r["id_b"], r["jaccard"])

    advised = sorted(
        map(key, prefix_filter_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.5
        ).collect())
    )
    stock = sorted(
        map(key, prefix_filter_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.5,
            shuffle_target_bytes=None,
        ).collect())
    )
    assert advised == stock and advised  # identical and non-vacuous


def test_minhash_advisor_optin_matches_stock(spark):
    """minhash_lsh_pairs' advisor hook is default-OFF (the r13 median
    A/B measured it a regression there — see the operator comment);
    when opted in it must still produce identical pairs."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
        (2, "alpha beta gamma delta epsilon zeta eta theta kappa"),
        (3, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def key(r):
        return (r["id_a"], r["id_b"], r["jaccard"])

    stock = sorted(map(key, minhash_lsh_pairs(
        df, "doc_id", "text", num_hashes=8, bands=4, shingle_n=3,
        verify_threshold=0.3,
    ).collect()))
    opted = sorted(map(key, minhash_lsh_pairs(
        df, "doc_id", "text", num_hashes=8, bands=4, shingle_n=3,
        verify_threshold=0.3, shuffle_target_bytes=16 << 20,
    ).collect()))
    assert stock == opted and stock
