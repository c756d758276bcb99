"""Corpus-quality statistics for training-data curation (SURVEY.md §7
M7 extension): intra-document repetition signals and train/eval
contamination detection.

Both are explode + aggregate plans — plain shuffles Catalyst sizes, no
Python in the hot path — and both are deterministic and
oracle-expressible.

- Repetition (the Gopher/C4-style quality filters): documents whose
  n-grams repeat heavily are boilerplate/spam-like; the duplicate-ngram
  fraction and top-ngram share are the standard dials.
- Contamination: an eval document sharing many n-grams with a training
  document signals leakage; the overlap join is shingle-blocked (pairs
  only form on shared n-grams), the same no-O(N^2) shape as the dedup
  operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from evidence_images_etl_airflow_spark.functions.partitioning import spread
from evidence_images_etl_airflow_spark.functions.text import (
    shingles_from_tokens,
    tokens,
)


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-document n-gram repetition metrics:

    (id, n_ngrams, dup_ngram_fraction, top_ngram_share) where
    ``dup_ngram_fraction = 1 - distinct/total`` and ``top_ngram_share =
    max_count/total`` (both 0 for documents with fewer than ``n``
    tokens). NOTE the explode is NOT distinct — repetition is exactly
    what dedup's shingle paths throw away.

    Plan: explode n-grams -> count per (id, gram) -> re-aggregate per
    id. Two shuffles on keys that include the doc id, so partial
    aggregation collapses local duplicates map-side; no per-doc state
    ever exceeds (distinct grams) rows."""
    toks = spread(df, F.col(id_col)).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__tk")
    )
    ng = toks.select(
        "id", F.explode(shingles_from_tokens(F.col("__tk"), n)).alias("g")
    )
    cnt = ng.groupBy("id", "g").agg(F.count("*").alias("c"))
    agg = cnt.groupBy("id").agg(
        F.sum("c").alias("total"),
        F.count("*").alias("dist"),
        F.max("c").alias("maxc"),
    )
    total_d = F.col("total").cast("double")
    return (
        df.select(F.col(id_col).alias("id"))
        .join(agg, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("total"), F.lit(0)).cast("bigint").alias("n_ngrams"),
            F.round(
                F.coalesce(F.lit(1.0) - F.col("dist") / total_d, F.lit(0.0)), 6
            ).alias("dup_ngram_fraction"),
            F.round(
                F.coalesce(F.col("maxc") / total_d, F.lit(0.0)), 6
            ).alias("top_ngram_share"),
        )
    )


def length_percentile_trim(
    df: DataFrame,
    id_col: str,
    measure_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Drop rows whose ``measure_col`` (token count, char count, ...)
    falls outside the corpus's [lo, hi] percentile band — the standard
    too-short/too-long curation trim. The cut points are EXACT
    interpolated percentiles computed in one aggregate and broadcast
    back (a 1-row build side), so the corpus is scanned twice but never
    shuffled; at 100 TB swap the percentile for ``approx_percentile``
    (t-digest) and the plan shape is unchanged. Rows are kept on a
    closed interval, so both engines agree on boundary values."""
    cuts = df.agg(
        F.percentile(measure_col, F.lit(lo)).alias("__lo"),
        F.percentile(measure_col, F.lit(hi)).alias("__hi"),
    )
    return (
        df.join(F.broadcast(cuts))
        .filter(
            (F.col(measure_col) >= F.col("__lo"))
            & (F.col(measure_col) <= F.col("__hi"))
        )
        .drop("__lo", "__hi")
    )


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    shards: int = 64,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget packs
    for training (pack = the unit a data loader concatenates into one
    context window). Returns (id, token_count, shard, pack_id[,
    *keep_cols]).

    ``keep_cols`` carries extra columns of ``df`` through the packing
    window, so a pipeline that needs them downstream doesn't have to
    join the packed table back to its own (possibly expensive) input —
    before this, ep3 recomputed its full quality-scored survivor scan a
    second time just to re-attach (lang, quality), doubling the
    pipeline's dominant linear pass (r09 profiling, SCALING.md).

    Packing is inherently sequential (a running total), so the
    distributed form shards first — ``md5('pack:' || id) % shards``,
    the same engine-portable hash idiom as ``hash_split`` — and packs
    WITHIN each shard by id order: one shuffle on the shard key, each
    shard's running sum is an in-partition window, and shard count
    scales with the cluster (the global-order alternative is a
    single-partition window no 100 TB run survives). Pack ids are
    ``shard * 2^32 + floor((cumsum - tokens) / budget)`` — deterministic
    and collision-free across shards. Quotient packing groups documents
    by which budget window their START offset falls in: a document that
    crosses a window boundary joins the pack that was open, so a pack's
    total is bounded by ``budget + (its last document's length) - 1``
    and documents are never split (split upstream if that's wanted)."""
    from pyspark.sql import Window

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    c_id = F.col(id_col)
    shard = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("pack:"), c_id.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % shards
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy(c_id).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(token_count_col).over(w)
    return (
        df.select(c_id, F.col(token_count_col), shard, *[F.col(c) for c in keep_cols])
        .withColumn(
            "pack_id",
            F.col("shard").cast("long") * F.lit(1 << 32)
            + F.floor((cum - F.col(token_count_col)) / F.lit(budget)),
        )
    )


def dictionary_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 100,
) -> DataFrame:
    """Tokens -> vocabulary ids (the dictionary-encode step ahead of a
    trainer): builds a frequency vocabulary over the corpus (top
    ``vocab_size`` tokens, ties broken alphabetically, ids dense from
    0) and returns (id, token_ids array<int>) with out-of-vocabulary
    tokens as -1.

    Plan: posexplode -> count per token -> top-k vocab (ordered
    limit+row_number over ``vocab_size`` rows, never a global window
    over the full token table) -> BROADCAST the vocab into a left join
    on the exploded tokens -> re-assemble per doc by sorting
    (pos, id) structs. The corpus-side cost is one explode + one
    groupBy(doc) — the vocab is the only thing that crosses the
    cluster, which is what makes this shape hold at 100 TB (a real BPE
    vocab is ~100k rows: still broadcastable)."""
    toks = spread(df, F.col(id_col)).select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("__tk")
    )
    pos = toks.select("id", F.posexplode("__tk").alias("pos", "tok"))
    from pyspark.sql import Window

    counts = pos.groupBy("tok").agg(F.count("*").alias("c"))
    wv = Window.orderBy(F.col("c").desc(), F.col("tok"))
    vocab = (
        counts.orderBy(F.col("c").desc(), F.col("tok"))
        .limit(vocab_size)
        .withColumn("vid", F.row_number().over(wv) - 1)
        .select(F.col("tok").alias("vtok"), "vid")
    )
    enc = pos.join(F.broadcast(vocab), pos.tok == F.col("vtok"), "left").select(
        "id", "pos", F.coalesce(F.col("vid"), F.lit(-1)).alias("vid")
    )
    return enc.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "vid"))),
            lambda s: s["vid"],
        ).alias("token_ids")
    )


def ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Train/eval decontamination probe: (eval_id, train_id,
    shared_ngrams) for pairs sharing >= ``min_shared`` distinct
    n-grams. The canonical pre-training hygiene step — benchmark
    documents whose n-grams appear in the training corpus are leaked.

    Distinct shingles per side, equi-join on the shingle, count per
    pair: candidates only form on shared n-grams (shingle-blocked, like
    the dedup operators), so cost follows collision counts. At 100 TB
    the training side's shingle table is the big one — it partitions by
    shingle hash and each eval shingle meets only its bucket. For
    web-scale corpora drop shingles above a document-frequency cap
    first (see ngram_jaccard_pairs.max_doc_freq; same rationale)."""

    def side(df: DataFrame, name: str) -> DataFrame:
        toks = spread(df, F.col(id_col)).select(
            F.col(id_col).alias(name), tokens(F.col(text_col)).alias("__tk")
        )
        return toks.select(
            name,
            F.explode(
                F.array_distinct(shingles_from_tokens(F.col("__tk"), n))
            ).alias("g"),
        )

    t = side(train, "train_id")
    e = side(eval_df, "eval_id")
    return (
        e.join(t, "g")
        .groupBy("eval_id", "train_id")
        .agg(F.count("*").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def source_reputation(
    docs: DataFrame,
    source_col: str,
    quality_col: str,
    fingerprint_col: str,
) -> DataFrame:
    """Per-source (per-domain) corpus reputation: doc count, mean
    quality, and exact-duplicate rate — the aggregates behind
    domain-level curation (a web corpus drops whole domains whose
    quality is low or whose content is mostly boilerplate copies,
    BEFORE any per-document work).

    One hash-agg shuffle on the source key; the duplicate rate reuses
    the already-computed content fingerprint (count - distinct count)
    so no second scan. The mean accumulates EXACT decimals (quality is
    6dp-rounded upstream, so decimal(18,6) holds it losslessly) — the
    result is independent of row order, which both keeps the oracle
    hash-match and makes retries/AQE re-plans bit-stable. At 100 TB the
    source key is Zipf-skewed (a few giant domains); the agg is all
    map-side-combinable (sum/count/distinct-merge), so skew lands on
    the partial-agg side where AQE splits it.
    """
    return docs.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.round(
            F.sum(F.col(quality_col).cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_quality"),
        F.round(
            (F.count("*") - F.count_distinct(F.col(fingerprint_col))).cast("double")
            / F.count("*"),
            6,
        ).alias("dup_rate"),
    )


def source_reputation_filter(
    docs: DataFrame,
    source_col: str,
    quality_col: str,
    fingerprint_col: str,
    min_mean_quality: float,
    max_dup_rate: float,
) -> DataFrame:
    """Keep documents whose SOURCE passes reputation thresholds:
    mean quality >= ``min_mean_quality`` and duplicate rate <=
    ``max_dup_rate``. The survivor-source set is tiny (domains, not
    documents) — broadcast LEFT SEMI join back onto the corpus, so the
    only full-data shuffle is the reputation agg itself."""
    good = (
        source_reputation(docs, source_col, quality_col, fingerprint_col)
        .filter(
            (F.col("mean_quality") >= min_mean_quality)
            & (F.col("dup_rate") <= max_dup_rate)
        )
        .select(source_col)
    )
    return docs.join(F.broadcast(good), source_col, "left_semi")


def shingle_first_occurrence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Shared skeleton of the shingle-provenance reports: distinct
    (id, [carry_cols...], shingle) rows joined with each shingle's
    corpus-wide first occurrence — ``first_id`` plus ``first_<c>`` for
    every carried column (via min_by on the unique id, deterministic).
    One explode, one groupBy(shingle), one shingle-keyed join; the
    per-shingle min collapses the corpus to |distinct shingles| rows,
    so downstream consumers never see a pairwise join.

    The per-doc dedup is ``array_distinct`` INSIDE the shingle array,
    not a corpus-wide ``.distinct()`` after the explode (r13): the
    two are equivalent — carry_cols are functionally dependent on the
    unique id, so global (id, carry..., shingle) distinct IS per-doc
    shingle distinct — but ``.distinct()`` shuffles every shingle
    occurrence corpus-wide while ``array_distinct`` dedupes row-
    locally inside codegen, removing one full corpus shuffle from
    every consumer of this skeleton."""
    sel = [F.col(id_col).alias("id")] + [F.col(c) for c in carry_cols]
    tk = df.select(*sel, tokens(F.col(text_col)).alias("__tk"))
    sh = tk.select(
        "id",
        *carry_cols,
        F.explode(
            F.array_distinct(shingles_from_tokens(F.col("__tk"), shingle_n))
        ).alias("shingle"),
    )
    aggs = [F.min("id").alias("first_id")] + [
        F.min_by(c, "id").alias(f"first_{c}") for c in carry_cols
    ]
    firsts = sh.groupBy("shingle").agg(*aggs)
    return sh.join(firsts, "shingle")


def crossdoc_dup_fraction(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Cross-document residual-duplication report (Lee et al. 2022's
    'what fraction of this document already exists elsewhere' metric):
    for each document, the share of its DISTINCT n-gram shingles whose
    corpus-wide first occurrence (min id) is an EARLIER document. The
    dedup operators drop duplicated content; this one MEASURES it —
    the dial a pipeline reads to decide how aggressive span/near-dup
    passes need to be, and the regression metric to re-run AFTER them
    (post-dedup dup_frac should collapse toward 0).

    Shape: one shingle explode (corpus-token-sized, the same unit as
    minhash/jaccard), one groupBy(shingle) for first occurrence, one
    shingle-keyed join back, one groupBy(doc). No pairwise join — the
    per-shingle min aggregates the whole corpus into |distinct
    shingles| rows, so cost is linear in corpus size at any scale.
    Documents shorter than ``shingle_n`` tokens emit no shingles and
    drop out (callers treat absent as 'no signal').

    Returns (id, n_shingles, n_dup, dup_frac) — dup_frac 6dp-rounded
    from an exact bigint ratio, engine-independent."""
    agg = (
        shingle_first_occurrence(df, id_col, text_col, shingle_n)
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_id") < F.col("id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_dup"),
        )
    )
    return agg.select(
        "id",
        "n_shingles",
        "n_dup",
        F.round(
            F.col("n_dup").cast("double") / F.col("n_shingles"), 6
        ).alias("dup_frac"),
    )


def cooccurrence_pmi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    max_df_share: float = 1.0,
    per_doc_cap: int = 16,
    min_pair: int = 2,
    top_n: int = 25,
) -> DataFrame:
    """Token co-occurrence PMI (pointwise mutual information) over a
    document corpus — the collocation/association signal under phrase
    mining, topic seeds, and word2vec-era embeddings (Church & Hanks
    1990): ``pmi(a,b) = ln(P(a,b) / (P(a)·P(b)))`` at document grain.
    High-PMI pairs co-occur far above chance.

    The naive form is an all-pairs explosion (docs × tokens²). Three
    dials bound it the way the dedup family bounds candidate
    generation:

    - ``min_df`` / ``max_df_share``: tokens too rare to matter or so
      common they co-occur with everything (stopword-like — their PMI
      is ~0 by construction) never enter pair generation. The max-df
      cut is THE blocker: without it every pair involving 'the'
      survives to the groupBy.
    - ``per_doc_cap``: at most this many kept tokens per document form
      pairs, rarest-first (df ASC, token — rare tokens carry the
      informative collocations; ties deterministic). Pairs per doc are
      then <= cap·(cap-1)/2, so the pair stream is LINEAR in docs.
    - ``min_pair``: singleton pairs (PMI spikes from one chance
      co-occurrence) drop before the df joins.

    Plan: distinct (doc, token) -> df table (one groupBy) -> df-window
    cap -> self-join on doc id (shuffle on the doc key, both sides
    already capped) -> pair groupBy -> two token-keyed df joins + one
    broadcast 1-row n_docs. All counts integer; the only float op is
    the final single ln over an exact integer ratio, 6dp — exact
    cross-engine.

    Returns top_n rows: (token_a, token_b, n_pair, df_a, df_b, pmi),
    PMI descending, token tie-break."""
    if int(per_doc_cap) < 2:
        raise ValueError(f"per_doc_cap must be >= 2, got {per_doc_cap}")
    if not (0.0 < float(max_df_share) <= 1.0):
        raise ValueError(
            f"max_df_share must be in (0, 1], got {max_df_share}"
        )
    tok = (
        spread(df, F.col(id_col))
        .select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .distinct()
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        tok.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= int(min_df))
            & (
                F.col("df")
                <= F.floor(F.lit(float(max_df_share)) * F.col("n_docs"))
            )
        )
        .select("id", "tok", "df")
    )
    w = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("tok"))
    capped = (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(per_doc_cap))
        .select("id", "tok")
    )
    a = capped.select(F.col("id"), F.col("tok").alias("token_a"))
    b = capped.select(F.col("id"), F.col("tok").alias("token_b"))
    pairs = (
        a.join(b, "id")
        .filter(F.col("token_a") < F.col("token_b"))
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= int(min_pair))
    )
    da = dfreq.select(F.col("tok").alias("token_a"), F.col("df").alias("df_a"))
    db = dfreq.select(F.col("tok").alias("token_b"), F.col("df").alias("df_b"))
    scored = (
        pairs.join(da, "token_a")
        .join(db, "token_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token_a",
            "token_b",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.col("df_a").cast("bigint").alias("df_a"),
            F.col("df_b").cast("bigint").alias("df_b"),
            F.round(
                F.log(
                    (F.col("n_pair") * F.col("n_docs")).cast("double")
                    / (F.col("df_a") * F.col("df_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), "token_a", "token_b"
    ).limit(int(top_n))
