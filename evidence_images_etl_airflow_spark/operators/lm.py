"""N-gram language-model perplexity scoring (SURVEY.md §7 M7): the
CCNet/KenLM-style curation signal — score each document by how
surprising its token sequence is under a bigram LM trained on the
corpus itself (or a trusted reference corpus). High perplexity ->
boilerplate/garbled/foreign text; the standard third dial next to the
heuristic quality score and the learned classifier.

Everything is DataFrame ops:

- **Training** is two hash aggregates: bigram counts (shuffle on the
  bigram) and left-context totals derived FROM the bigram counts (one
  more agg on w1) — plus a count-distinct for the vocabulary size.
  Add-one smoothing: p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V).
- **Scoring** explodes each doc's bigrams with their position,
  equi-joins the probability table on (w1, w2) — co-partitioned hash
  join, never broadcast (the LM is corpus-sized) — and re-groups by
  doc. The per-doc log-prob sum folds over the bigram list SORTED BY
  POSITION (sort_array on (pos, logp) structs + sequential aggregate),
  so the fp accumulation order is the document order in both engines —
  the same determinism idiom as the vector folds.

At 100 TB: token explode is map-side; the two training aggs and the
scoring join all shuffle on token keys (Zipf-skewed — AQE skew split
handles the head; a stop-word cap like the dedup operators' is the
manual knob). State never touches the driver.

Log/exp are evaluated once per distinct operand and rounded to 6dp
before any accumulation, which keeps JVM-libm vs DuckDB-libm ulp
differences from compounding across a fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.functions.text import tokens


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, w1, w2) — one row per adjacent token pair; pos is the
    1-based bigram index (fold order key)."""
    t = tokens(F.col(text_col))
    pairs = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.posexplode(pairs))
        .select("id", (F.col("pos") + 1).alias("pos"), "col.w1", "col.w2")
    )


def train_bigram_lm(docs: DataFrame, id_col: str, text_col: str):
    """Fit the smoothed bigram table -> (lm, vocab_size). ``lm`` has
    (w1, w2, c, c1): pair count and left-context total; keep it lazy or
    persist it — the caller owns materialization. Probabilities are
    derived at scoring time so V stays a plain python int."""
    bg = _bigrams(docs, id_col, text_col)
    counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    left_totals = counts.groupBy("w1").agg(F.sum("c").alias("c1"))
    lm = counts.join(left_totals, "w1")
    vocab_size = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .agg(F.count_distinct("tok"))
        .collect()[0][0]
    )
    return lm, int(vocab_size)


def score_bigram_lm(
    docs: DataFrame,
    lm: DataFrame,
    vocab_size: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document perplexity under the bigram LM -> (id, n_bigrams,
    ppl). Unseen bigram with known left context: p = 1/(c1+V); unknown
    left context: p = 1/V. Docs with < 2 tokens are dropped (no bigram
    to score). ppl = round(exp(-mean(log p)), 4)."""
    V = F.lit(float(vocab_size))
    bg = _bigrams(docs, id_col, text_col)
    joined = bg.join(lm, ["w1", "w2"], "left")
    # left-context totals for unseen (w1, w2) pairs whose w1 IS known
    w1_totals = lm.select("w1", "c1").distinct()
    joined = (
        joined.drop("c1")
        .join(w1_totals, "w1", "left")
        .withColumn(
            "logp",
            F.round(
                F.when(
                    F.col("c").isNotNull(),
                    F.log((F.col("c") + 1.0) / (F.col("c1") + V)),
                )
                .when(F.col("c1").isNotNull(), F.log(1.0 / (F.col("c1") + V)))
                .otherwise(F.log(1.0 / V)),
                6,
            ),
        )
    )
    per_doc = joined.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("pos"), F.col("logp")))
                ),
                lambda s: s["logp"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("logsum"),
    )
    return per_doc.select(
        F.col("id"),
        "n_bigrams",
        F.round(F.exp(-F.col("logsum") / F.col("n_bigrams")), 4).alias("ppl"),
    )
