"""Blocked fuzzy entity resolution (edit-distance matching at scale).

The reference dedupes evidence rows only on exact keys (the
drop-duplicates in `dags/evidence_images_processing.py:101-104`); noisy
real-world names ("cold widget" vs "old widget") never collapse. The
classic scale-correct ER shape is:

1. CANONICALIZE: collapse to distinct names first. Exact duplicates are
   the n^2 explosion — matching distinct strings once and joining the
   verdict back is O(|names|^2-within-block), not O(|rows|^2).
2. BLOCK: a cheap deterministic key (here: the last whitespace token,
   i.e. the head noun) so candidate pairs only form inside a block —
   the same candidates-only discipline as the MinHash/SimHash dedup
   family (operators/dedup.py).
3. VERIFY: `levenshtein` inside the block only. Spark's levenshtein is
   a codegen JVM expression (no UDF), and the `threshold` argument
   caps the DP band so non-matches exit early.

Scale notes (100 TB):
- Block sizes bound the quadratic term; a skewed block (one giant noun)
  is handled the same way as a hot shingle in ngram_jaccard_pairs — cap
  or salt it. The workload query documents block-size stats.
- The self-join shuffles on the block key once; `a.name < b.name`
  halves the pair space and fixes pair orientation deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def last_token_block(col: str | Column) -> Column:
    """Blocking key: the final whitespace-delimited token of the name.

    regexp_extract('(\\S+)\\z') rather than split-on-' ': a name with
    repeated internal whitespace would block to '' under a literal
    single-space split, while this extracts the last word on both
    engines (round-5/6 ADVICE). ``\\z`` (Java's true end-of-input),
    not ``$``: Java ``$`` also matches BEFORE a final line terminator,
    so 'ann smith\\n' would block to 'smith' on Spark but '' under
    DuckDB's RE2, where ``$`` is end-of-text only. Note the anchor
    buys cross-engine parity, not trailing-whitespace tolerance: for
    a name with trailing whitespace BOTH engines agree on the ''
    block (no pair generation), which canonicalization upstream is
    expected to prevent."""
    return F.regexp_extract(col, r"(\S+)\z", 1)


def blocked_levenshtein_pairs(
    names: DataFrame,
    name_col: str,
    min_dist: int = 1,
    max_dist: int = 3,
    block_fn=last_token_block,
) -> DataFrame:
    """All (name_a, name_b, dist) pairs with min<=levenshtein<=max that
    share a block. `names` should already be distinct on `name_col`
    (canonicalization is the caller's n^2 guard).

    Returns columns: name_a, name_b (name_a < name_b), dist.
    """
    blocked = names.select(
        F.col(name_col).alias("__name"), block_fn(name_col).alias("__blk")
    ).distinct()
    a = blocked.alias("a")
    b = blocked.alias("b")
    dist = F.levenshtein(F.col("a.__name"), F.col("b.__name"), max_dist)
    return (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.__name") < F.col("b.__name")),
        )
        # threshold-capped levenshtein returns -1 above max_dist
        .select(
            F.col("a.__name").alias("name_a"),
            F.col("b.__name").alias("name_b"),
            dist.alias("dist"),
        )
        .where((F.col("dist") >= min_dist) & (F.col("dist") <= max_dist))
    )


def golden_records(
    rows: DataFrame,
    comp: DataFrame,
    entity_col: str,
    mode_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Survivorship: consolidate each matched-entity cluster into ONE
    golden record — the step after blocked matching
    (blocked_levenshtein_pairs) and clustering (dedup.connected_
    components) that makes ER actionable: downstream joins hit one
    canonical row per real-world entity instead of every variant
    spelling. ``comp`` is the (node, component) cluster table; ``rows``
    are the raw records keyed by ``entity_col``.

    Rules, all deterministic (ties break lexicographically):
    - canonical_<entity_col>: the variant backing the MOST rows
      (frequency argmax — the usual "most-attested spelling" rule);
    - top_<c> for each mode_col: most frequent value across the
      cluster's rows, with its row count;
    - max_<c> / min_<c>: plain extremes (recency / first-seen /
      highest-confidence style rules).

    Scale shape: ``comp`` is matched-names-sized (canonicalized
    upstream, so orders of magnitude smaller than ``rows``) and
    broadcasts; every rule is one groupBy over the cluster-tagged rows
    plus, for frequency rules, a rank-1 window (WindowGroupLimit keeps
    one row per cluster map-side). Nothing shuffles more than once per
    rule, and no rule ever sees untagged rows."""
    from pyspark.sql import Window

    r = rows.join(
        F.broadcast(comp.select("node", "component")),
        rows[entity_col] == F.col("node"),
    ).drop("node")
    out = r.groupBy("component").agg(
        F.countDistinct(entity_col).cast("bigint").alias("n_members"),
        F.count("*").cast("bigint").alias("n_rows_total"),
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
        *[F.min(c).alias(f"min_{c}") for c in min_cols],
    )
    for c in (entity_col, *mode_cols):
        counts = r.groupBy("component", c).agg(F.count("*").alias("__n"))
        w = Window.partitionBy("component").orderBy(
            F.col("__n").desc(), F.col(c)
        )
        prefix = "canonical_" if c == entity_col else "top_"
        out = out.join(
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                "component",
                F.col(c).alias(prefix + c),
                F.col("__n").cast("bigint").alias(prefix + c + "_rows"),
            ),
            "component",
        )
    return out
