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
