"""Python UDTF surface (SURVEY.md §2.9 — the last of the five Python
extension mechanisms next to scalar pandas_udf, applyInPandas,
mapInPandas, and applyInPandasWithState).

A UDTF is a per-row GENERATOR (one input row -> many output rows) and
runs row-at-a-time in the Python worker — the slow path by this repo's
own rules. It earns its place only where the per-row work is a
nontrivial Python generator; for anything expressible as
explode/sequence/slice, the native column functions win by an order of
magnitude, and the hot-path version of THIS operator is exactly that
(see the chunk query's docstring). The UDTF exists so the engine's
extension surface covers the mechanism with an honest example.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

CHUNK_SIZE = 16
CHUNK_STRIDE = 12  # 4-token overlap between consecutive chunks


@udtf(returnType="doc_id bigint, chunk_idx int, chunk string, n_tokens int")
class ChunkTokens:
    """Context-window chunker: split a document's token stream into
    CHUNK_SIZE-token windows every CHUNK_STRIDE tokens (overlapping by
    CHUNK_SIZE - CHUNK_STRIDE), the standard prep for embedding /
    training jobs whose models have a fixed context window. Emits
    (doc_id, 1-based chunk_idx, chunk text, tokens in chunk)."""

    def eval(self, doc_id, text):  # noqa: D102 - contract documented above
        toks = [w for w in re.split(r"\s+", (text or "").strip()) if w]
        idx = 0
        for p in range(0, len(toks), CHUNK_STRIDE):
            idx += 1
            window = toks[p : p + CHUNK_SIZE]
            yield doc_id, idx, " ".join(window), len(window)
