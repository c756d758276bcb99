"""Multimodal (image/audio/video) column plumbing (SURVEY.md §7 M7).

Media travel as opaque ``binary`` columns with a typed metadata struct
alongside — the pattern the reference's evidence-image URLs point at
(it stores URLs; a training pipeline stores/decodes the bytes).

The Spark-side plumbing here is real and tested: schemas, Arrow batch
shape, ``mapInPandas`` signatures, partition sizing. The actual codec
step is STUBBED — image/audio libraries are not in this container —
behind ``decode_fn`` hooks: pass a real decoder (PIL/torchaudio/...)
in production; the default ``deterministic_fake_decode`` derives
metadata purely from the byte content so tests and the DuckDB oracle
can verify the plumbing end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# output schema of the decode step — stable contract for downstream ops
DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, format string"
)


def attach_binary(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes of
    the text column — the container has no real media, so documents
    stand in for blobs; with real data this column comes straight off
    ``spark.read.format('binaryFile')``)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def deterministic_fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Stand-in for an image codec: derives (width, height, format)
    deterministically from the payload bytes. Replace with a real
    decoder; the signature is the contract."""
    n = len(payload)
    width = n % 64 + 1
    height = n % 37 + 1
    fmt = "png" if n % 2 == 0 else "jpeg"
    return width, height, fmt


def real_image_decode(payload: bytes) -> tuple[int, int, str]:
    """Real decoder hook: uses PIL when available, otherwise raises —
    clearly marking the stubbed boundary."""
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as e:  # pragma: no cover - not in this container
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed in "
            "this environment; use deterministic_fake_decode for plumbing "
            "tests or install PIL in production"
        ) from e
    img = Image.open(io.BytesIO(payload))  # pragma: no cover
    return img.width, img.height, (img.format or "unknown").lower()  # pragma: no cover


def decode_image_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_fn: Callable[[bytes], tuple[int, int, str]] = deterministic_fake_decode,
) -> DataFrame:
    """Decode / feature-extract over binary payloads via ``mapInPandas``:
    Arrow-batched binary in, typed metadata out. The per-batch loop is
    where a vectorized decoder (or GPU batch) plugs in; partitioning and
    batch sizing are inherited from the scan, so a 100 TB run is just
    more partitions of the same shape."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            meta = [decode_fn(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "format": [m[2] for m in meta],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode_batches, DECODE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 32,
) -> DataFrame:
    """Frame-sampling plumbing (video analog): emit one row per sampled
    offset with a small byte slice — the explode-shaped output a real
    frame sampler would produce. Sampling positions are deterministic
    functions of payload length."""
    n = F.length(F.col(payload_col))
    # Zero-length payloads must yield zero frames, not an error: under
    # ANSI mode sequence(0, -1, 32) raises 'Illegal sequence boundaries'
    # (SQL range() semantics would just be empty).
    offsets = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(every_n_bytes))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(payload_col).alias("payload"),
            F.explode(offsets).alias("frame_offset"),
        )
        .select(
            "doc_id",
            "frame_offset",
            F.substring(F.col("payload"), F.col("frame_offset") + 1, 8).alias("frame_bytes"),
        )
    )


RESIZE_SCHEMA = "doc_id long, width int, height int, payload binary"


def deterministic_fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Stand-in for a raster resize: returns exactly width*height bytes
    (truncate or zero-pad). Replace with a real codec; the signature —
    bytes in, target dims, bytes out — is the contract."""
    target = width * height
    return payload[:target].ljust(target, b"\x00")


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    resize_fn: Callable[[bytes, int, int], bytes] = deterministic_fake_resize,
) -> DataFrame:
    """Resize plumbing via ``mapInPandas``: binary in, binary out, fixed
    target dims in the output schema. Binary-to-binary is the shape
    that matters — the resized payload column feeds straight into a
    writer or the decode/feature steps, staying Arrow-batched end to
    end with no driver round-trip. A GPU/vectorized resizer replaces
    the per-row loop inside the batch without touching the plan."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": [
                        resize_fn(bytes(p), width, height) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize_batches, RESIZE_SCHEMA)


# --- perceptual hashing (image near-dup) -------------------------------------
PHASH_SCHEMA = "doc_id long, phash string"


def phash64_bytes(payload: bytes) -> str:
    """64-bit perceptual hash (pHash) of a decoded grayscale image:
    2D DCT-II of the 32x32 pixel grid, keep the 8x8 low-frequency
    corner, threshold each coefficient at the median -> 64 '0'/'1'
    chars (row-major). Here the "pixels" are the payload bytes tiled
    into the grid (the deterministic stand-in for a real
    decode+resize, same stub boundary as deterministic_fake_decode);
    with a real codec, pass the resized grayscale array through the
    identical DCT/threshold tail. Pure numpy, deterministic."""
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return "0" * 64
    size = 32 * 32
    reps = -(-size // arr.size)
    img = np.tile(arr, reps)[:size].astype(np.float64).reshape(32, 32)
    n = 32
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    basis = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * j + 1) * k / (2 * n))
    basis[0] /= np.sqrt(2.0)
    low = (basis @ img @ basis.T)[:8, :8].flatten()
    med = float(np.median(low))
    return "".join("1" if v > med else "0" for v in low)


def phash_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    phash_fn: Callable[[bytes], str] = phash64_bytes,
) -> DataFrame:
    """(id, phash) over binary payloads via ``mapInPandas`` — the same
    Arrow-batched decode shape as decode_image_metadata; a production
    pipeline swaps ``phash_fn`` for decode+resize+pHash (or a GPU batch
    of it). Embarrassingly parallel, no shuffle."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "phash": [phash_fn(bytes(p)) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(hash_batches, PHASH_SCHEMA)


def phash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Image near-duplicate pairs: pHash signatures + the SAME
    pigeonhole Hamming block join the text SimHash path uses
    (operators/dedup.hamming_near_pairs) — one signature pass over the
    bytes, then candidates only where a 16-bit block collides. The
    multimodal member of the dedup family: exact/Jaccard/MinHash/
    SimHash for text, cosine for embeddings, pHash for images."""
    from evidence_images_etl_airflow_spark.operators.dedup import (
        hamming_near_pairs,
    )

    sig = phash_images(df, id_col, payload_col)
    return hamming_near_pairs(
        sig, "doc_id", "phash", max_hamming=max_hamming, blocks=blocks
    )


def deterministic_fake_audio_features(
    text: str, frame_chars: int = 32
) -> tuple[int, float, int, int]:
    """Stand-in for an audio feature extractor (frame energies over
    fixed-size PCM windows): frames the payload into ``frame_chars``
    char windows and derives a deterministic pseudo-energy per frame
    from its md5 — the real extractor (torchaudio/librosa RMS per
    window) drops into the same signature. Returns
    (n_frames, mean_energy, peak_frame, peak_energy); empty payloads
    yield (0, 0.0, -1, 0)."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    frames = [
        text[i : i + frame_chars] for i in range(0, len(text), frame_chars)
    ]
    if not frames:
        return 0, 0.0, -1, 0
    energies = [
        int(hashlib.md5(f.encode("utf-8")).hexdigest()[:15], 16) % 1000
        for f in frames
    ]
    peak = max(range(len(energies)), key=lambda i: (energies[i], -i))
    # HALF_UP on the double's exact decimal expansion — the rounding
    # F.round and the DuckDB oracle share. Python's builtin round() is
    # half-to-EVEN and diverges on exact 6dp ties (mean = k + m/128
    # with odd m is a terminating ...5 decimal: 1/128 = 0.0078125).
    mean = float(
        Decimal(sum(energies) / len(energies)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )
    return len(frames), mean, peak, energies[peak]


def extract_audio_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    frame_chars: int = 32,
) -> DataFrame:
    """Audio feature-extraction plumbing, Arrow-batched: one
    ``mapInPandas`` pass framing each payload and reducing it to the
    per-document feature row — the batch shape (many rows in, one
    feature row per input row out, no shuffle) that a real
    spectrogram/RMS extractor needs at 100 TB. The codec itself is the
    deterministic fake (no audio libs in this container); the
    signature, batching, and schema are the production contract."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, n_frames int, mean_energy double, "
        "peak_frame int, peak_energy int"
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar access, not iterrows: the codec is per-row
            # Python either way, but zip over the two Series avoids
            # boxing every cell of every column into row objects
            feats_rows = [
                deterministic_fake_audio_features(t, frame_chars)
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "n_frames": [f[0] for f in feats_rows],
                    "mean_energy": [f[1] for f in feats_rows],
                    "peak_frame": [f[2] for f in feats_rows],
                    "peak_energy": [f[3] for f in feats_rows],
                }
            )

    return df.select(id_col, text_col).mapInPandas(feats, out_schema)
