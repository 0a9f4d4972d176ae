"""Multimodal column plumbing (SURVEY.md §7.4).

Images/audio/video are carried as opaque ``binary`` payload columns
with a typed metadata struct — parquet-native, splittable, and
prunable (readers that only need metadata never touch the bytes).

The Spark-side plumbing here is REAL and tested: schemas, Arrow-batched
``mapInPandas`` operators, deterministic partitioning. The actual
codec work is STUBBED — the container has no image/audio libraries —
behind ``decode_stub``: a clearly-marked deterministic fake that
derives "decoded" properties from the payload bytes. Swapping in a
real decoder changes ONE function body, not the pipeline.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Metadata struct attached to every payload.
MEDIA_META_SCHEMA = "mime string, n_bytes int, sha256 string"

#: Output schema of the (stubbed) image decode.
DECODED_SCHEMA = "doc_id long, mime string, width int, height int, n_channels int"

#: Output schema of the (stubbed) feature extractor.
FEATURE_DIM = 16
FEATURES_SCHEMA = "doc_id long, features array<float>"


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str, *, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a column as a binary payload + metadata struct. In this
    repo the payload is the utf-8 text bytes (the testdata has no real
    media); in production it is the raw media bytes. Metadata is
    computed JVM-side (octet_length, sha2)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("media_meta"),
    )


def decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: derives (width, height, channels) deterministically
    from the payload's sha256. A real implementation would be e.g.
    ``PIL.Image.open(io.BytesIO(payload)).size``.

    Raises ``NotImplementedError`` for payloads claiming a real image
    mime type — the fake must never masquerade as a real decode."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 1 + digest[2] % 3
    return width, height, channels


def decode_media(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode over (id, payload, media_meta) frames.

    ``mapInPandas``: each batch arrives as a pandas DataFrame, the
    decode loop runs per batch (vectorizable in a real decoder), and
    only the decoded properties leave the executor — payload bytes
    never cross back to the JVM."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mimes = pdf["media_meta"].map(lambda m: m["mime"])
            if mimes.str.startswith(("image/", "audio/", "video/")).any():
                raise NotImplementedError(
                    "real media decoding is stubbed in this environment; "
                    "swap decode_stub for a codec-backed implementation"
                )
            decoded = pdf["payload"].map(decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": mimes,
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "n_channels": decoded.map(lambda t: t[2]),
                }
            )

    return df.mapInPandas(_decode, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame, *, id_col: str = "doc_id", dim: int = FEATURE_DIM) -> DataFrame:
    """Arrow-batched feature extraction stub: a deterministic
    ``dim``-float vector per payload (sha256-seeded). Real version:
    an ONNX/torch forward pass per batch. The Spark contract — batch
    iterator in, fixed-width float arrays out — is identical."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = pdf["payload"].map(lambda p: _payload_features(p, dim))
            yield pd.DataFrame({"doc_id": pdf[id_col], "features": feats})

    return df.mapInPandas(_features, schema=FEATURES_SCHEMA)


def _payload_features(payload: bytes, dim: int) -> list[float]:
    digest = hashlib.sha256(payload).digest()
    raw = (digest * ((dim // len(digest)) + 1))[:dim]
    return [b / 255.0 for b in raw]


def frame_sample(df: DataFrame, *, id_col: str = "doc_id", n_frames: int = 4) -> DataFrame:
    """"Video" frame sampling stub: split the payload into
    ``n_frames`` evenly-spaced byte windows, one row per frame —
    the explode-shaped plumbing a real frame sampler needs (row
    multiplication, per-frame metadata), JVM-side."""
    frame_idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    n = F.octet_length("payload")
    base = df.select(F.col(id_col), F.col("payload"), frame_idx)
    width = F.greatest(n / n_frames, F.lit(1)).cast("int")
    return base.select(
        id_col,
        "frame_idx",
        F.substring(F.col("payload"), (F.col("frame_idx") * width + 1).cast("int"), width).alias("frame_bytes"),
    )
