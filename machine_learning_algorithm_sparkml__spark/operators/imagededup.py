"""Perceptual IMAGE dedup — the image-side counterpart of the text
near-dup suite (SURVEY §7.4 north-star; no reference citation: the
reference's scripts never touched image content).

A multimodal training pipeline dedups images the way text pipelines
dedup documents: re-encoded/resized/slightly-edited copies of the same
picture must collapse, which byte-level hashing cannot see. The
standard first-line tool is a PERCEPTUAL hash — here dHash-64
(difference hash): downsample the decoded image to a 9x8 grayscale
grid (nearest neighbor), emit one bit per horizontal gradient
(g[r,c] > g[r,c+1]), giving a 64-bit signature whose Hamming distance
tracks visual similarity.

Pair search follows the SimHash design verbatim (operators/dedup.py:
simhash_near_dup_pairs): split the 64 bits into 4 x 16-bit bands,
bucket-join on band equality, verify candidates with an exact
bit_count(XOR) <= max_hamming filter. With ``max_hamming < 4`` the
banding is PROVABLY cost-only by pigeonhole (at most 3 differing bits
cannot touch all 4 bands, so every qualifying pair shares at least one
exact band) — which is what lets the DuckDB oracle verify against TRUE
all-pairs Hamming with no candidate replay.

Scale design: the decode+hash pass is a per-row Arrow kernel (8 bytes
per image cross the shuffle afterwards); the band join's cost tracks
bucket collisions — visually-distinct corpora spread uniformly over
2^16 buckets per band, so candidates stay ~linear in near-dup density,
never all-pairs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dhash64(pixels: np.ndarray, w: int, h: int) -> int:
    """dHash-64 of a decoded top-down (h, w*3) uint8 RGB array:
    integer grayscale ((r+g+b)//3), nearest-neighbor resample to the
    9x8 grid (src_y = r*h//8, src_x = c*w//9 — works as up- OR
    down-sampling, so tiny fixtures and real photos share the path),
    one bit per horizontal gradient. Returns the SIGNED 64-bit value
    (bit 63 wraps negative — Spark LongType semantics)."""
    rgb = pixels.reshape(h, w, 3).astype(np.int64)
    gray = rgb.sum(axis=2) // 3
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    grid = gray[np.ix_(ys, xs)]
    bits = grid[:, :8] > grid[:, 1:]
    val = 0
    for i, b in enumerate(bits.reshape(64)):
        if b:
            val |= 1 << i
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def image_dhash(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """(id, dhash) from PNG payloads: decode + hash in one Arrow
    kernel; only 8 bytes per image leave the executor."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_png,
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hashes = []
            for payload in pdf["payload"]:
                w, h, px = decode_png(bytes(payload))
                hashes.append(dhash64(px, w, h))
            yield pd.DataFrame({"doc_id": pdf[id_col], "dhash": hashes})

    return df.mapInPandas(_hash, schema="doc_id long, dhash long")


def dhash_near_dup_pairs(
    hashes: DataFrame,
    *,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup image pairs from dHash signatures: 4 x 16-bit band
    bucketing, exact Hamming verify. ``max_hamming`` must stay below
    the band count (4) for the pigeonhole recall-1.0 guarantee the
    oracle relies on. Output: (id_a, id_b, hamming), id_a < id_b."""
    if not 0 <= max_hamming < 4:
        raise ValueError("max_hamming must be in 0..3 (pigeonhole bound)")
    h = F.col(hash_col)
    banded = hashes.select(
        F.col(id_col),
        h,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftrightunsigned(h, 16 * k)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("b"),
    ).select(F.col(id_col), h, F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("h_a"), "band", "val"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("h_b"), "band", "val"
    )
    cand = (
        left.join(right, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
