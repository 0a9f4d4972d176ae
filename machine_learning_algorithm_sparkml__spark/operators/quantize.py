"""Embedding quantization (additive, SURVEY.md §7.4).

Symmetric per-vector int8 quantization — the standard 4× memory/IO
reduction before ANN indexing at scale: ``scale = max|x| / 127``,
``q_i = round(x_i / scale)`` with ``q_i ∈ [-127, 127]``. Pure
``F.transform`` projection over the ``array<float>`` column — JVM-
side, shuffle-free, no UDF — so it composes with any downstream
bucketing without changing the partitioning.

Determinism: the float→double promotion is exact, max() over doubles
is order-independent, and both Spark and DuckDB round halves away
from zero — so the quantized ints (and the scale double) are
oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "q",
) -> DataFrame:
    """Adds ``scale`` (double) and ``out_col`` (array<int>, each in
    [-127,127]) columns. All-zero vectors get scale=0.0 and all-zero
    codes."""
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    max_abs = F.array_max(F.transform(x, lambda v: F.abs(v)))
    scale = (max_abs / F.lit(127.0)).alias("scale")
    q = F.when(
        max_abs == 0.0,
        F.transform(x, lambda v: F.lit(0)),
    ).otherwise(
        F.transform(x, lambda v: F.round(v / (max_abs / F.lit(127.0))).cast("int"))
    )
    return df.select(F.col(id_col), scale, q.alias(out_col))


def dequantize_error_bound(
    quantized: DataFrame,
    original: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_col: str = "q",
) -> DataFrame:
    """Reconstruction check: max |x_i - q_i*scale| per vector must be
    ≤ scale/2 (+ an epsilon for the rounding boundary). Joins codes
    back to the originals on the id — used by tests and the driver
    invariant, not the hot path."""
    joined = quantized.join(original.select(id_col, vec_col), id_col)
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    recon_err = F.array_max(
        F.zip_with(
            x,
            F.col(q_col),
            lambda xv, qv: F.abs(xv - qv.cast("double") * F.col("scale")),
        )
    )
    return joined.select(
        id_col,
        "scale",
        recon_err.alias("max_err"),
        (recon_err <= F.col("scale") * F.lit(0.5000001)).alias("err_ok"),
    )
