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


def quantize_int8_arrow(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The same symmetric int8 quantization through ``mapInArrow`` —
    the Arrow-NATIVE Python crossing: RecordBatches flow to Python as
    pyarrow buffers and the kernel runs on zero-copy numpy views, with
    no pandas materialization on either side (the cheapest possible
    Python boundary; ``mapInPandas`` pays Series construction per
    batch, row-at-a-time UDFs pay per-row pickling). This is the
    pattern for numeric kernels that genuinely need Python (a custom
    codec, a C-extension quantizer): per-batch vectorized math over
    the flattened list values using offset arithmetic
    (``reduceat`` on per-row segment starts), never a Python loop
    over rows. Kernel math mirrors ``quantize_int8`` exactly —
    including round-half-AWAY-from-zero via copysign(floor(|r|+.5))
    (numpy's own ``round`` is half-to-even and would drift off the
    JVM/SQL semantics one code in ~2^52) — so the JVM ``F.transform``
    twin verifies the whole crossing row-for-row, and the same DuckDB
    oracle covers both. In production the JVM path is the default;
    the Arrow path exists for kernels Spark cannot express."""
    out_schema = (
        f"{id_col} bigint, scale double, n_dim int, "
        "q0 int, q1 int, q2 int, q3 int, max_abs_q int, q_in_range boolean"
    )

    def quantize_batches(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            ids = batch.column(id_col)
            col = batch.column(vec_col)
            lengths = pc.list_value_length(col).to_numpy().astype(np.int64)
            if len(lengths) == 0:  # empty batch: nothing to emit
                continue
            # fail fast with a clear message instead of the opaque
            # executor errors short vectors would otherwise cause:
            # q0..q3 index starts+0..3 (needs >= 4 dims) and a
            # zero-length list corrupts reduceat's segment starts
            if len(lengths) and lengths.min() < 4:
                bad = int(ids[int(np.argmin(lengths))].as_py())
                raise ValueError(
                    f"quantize_int8_arrow requires >= 4 dims per vector; "
                    f"{id_col}={bad} has {int(lengths.min())} "
                    "(use quantize_int8, the JVM twin, for arbitrary dims)"
                )
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            starts = np.zeros(len(lengths), dtype=np.int64)
            np.cumsum(lengths[:-1], out=starts[1:])
            max_abs = np.maximum.reduceat(np.abs(flat), starts)
            scale = max_abs / 127.0
            safe = np.repeat(np.where(scale == 0.0, 1.0, scale), lengths)
            r = flat / safe
            q = np.copysign(np.floor(np.abs(r) + 0.5), r)
            q[np.repeat(scale, lengths) == 0.0] = 0.0
            q = q.astype(np.int32)
            max_abs_q = np.maximum.reduceat(np.abs(q), starts).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(scale, type=pa.float64()),
                    pa.array(lengths.astype(np.int32), type=pa.int32()),
                    pa.array(q[starts + 0], type=pa.int32()),
                    pa.array(q[starts + 1], type=pa.int32()),
                    pa.array(q[starts + 2], type=pa.int32()),
                    pa.array(q[starts + 3], type=pa.int32()),
                    pa.array(max_abs_q, type=pa.int32()),
                    pa.array(max_abs_q <= 127),
                ],
                names=[
                    id_col, "scale", "n_dim",
                    "q0", "q1", "q2", "q3", "max_abs_q", "q_in_range",
                ],
            )

    return df.select(id_col, vec_col).mapInArrow(quantize_batches, out_schema)


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
