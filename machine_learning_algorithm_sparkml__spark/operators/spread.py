"""Scale-adaptive input spreading for compute-bound map stages.

Spark sizes scan partitions by BYTES (``maxPartitionBytes`` /
``openCostInBytes``), which is right for I/O-bound scans and wrong for
per-row-expensive map work: a small table bin-packs into one split —
and a parquet ROW GROUP is indivisible, so this repo's one-row-group
testdata files scan as exactly ONE task no matter the config — which
serializes everything between the scan and the first exchange
(tokenize + shingle + explode, MLlib tree aggregation, higher-order
array folds) onto one core. Measured at sf0.1 on 32 cores (guide §2.5
"input skew", r16 optimization round):

- ``shingle_sets``: 1.02-1.45 s single-task -> 0.24-0.39 s spread
- ``minhash_signatures`` (portable): 1.88 s -> 1.04 s
- ``ngram_jaccard_pairs``: 3.94 s -> 1.71 s
- RF ``pipeline.fit``: 7.4-10.5 s -> 3.0-4.7 s

``spread_rows`` is the shared, SCALE-ADAPTIVE fix: one hash exchange
on a high-cardinality column, applied only when the optimizer's size
estimate says the scan cannot already feed ``defaultParallelism``
tasks. At 100 TB the estimate is terabytes, the guard short-circuits,
and no exchange is added — the knob derives from input size instead of
being tuned for either local mode or the cluster (guide §2). Hash
partitioning (not round-robin) keeps the exchange deterministic and
skips the sort-before-repartition pass that keyless ``repartition(n)``
pays (SPARK-23207).

Related: :func:`operators.multimodal.spread_for_kernel` is the
unconditional round-robin variant predating this helper; it spreads a
bare id projection whose size estimate is bytes-tiny at ANY corpus
scale (the compute lives in the per-id Arrow kernel), so the
unconditional form is correct there and it stays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _estimated_bytes(df: DataFrame) -> int:
    """Optimizer size estimate of ``df`` (bytes): the MIN of the
    whole-plan estimate and the sum of the plan's LEAF estimates.

    The whole-plan number alone is useless after a join — Spark's
    size-only estimator multiplies row widths through join nodes, so a
    broadcast-enriched 2.7 MB scan reports ~1e15 bytes (measured r16)
    and the too-small-to-spread guard never fires. Leaf stats are
    file-accurate; their sum caps the join inflation. The min also
    respects filter/projection reductions when the plan estimate is
    the smaller one. Unknown stats report Long.MaxValue on both paths,
    which safely disables spreading."""
    huge = 2**63 - 1
    try:
        qe = df._jdf.queryExecution()
        plan_est = int(qe.optimizedPlan().stats().sizeInBytes())
    except Exception:
        plan_est = huge
    try:
        leaves = qe.optimizedPlan().collectLeaves()
        leaf_sum = sum(
            int(leaves.apply(i).stats().sizeInBytes()) for i in range(leaves.size())
        )
        if leaf_sum <= 0:
            leaf_sum = huge
    except Exception:
        leaf_sum = huge
    return min(plan_est, leaf_sum)


def spread_rows(
    df: DataFrame,
    by: str | Column | None,
    *,
    n: int | None = None,
    bytes_per_slot: int = 32 << 20,
) -> DataFrame:
    """Repartition ``df`` to ``n`` (default ``defaultParallelism``)
    partitions by hash of ``by`` iff its estimated size is too small
    for the scan to have produced that much parallelism on its own.
    ``bytes_per_slot`` is the per-partition input size above which the
    plain scan is assumed wide enough (32 MB: conservative vs the
    128 MB ``maxPartitionBytes`` default, because the map work this
    guards is per-row compute-bound, not byte-bound). Callers that run
    SEVERAL concurrent jobs over the frame (CrossValidator's parallel
    fits) pass a smaller ``n`` — concurrency already fills the cores,
    and per-fit task-scheduling overhead then dominates (measured r16:
    CV over a 32-partition train 10.5 s vs 7.7-8.7 s at 4-16
    partitions, vs 18.9 s at 1). The exchange is a no-op at cluster
    scale and costs one tiny hash shuffle at fixture scale; downstream
    values are unchanged (everything here is a pure function of row
    values), so oracle hashes are unaffected."""
    sc = df.sparkSession.sparkContext
    target = n if n is not None else sc.defaultParallelism
    target = min(target, sc.defaultParallelism)
    if target <= 1 or _estimated_bytes(df) >= target * bytes_per_slot:
        return df
    if by is None:
        # keyless round-robin (pays the sort-before-repartition pass,
        # SPARK-23207): the fallback when the caller has NO known
        # high-cardinality column — hashing an arbitrary (possibly
        # low-cardinality label/feature) column can collapse into a few
        # skewed partitions while still paying for the exchange
        # (ADVICE r16 #1)
        return df.repartition(target)
    return df.repartition(target, F.col(by) if isinstance(by, str) else by)
