"""Set operations, sampling, splits, counts (SURVEY.md §2.5, §2.8).

Reference parity map:
- A1 global count       — ``A related code.txt:77``
- U1 unionAll           — ``A related code.txt:80``
- U2 Bernoulli sample   — ``A related code.txt:78``
- U3 seeded randomSplit — ``MarchineLearningAlgorithm.txt:91`` (seed 754)

The reference has no ``groupBy().agg()`` (SURVEY §2.5) but its report's
Tableau pivot implies group-by-count; the idiomatic realization lives
in ``__spark_entry__`` as plain ``df.groupBy(...).count()``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def global_count(df: DataFrame) -> int:
    """A1: action — full count. The reference runs two of these to
    compute an undersampling ratio (``A related code.txt:77``); callers
    that need several counts over the same frame should cache it first
    (the reference rescans — do not replicate)."""
    return df.count()


def union_all(first: DataFrame, *rest: DataFrame) -> DataFrame:
    """U1: bag-semantics positional union (``A related code.txt:80``).

    ``unionAll`` is an alias of ``union`` in Spark >= 2.0; duplicates
    are kept, matching is by column POSITION. Union is shuffle-free —
    partitions of the inputs are simply concatenated.
    """
    out = first
    for df in rest:
        out = out.unionAll(df)
    return out


def sample_fraction(df: DataFrame, fraction: float, *, seed: int = 754, with_replacement: bool = False) -> DataFrame:
    """U2: per-partition Bernoulli sample (``A related code.txt:78``).

    The reference passes no seed; the engine REQUIRES one (defaulting
    to the reference's own split seed 754) because reproducibility is
    the reference's stated rule (``MarchineLearningAlgorithm.txt:87-91``).
    Note: results are deterministic per (seed, partitioning) — pin the
    input partitioning in tests.
    """
    return df.sample(withReplacement=with_replacement, fraction=fraction, seed=seed)


def seeded_random_split(df: DataFrame, weights: Sequence[float] = (0.8, 0.2), seed: int = 754) -> list[DataFrame]:
    """U3: seeded train/test split — ``randomSplit(Array(0.8, 0.2), 754)``
    (``MarchineLearningAlgorithm.txt:91``, ``...USElectionPrediction
    .txt:106``). Each downstream action rescans the parent; cache the
    parent before splitting when both halves are consumed."""
    return df.randomSplit(list(weights), seed=seed)


# --- portable hash-gate sampling ----------------------------------------------
#
# Spark's sample()/sampleBy()/randomSplit() are seeded per-PARTITION
# RNG streams: deterministic only for a fixed (seed, partitioning),
# and not replayable on any other engine. At 100 TB that coupling is a
# liability — a repartition, an AQE coalesce, or a source re-split
# silently changes WHICH rows survive. The portable alternative keys
# the keep/drop verdict on a hash of a ROW IDENTITY instead: the
# verdict is a pure projection, identical on any engine that computes
# md5 of the same bytes, stable under any partitioning, and
# join-reproducible (you can recompute yesterday's sample membership
# exactly). This is the same gate `mixture_weighted_sample` /
# `hash_split_label` already use; here it is the first-class operator
# form with arbitrary fractions at 24-bit granularity.

_GATE_SCALE = 1 << 24  # 6 hex chars; rate granularity 2^-24 (~6e-8)


def _gate_u24(key: "Column", seed: int) -> "Column":
    """Uniform 24-bit integer from md5 over (seed, key). The seed is
    prefixed into the hashed bytes, so different seeds give
    INDEPENDENT gates (re-sampling with a new seed is not correlated
    with the old sample — unlike offsetting a threshold)."""
    from pyspark.sql import functions as F

    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 6), 16, 10).cast("long")


def hash_gate_sample(df: DataFrame, key: str, fraction: float, *, seed: int = 754) -> DataFrame:
    """Portable Bernoulli sample: keep a row iff u24(seed, key) <
    floor(fraction * 2^24). Shuffle-free filter; exact-integer
    threshold so any engine replays the identical row set."""
    threshold = int(fraction * _GATE_SCALE)
    from pyspark.sql import functions as F

    return df.filter(_gate_u24(F.col(key), seed) < threshold)


def hash_gate_sample_by(
    df: DataFrame, key: str, strata: str, fractions: dict[str, float], *, seed: int = 754
) -> DataFrame:
    """Portable ``sampleBy``: per-stratum keep rates via one CASE over
    the same 24-bit gate. Unlisted strata are dropped (rate 0),
    matching ``sampleBy``'s contract."""
    from pyspark.sql import functions as F

    threshold = F.lit(0)
    for value, fraction in fractions.items():
        threshold = F.when(F.col(strata) == value, F.lit(int(fraction * _GATE_SCALE))).otherwise(threshold)
    return df.filter(_gate_u24(F.col(key), seed) < threshold)


def hash_gate_split(
    df: DataFrame, key: str, weights: Sequence[float] = (0.8, 0.2), *, seed: int = 754
) -> DataFrame:
    """Portable ``randomSplit``: label each row by which cumulative
    weight band its 24-bit gate falls in. Returns ONE frame with a
    ``split`` column ("s0", "s1", ...) — the splits partition the
    input EXACTLY (every row gets exactly one label; RNG randomSplit
    can drop/duplicate rows if the parent is nondeterministic), and
    membership survives any repartitioning."""
    from pyspark.sql import functions as F

    total = float(sum(weights))
    bands = []
    acc = 0.0
    for w in weights[:-1]:
        acc += w / total
        bands.append(int(acc * _GATE_SCALE))
    u24 = _gate_u24(F.col(key), seed)
    label = F.lit(f"s{len(weights) - 1}")
    for i in range(len(bands) - 1, -1, -1):
        label = F.when(u24 < bands[i], F.lit(f"s{i}")).otherwise(label)
    return df.withColumn("split", label)
