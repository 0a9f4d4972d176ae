"""Class rebalancing by random undersampling (M12).

The reference balances FATAL vs RESOLVED by sampling the majority
class down to the minority ratio, then unioning (``A related
code.txt:69-81``): filter the two classes apart, two ``count()``
actions for the ratio, ``sample``, ``unionAll``.

Engine improvements (SURVEY §7.5): the class counts come from ONE
aggregation (``groupBy(label).count()``) rather than the reference's
two separate full-scan count jobs, and the sample seed is mandatory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undersample_balance(
    df: DataFrame,
    label_col: str,
    minority_value: object,
    majority_value: object,
    *,
    seed: int = 754,
) -> DataFrame:
    """M12: minority rows in full + majority rows sampled at
    ratio = |minority| / |majority| (the reference divides by the
    *total*, ``A related code.txt:77`` — we divide by the majority
    count so the expected output is actually balanced 1:1; the
    reference's total-denominator is one of its transcription-era
    quirks, see SURVEY §2.13).
    """
    counts = {
        r[label_col]: r["n"]
        for r in df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_minority = counts.get(minority_value, 0)
    n_majority = counts.get(majority_value, 0)
    if n_minority == 0 or n_majority == 0:
        raise ValueError(f"both classes must be present: counts={counts}")
    ratio = min(1.0, n_minority / n_majority)
    minority = df.filter(F.col(label_col) == F.lit(minority_value))
    majority_sample = df.filter(F.col(label_col) == F.lit(majority_value)).sample(
        withReplacement=False, fraction=ratio, seed=seed
    )
    return minority.unionAll(majority_sample)
