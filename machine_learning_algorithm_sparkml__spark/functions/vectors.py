"""Vector math over ``array<float/double>`` columns (SURVEY.md §7.4).

Pure ``F.zip_with`` / ``F.aggregate`` compositions — JVM-side, no
Python, no UDF. Elements are cast to double BEFORE multiplication so
results are reproducible against any double-precision oracle (float
x float rounds to float; double x double does not).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    """Sum of elementwise products, accumulated in doubles, in list
    order (deterministic)."""
    products = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector is all-zero (instead
    of NaN) so downstream rank/filter logic stays total."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)
