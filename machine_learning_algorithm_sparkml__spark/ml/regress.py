"""Model-per-group fitting via grouped-map ``applyInPandas``.

The canonical distributed "one model per key" pattern: Spark shuffles
each group to one task, hands it to pandas as a whole, and the fit
runs vectorized inside the Arrow batch — thousands of independent
models in one pass, no driver loop, no MLlib session state. OLS is
the demonstrator because its closed form is engine-replayable
(DuckDB ``regr_slope``/``regr_intercept``), so the whole grouped-map
crossing is oracle-checkable — unlike the MLlib keys, whose tree
internals are not.

Scale notes: state per task is ONE group's rows; skewed group sizes
are the hazard (a group must fit in one task's memory), which is the
documented contract of every grouped-map operator — for
heavier-than-memory groups, switch to the sufficient-statistics form
(sum/sum-of-squares aggregates compose map-side and need no grouped
materialization; the closed form below IS that computation, just
expressed per-batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

OLS_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("slope", T.DoubleType()),
        T.StructField("intercept", T.DoubleType()),
        T.StructField("corr_xy", T.DoubleType()),
    ]
)


def _fit_one_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Closed-form simple OLS on one group's (x, y) rows — the exact
    population moments ``regr_slope``/``regr_intercept`` define:
    slope = cov(x,y)/var(x), intercept = mean(y) - slope*mean(x)."""
    x = pdf["x"].to_numpy(dtype="float64")
    y = pdf["y"].to_numpy(dtype="float64")
    xm, ym = x.mean(), y.mean()
    dx, dy = x - xm, y - ym
    sxx = float((dx * dx).sum())
    sxy = float((dx * dy).sum())
    syy = float((dy * dy).sum())
    # degenerate groups follow the SQL regr_* / corr contract (a
    # single row or constant x has no defined slope; constant x OR y
    # has no defined correlation): emit NULL, never raise — one bad
    # group must not kill the job
    slope = sxy / sxx if sxx > 0.0 else None
    return pd.DataFrame(
        {
            "group_key": [pdf["group_key"].iloc[0]],
            "n": [len(pdf)],
            "slope": [slope],
            "intercept": [ym - slope * xm if slope is not None else None],
            "corr_xy": [sxy / (sxx * syy) ** 0.5 if sxx > 0.0 and syy > 0.0 else None],
        }
    )


def group_ols(df: DataFrame, group_col: str, x_col: str, y_col: str) -> DataFrame:
    """Per-group simple linear regression. Input columns are renamed
    to a fixed (group_key, x, y) contract so the pandas fit is
    schema-stable; output one row per group."""
    from pyspark.sql import functions as F

    prepared = df.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    return prepared.groupBy("group_key").applyInPandas(
        _fit_one_group, schema=OLS_SCHEMA
    )


RIDGE_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("slope", T.DoubleType()),
        T.StructField("intercept", T.DoubleType()),
        T.StructField("slope_ols", T.DoubleType()),
    ]
)


def _make_ridge_fit(lam: float):
    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        """Closed-form simple RIDGE on one group (centered
        formulation, intercept unpenalized): slope = Sxy / (Sxx +
        lam*n), intercept = mean(y) - slope*mean(x). The per-sample
        penalty lam*n keeps the shrinkage strength
        scale-invariant — the same lam regularizes the same amount at
        any corpus size, where a raw +lam would vanish as Sxx grows
        with n. Pure sufficient-statistics math, so the fit is
        engine-replayable (DuckDB regr_sxy / regr_sxx / regr_count)
        and, unlike the grouped materialization used here for the
        demonstrator, composes map-side when a group outgrows one
        task."""
        x = pdf["x"].to_numpy(dtype="float64")
        y = pdf["y"].to_numpy(dtype="float64")
        n = len(pdf)
        xm, ym = x.mean(), y.mean()
        dx, dy = x - xm, y - ym
        sxx = float((dx * dx).sum())
        sxy = float((dx * dy).sum())
        # ridge slope is defined even for constant x (lam*n > 0 keeps
        # the denominator positive); the OLS reference column follows
        # regr_slope and emits NULL for the degenerate group
        slope = sxy / (sxx + lam * n)
        return pd.DataFrame(
            {
                "group_key": [pdf["group_key"].iloc[0]],
                "n": [n],
                "slope": [slope],
                "intercept": [ym - slope * xm],
                "slope_ols": [sxy / sxx if sxx > 0.0 else None],
            }
        )

    return _fit


def group_ridge(
    df: DataFrame, group_col: str, x_col: str, y_col: str, *, lam: float = 1.0
) -> DataFrame:
    """Per-group ridge regression (simple, closed-form; see
    ``_make_ridge_fit``). Returns the ridge slope/intercept plus the
    unregularized OLS slope so the shrinkage is visible per group."""
    from pyspark.sql import functions as F

    prepared = df.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    )
    return prepared.groupBy("group_key").applyInPandas(
        _make_ridge_fit(lam), schema=RIDGE_SCHEMA
    )
