"""Pin the local parity drive's driver-model dtype sensitivity.

Round-10 postmortem: DuckDB `SUM(<integer>)` returns HUGEINT, which
pandas canonicalizes to float64, while Spark's SUM emits int64. The
driver's hash is dtype-sensitive, so three r10 window keys hash-failed
while the then value-based local drive certified them green. These
tests make that failure mode locally unrepresentable: a
HUGEINT-producing oracle MUST fail `compare_key`, and the
`CAST(... AS BIGINT)` form MUST pass."""

from __future__ import annotations

import duckdb
import pytest

from tools.parity_drive import _klass, compare_key


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def test_hugeint_sum_oracle_is_a_local_failure(spark, con):
    """Bare integer SUM in an oracle (HUGEINT -> float64) must be
    flagged even though every value equals the Spark int64 side."""
    sdf = spark.sql("SELECT 'A' AS k, CAST(238 AS BIGINT) AS n")
    n, schema_ok, values_ok, detail = compare_key(
        sdf, con, "SELECT 'A' AS k, SUM(1) AS n FROM range(238)"
    )
    assert schema_ok
    assert not values_ok
    assert ("n", "int", "float") in detail


def test_cast_bigint_sum_oracle_passes(spark, con):
    sdf = spark.sql("SELECT 'A' AS k, CAST(238 AS BIGINT) AS n")
    n, schema_ok, values_ok, detail = compare_key(
        sdf, con, "SELECT 'A' AS k, CAST(SUM(1) AS BIGINT) AS n FROM range(238)"
    )
    assert schema_ok and values_ok and not detail


def test_spark_decimal_output_is_a_local_failure(spark, con):
    """Spark-side DecimalType canonicalizes to object(Decimal) under
    pandas and hash-fails at the driver (r9 postmortem); the drive
    must flag it against a float oracle of equal value."""
    sdf = spark.sql("SELECT CAST(1.50 AS DECIMAL(18,2)) AS price")
    n, schema_ok, values_ok, detail = compare_key(
        sdf, con, "SELECT CAST(1.50 AS DOUBLE) AS price"
    )
    assert schema_ok
    assert not values_ok
    assert ("price", "decimal", "float") in detail


def test_oracle_decimal_floats_like_the_driver(spark, con):
    """DuckDB DECIMAL lands as float64 in pandas and hashes like any
    double — a Spark DOUBLE side of equal value must pass (r10 lesson:
    a side-blind decimal tag falsely failed ml_one_hot/range_join)."""
    sdf = spark.sql("SELECT CAST(1.5 AS DOUBLE) AS price")
    n, schema_ok, values_ok, detail = compare_key(
        sdf, con, "SELECT CAST(1.50 AS DECIMAL(18,2)) AS price"
    )
    assert schema_ok and values_ok and not detail


def test_int_width_is_not_a_split(spark, con):
    """int32 vs int64 hash identically once values are python ints —
    width must NOT be flagged, only class."""
    sdf = spark.sql("SELECT CAST(7 AS INT) AS n")
    n, schema_ok, values_ok, detail = compare_key(
        sdf, con, "SELECT CAST(7 AS BIGINT) AS n"
    )
    assert schema_ok and values_ok and not detail


def test_nulls_do_not_define_the_class(spark, con):
    """A leading NULL must not decide an object column's class; the
    first non-null value does."""
    import pandas as pd

    s = pd.Series([None, "x"], dtype=object)
    assert _klass(s) == "str"
    assert _klass(pd.Series([None, None], dtype=object)) == "empty"


def test_date_equals_midnight_datetime_pinned_by_driver(spark, con):
    """Spark DATE (object(datetime.date) under pandas) vs DuckDB DATE
    (datetime64[us] midnight under pandas) must compare EQUAL — the
    r11 driver hash-passed every date-output key under exactly this
    pairing (sql_tpch_q3/q18, retention_cohort, scalar_date_funcs).
    ADVICE r11 notes the flip side: a genuine midnight TIMESTAMP also
    equals a DATE oracle under this rule. That is the observed driver
    behavior; this test is the tripwire to revisit if the driver ever
    splits them."""
    sdf = spark.sql("SELECT DATE '1995-03-15' AS d")
    n, schema_ok, values_ok, detail = compare_key(
        sdf, con, "SELECT DATE '1995-03-15' AS d"
    )
    assert schema_ok and values_ok, detail
    # and the coarse side of the trade, pinned explicitly:
    sdf2 = spark.sql("SELECT TIMESTAMP '1995-03-15 00:00:00' AS d")
    n, schema_ok, values_ok, detail = compare_key(
        sdf2, con, "SELECT DATE '1995-03-15' AS d"
    )
    assert schema_ok and values_ok, detail
    # a NON-midnight timestamp must still differ from the date
    sdf3 = spark.sql("SELECT TIMESTAMP '1995-03-15 01:00:00' AS d")
    n, schema_ok, values_ok, detail = compare_key(
        sdf3, con, "SELECT DATE '1995-03-15' AS d"
    )
    assert not values_ok


def test_empty_vs_typed_column_warns_without_failing_the_klass_gate():
    """An all-NULL object column against a typed side must NOT fail
    the dtype-class gate (legitimate for empty/all-NULL keys) but
    must surface a <empty:col> warning entry instead of passing
    silently (ADVICE r11). Both-sides-NULL columns of the same class
    stay warning-free."""
    import numpy as np
    import pandas as pd

    from tools.parity_drive import compare_frames

    spdf = pd.DataFrame({"k": [1], "v": pd.Series([None], dtype=object)})
    dpdf = pd.DataFrame({"k": [1], "v": pd.Series([np.nan], dtype="float64")})
    schema_ok, klass_ok, values_ok, detail = compare_frames(spdf, dpdf)
    assert schema_ok and klass_ok
    assert any(str(c).startswith("<empty:") for c, _, _ in detail)
    # same-class all-NULL pair: clean, no warning
    both = pd.DataFrame({"k": [1], "v": pd.Series([None], dtype=object)})
    schema_ok, klass_ok, values_ok, detail = compare_frames(both, both.copy())
    assert schema_ok and klass_ok and values_ok and not detail
