"""Local mirror of the driver's DuckDB oracle compare.

Runs a ``queries()`` entry on Spark and the paired ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count,
column names, per-column canonical dtype CLASS, and order-insensitive
values — via the SAME ``compare_frames`` the standalone drive
(tools/parity_drive.py) uses, so the pytest gate and the drive cannot
diverge (including the failure diagnostics: the first differing
normalized row comes back in compare_frames' detail, not from a
re-implementation here). Both sides canonicalize through pandas
(Spark ``toPandas``, DuckDB ``.df()``) because the DRIVER does: r10
lesson — DuckDB integer SUM returns HUGEINT which pandas floats to
float64 while Spark SUM emits int64, a split any value-based
collect/fetchall compare is structurally blind to.
"""

from __future__ import annotations

import duckdb

from machine_learning_algorithm_sparkml__spark.sources import TESTDATA_TABLES
from tools.parity_drive import compare_frames


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_query(spark, con, query_fn, sql: str, sf_dir: str, name: str = "?") -> None:
    spdf = query_fn(spark, sf_dir).toPandas()
    dpdf = con.sql(sql).df()
    assert len(spdf) == len(dpdf), (
        f"{name}: row count spark={len(spdf)} duckdb={len(dpdf)}"
    )
    schema_ok, klass_ok, values_ok, detail = compare_frames(spdf, dpdf)
    assert schema_ok, (
        f"{name}: columns spark={sorted(spdf.columns)} duckdb={sorted(dpdf.columns)}"
    )
    klass_splits = [d for d in detail if not str(d[0]).startswith("<")]
    assert klass_ok, (
        f"{name}: dtype-class split (driver hash would fail): "
        + ", ".join(f"{c}: spark={ks} duck={kd}" for c, ks, kd in klass_splits)
    )
    row_diffs = [d for d in detail if str(d[0]).startswith("<")]
    assert values_ok, f"{name}: values differ: {row_diffs}"
