"""Local mirror of the driver's DuckDB oracle compare.

Runs a ``queries()`` entry on Spark and the paired ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count,
column names, and order-insensitive values. Floats compare with a
tight relative tolerance (the driver hashes exact values, so any
query relying on this tolerance for non-rounded arithmetic is flagged
by these tests before the driver sees it).
"""

from __future__ import annotations

import math

import duckdb

from machine_learning_algorithm_sparkml__spark.sources import TESTDATA_TABLES

_REL_TOL = 1e-12


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return value
    if hasattr(value, "isoformat"):  # datetime/date
        return value.isoformat()
    if isinstance(value, bytes):
        return value.hex()
    if isinstance(value, list):
        return tuple(_normalize(v) for v in value)
    return value


def _sorted_rows(columns, rows):
    """Sort columns by name, normalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(columns), sorted(out, key=repr)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=_REL_TOL, abs_tol=1e-12)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare_query(spark, con, query_fn, sql: str, sf_dir: str, name: str = "?") -> None:
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    drel = con.sql(sql)
    d_cols = list(drel.columns)
    d_rows = drel.fetchall()

    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sc, sr = _sorted_rows(s_cols, s_rows)
    dc, dr = _sorted_rows(d_cols, d_rows)
    assert sc == dc, f"{name}: columns spark={sc} duckdb={dc}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        assert _values_equal(a, b), f"{name}: row {i} differs:\n spark={a}\n duck ={b}"
