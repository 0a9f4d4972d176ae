"""Standalone parity drive: replicate the driver's correctness gate
(and the verify skill's recipe) from a fresh plain SparkSession —
Spark result vs DuckDB oracle, sorted-by-column-name value compare.

Usage:
    python tools/parity_drive.py                # every oracle key, sf0.01
    python tools/parity_drive.py dedup_minhash sql_tpch_q17
    SPARK_GRAFT_DRIVE_SF_DIR=/root/testdata/sf0.001 python tools/parity_drive.py

Prints one `RESULT <key> <rows> <schema_ok> <values_ok>` line per key
and exits non-zero if any compare fails — grep RESULT, never trust
interleaved stdout (console progress bars eat lines; see the verify
skill's gotchas).

The driver's hash is DTYPE-SENSITIVE: it canonicalizes both sides
through pandas before hashing, so a DuckDB HUGEINT (what DuckDB's
integer SUM returns) lands as float64 while Spark's SUM lands as
int64, and the hashes split even though every value is equal
(r10 verdict: sql_tpch_q12 / sql_collation_ci / agg_incremental_merge
all failed exactly this way while the value-based local drive read
green). So this drive now models the same path: Spark via
`toPandas()`, DuckDB via `.df()`, and each column's canonical dtype
CLASS (int / float / decimal / str / datetime / bool / array) must
match between the sides before values are even compared. A
value-equal-but-class-split column is a FAIL here because it is a
hash fail there.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _klass(series):
    """Canonical dtype class of a pandas Series after the driver's
    pandas canonicalization. Width is deliberately ignored (int32 vs
    int64 hash identically once values are python ints); CLASS is not
    (238 vs 238.0 do not)."""
    import decimal

    import pandas as pd

    dt = series.dtype
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    for v in series:
        if v is None:
            continue
        if isinstance(v, float):
            if v != v:
                continue
            return "float"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if hasattr(v, "isoformat"):
            return "datetime"
        if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
            return "array"
        return type(v).__name__
    # all-NULL: only an OBJECT column is truly class-less; any other
    # dtype still carries its class through pandas (ADVICE r11 — an
    # all-NaT timedelta64 column must not degrade to 'empty').
    # Float/int/bool/datetime kinds never reach here — the dtype
    # checks at the top of the function already classed them (an
    # all-NaN float64 IS float dtype) — so the only kind needing a
    # class name is 'm' (timedelta64, which has no is_* check above);
    # anything else (category, period, ...) reports its dtype string
    # so a class split stays visible rather than collapsing to
    # 'empty'.
    if dt != object:
        return {"m": "timedelta"}.get(getattr(dt, "kind", "?"), str(dt))
    return "empty"


def _norm(v):
    """Value normalization INSIDE an already-class-matched column:
    floats rounded to 9 places, decimals floated (class compare has
    already flagged any decimal-vs-float split), arrays recursed,
    timestamps to isoformat."""
    import decimal

    import numpy as np

    if v is None:
        return None
    if isinstance(v, float):
        if v != v:
            return "nan"
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        return round(float(v), 9)
    if isinstance(v, np.generic):
        return _norm(v.item())
    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        # date == midnight-datetime across the sides: Spark DATE lands
        # as object(datetime.date) while DuckDB DATE lands as
        # datetime64[us] midnight, and the driver hash-passed every
        # date-output key (sql_tpch_q3/q18, retention_cohort, ...) —
        # so the canonical form strips an exact-midnight time.
        # KNOWN COARSENESS (ADVICE r11): a genuine midnight TIMESTAMP
        # column therefore compares equal to a DATE oracle column.
        # That equivalence matches the observed driver hash (r11
        # evidence above); tests/test_parity_drive.py pins both the
        # equivalence and this rationale so the trade is revisited if
        # the driver ever starts splitting date vs midnight-timestamp.
        s = v.isoformat()
        if s.endswith("T00:00:00"):
            return s[: -len("T00:00:00")]
        return s
    return v


def compare_frames(spdf, dpdf):
    """Driver-model compare of two pandas frames (spark side, duck
    side). Returns (schema_ok, klass_ok, values_ok, detail): detail
    holds per-column class splits as (col, spark_class, duck_class)
    and, on a value mismatch, one ("<row>", spark_row, duck_row)
    entry with the first differing normalized row — computed HERE so
    no caller re-implements the normalize-sort pipeline and drifts."""
    scols, dcols = sorted(spdf.columns), sorted(dpdf.columns)
    schema_ok = scols == dcols
    if not schema_ok:
        return False, False, False, [("<schema>", scols, dcols)]
    detail = []
    warnings = []
    for c in scols:
        ks, kd = _klass(spdf[c]), _klass(dpdf[c])
        if ks == kd:
            continue
        if "empty" in (ks, kd):
            # an all-NULL object column on one side cannot be classed
            # from values; the driver's dtype-sensitive hash COULD
            # still split such a pair (ADVICE r11) — surface it as a
            # warning line instead of silently passing, without
            # failing the compare (0-row / all-NULL frames are
            # legitimate for several keys)
            warnings.append((f"<empty:{c}>", ks, kd))
        else:
            detail.append((c, ks, kd))
    klass_ok = not detail
    detail.extend(warnings)
    srows = sorted(
        (tuple(_norm(v) for v in row) for row in spdf[scols].itertuples(index=False)),
        key=repr,
    )
    drows = sorted(
        (tuple(_norm(v) for v in row) for row in dpdf[dcols].itertuples(index=False)),
        key=repr,
    )
    values_ok = srows == drows
    if not values_ok:
        for a, b in zip(srows, drows):
            if a != b:
                detail.append(("<row>", a, b))
                break
        else:
            detail.append(("<rows>", len(srows), len(drows)))
    return schema_ok, klass_ok, values_ok, detail


def compare_key(sdf, con, sql):
    """Run one key's Spark DataFrame vs its DuckDB oracle SQL through
    the driver-model compare. Returns (n_rows, schema_ok, values_ok,
    detail); values_ok is False on a dtype-class split even when every
    value matches, because the driver's hash would split too."""
    spdf = sdf.toPandas()
    dpdf = con.sql(sql).df()
    schema_ok, klass_ok, veq, detail = compare_frames(spdf, dpdf)
    return len(spdf), schema_ok, klass_ok and veq, detail


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_DRIVE_SF_DIR", "/root/testdata/sf0.01")
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    keys = sys.argv[1:] or sorted(osql)
    unknown = [k for k in keys if k not in osql]
    if unknown:
        print(f"no oracle for: {unknown}", file=sys.stderr)
        return 2
    failed = 0
    for name in keys:
        sdf = qs[name](spark, sf_dir)
        n, schema_ok, values_ok, detail = compare_key(sdf, con, osql[name])
        failed += not (schema_ok and values_ok)
        for col, ks, kd in detail:
            col_s = str(col)
            if col_s.startswith("<empty:"):
                tag = "WARN"
            elif col_s.startswith("<"):
                tag = "DIFF"
            else:
                tag = "DTYPE"
            print(f"{tag} {name} {col} spark={ks} duck={kd}", flush=True)
        print("RESULT", name, n, schema_ok, values_ok, flush=True)
        spark.catalog.clearCache()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
