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
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v, side="spark"):
    """Model the driver's hash path per SIDE (r9 verdict: the only
    four hash-fails were the only four Spark DecimalType outputs).
    The driver canonicalizes through pandas: a DuckDB DECIMAL column
    lands as float64 (hashes like any double), while a SPARK decimal
    column lands as object(Decimal) and hash-mismatches even when
    value-equal. So: spark-side Decimals are tagged (never equal to
    anything the oracle produces — the gate that forces scaled-int
    outputs, pinned by test_output_schema_is_atomic); oracle-side
    Decimals are floated like the driver does."""
    import decimal

    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        if side == "spark":
            return ("dec", str(v))
        return round(float(v), 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


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
        scols = sorted(sdf.columns)
        srows = sorted(
            [tuple(_norm(r[c], "spark") for c in scols) for r in sdf.collect()],
            key=repr,
        )
        drel = con.sql(osql[name])
        idx = [list(drel.columns).index(c) for c in sorted(drel.columns)]
        drows = sorted(
            [tuple(_norm(r[i], "duck") for i in idx) for r in drel.fetchall()],
            key=repr,
        )
        schema_ok = scols == sorted(drel.columns)
        values_ok = srows == drows
        failed += not (schema_ok and values_ok)
        print("RESULT", name, len(srows), schema_ok, values_ok, flush=True)
        spark.catalog.clearCache()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
