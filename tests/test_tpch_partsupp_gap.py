"""Pre-staged TPC-H q2/q9/q11/q20 — the four sweep queries blocked on
the `partsupp` table the driver testdata does not ship (VERDICT r10
"What's missing" #1). The SQL is written and oracle-paired NOW so the
gap is one fixture away: if a future testdata regeneration ships
`partsupp.parquet` (expected columns ps_partkey, ps_suppkey,
ps_availqty, ps_supplycost), these tests un-skip and run the full
Spark-vs-DuckDB compare; until then they skip with the gap named.

Adaptations to the shipped trimmed schemas (no p_mfgr, s_address,
s_phone, s_comment, n_comment): projections keep every column the
shipped tables carry; the join/agg/subquery SHAPE of each query is
unchanged. Double aggregates are ROUNDed on both sides; integer SUMs
are CAST to BIGINT (DuckDB HUGEINT -> pandas float64 otherwise —
the r10 hash-fail class).
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_DIR_ORACLE
from tests.oracle import compare_query, duck_connection

PARTSUPP = os.path.join(SF_DIR_ORACLE, "partsupp.parquet")
EXPECTED_COLS = {"ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost"}

pytestmark = pytest.mark.skipif(
    not os.path.exists(PARTSUPP),
    reason="partsupp.parquet not shipped in driver testdata — q2/q9/q11/q20 "
    "blocked on the fixture, SQL pre-staged (VERDICT r10 missing #1)",
)


@pytest.fixture(scope="module")
def duck_ps(sf_dir):
    con = duck_connection(SF_DIR_ORACLE)
    con.sql(
        f"CREATE OR REPLACE VIEW partsupp AS SELECT * FROM read_parquet('{PARTSUPP}')"
    )
    cols = {r[0] for r in con.sql("DESCRIBE partsupp").fetchall()}
    if not EXPECTED_COLS <= cols:
        pytest.skip(f"partsupp shipped with unexpected columns {cols}")
    yield con
    con.close()


def _spark_with_views(spark):
    from machine_learning_algorithm_sparkml__spark.sources import load_table

    for t in ("region", "nation", "supplier", "part", "orders", "lineitem"):
        load_table(spark, SF_DIR_ORACLE, t).createOrReplaceTempView(t)
    spark.read.parquet(PARTSUPP).createOrReplaceTempView("partsupp")
    return spark


# q2: min-cost supplier per (part, region) — correlated min subquery.
# Broadcast region/nation/supplier (tiny dims), shuffle on partkey.
Q2 = """
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
           ROUND(ps.ps_supplycost, 2) AS supplycost
    FROM part p
    JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
          SELECT MIN(ps2.ps_supplycost)
          FROM partsupp ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
"""

# q9: product-type profit by nation and year.
Q9 = """
    SELECT n.n_name AS nation,
           YEAR(o.o_orderdate) AS o_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - ps.ps_supplycost * l.l_quantity), 2) AS sum_profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN partsupp ps ON ps.ps_suppkey = l.l_suppkey
                    AND ps.ps_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%green%'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
"""

# q11: important stock by nation — HAVING over a scalar subquery total.
Q11 = """
    SELECT ps.ps_partkey,
           ROUND(SUM(ps.ps_supplycost * ps.ps_availqty), 2) AS value
    FROM partsupp ps
    JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'GERMANY'
    GROUP BY ps.ps_partkey
    HAVING SUM(ps.ps_supplycost * ps.ps_availqty) > (
        SELECT SUM(ps2.ps_supplycost * ps2.ps_availqty) * 0.0001
        FROM partsupp ps2
        JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        WHERE n2.n_name = 'GERMANY'
    )
"""

# q20: suppliers whose availqty exceeds half the year's shipments.
Q20 = """
    SELECT s.s_name, CAST(s.s_suppkey AS BIGINT) AS suppkey
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'CANADA'
      AND s.s_suppkey IN (
          SELECT ps.ps_suppkey FROM partsupp ps
          WHERE ps.ps_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'forest%'
          )
          AND ps.ps_availqty > (
              SELECT 0.5 * SUM(l.l_quantity)
              FROM lineitem l
              WHERE l.l_partkey = ps.ps_partkey
                AND l.l_suppkey = ps.ps_suppkey
                AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          )
      )
    ORDER BY s.s_name
"""


@pytest.mark.parametrize("name,sql", [("q2", Q2), ("q9", Q9), ("q11", Q11), ("q20", Q20)])
def test_partsupp_query_matches_oracle(spark, duck_ps, name, sql):
    _spark_with_views(spark)
    compare_query(
        spark, duck_ps, lambda sp, _sf: sp.sql(sql), sql, SF_DIR_ORACLE,
        name=f"sql_tpch_{name}",
    )
