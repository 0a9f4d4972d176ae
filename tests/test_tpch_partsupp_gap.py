"""TPC-H q2/q9/q11/q20 — formerly blocked on the `partsupp` table the
driver testdata does not ship (VERDICT r10 missing #1). Round 12
unblocked the quartet by SYNTHESIZING partsupp deterministically from
part x supplier in both engines (workload/relational.synth_partsupp +
the `_PARTSUPP_DUCK` oracle CTE): dbgen's 4-suppliers-per-part modular
spread, portable-md5 availqty and integer-cents supplycost.

Spark-vs-DuckDB value parity for the four queries is covered by
tests/test_oracle_parity.py (they are ordinary oracle keys now). This
file pins the SYNTHESIS invariants the queries' semantics depend on,
plus an engine-neutrality replay of the seeded columns in pure Python
(the DuckDB-replayability claim, checked without DuckDB).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.sources import load_table
from machine_learning_algorithm_sparkml__spark.workload.relational import synth_partsupp
from tests.conftest import SF_DIR_ORACLE


def test_partsupp_distinct_suppliers_per_part(spark, sf_dir):
    """(ps_partkey, ps_suppkey) is a primary key; per-part supplier
    counts equal the dbgen spread's true image size (always 4 at
    dbgen-realistic S; the S=10 sf0.001 fixture collides for stride
    multiples of S/2 and the expansion must dedupe, not duplicate)."""
    ps = synth_partsupp(spark, sf_dir).cache()
    n_parts = load_table(spark, sf_dir, "part").count()
    s_cnt = load_table(spark, sf_dir, "supplier").count()
    step = s_cnt // 4

    def expected_n(p):
        # int() truncates toward zero like Spark DIV and DuckDB //
        # (partkeys start at 0, so p-1 can be negative)
        return len({(p + i * (step + int((p - 1) / s_cnt))) % s_cnt + 1 for i in range(4)})

    per_part = {
        r.ps_partkey: (r.n_supp, r.lo, r.hi)
        for r in ps.groupBy("ps_partkey")
        .agg(
            F.countDistinct("ps_suppkey").alias("n_supp"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ps_suppkey").alias("lo"),
            F.max("ps_suppkey").alias("hi"),
        )
        .withColumn("pk_ok", F.col("n_supp") == F.col("n_rows"))
        .collect()
    }
    assert len(per_part) == n_parts
    for p, (n_supp, lo, hi) in per_part.items():
        assert n_supp == expected_n(p), p
        assert 1 <= lo and hi <= s_cnt, p
    # the primary key holds: no (part, supplier) pair twice
    assert ps.count() == ps.select("ps_partkey", "ps_suppkey").distinct().count()
    ps.unpersist()


def test_partsupp_always_four_at_dbgen_realistic_scale(spark):
    """At the oracle SF (S=100, stride in [25,44] — never 0 or S/2 mod
    S) every part must have exactly 4 distinct suppliers, matching
    dbgen's guarantee at its own scales."""
    ps = synth_partsupp(spark, SF_DIR_ORACLE)
    bad = (
        ps.groupBy("ps_partkey")
        .agg(F.countDistinct("ps_suppkey").alias("n"))
        .filter(F.col("n") != 4)
        .count()
    )
    assert bad == 0


def test_partsupp_seeded_columns_replay_in_pure_python(spark, sf_dir):
    """availqty/supplycost_cents must equal an independent md5 replay
    — the engine-neutral arithmetic the DuckDB CTE relies on."""
    rows = synth_partsupp(spark, sf_dir).filter(F.col("ps_partkey") <= 3).collect()
    assert rows
    s_cnt = load_table(spark, sf_dir, "supplier").count()
    step = s_cnt // 4
    for r in rows:
        # suppkey must come from the dbgen spread for this part
        spread = {
            (r.ps_partkey + i * (step + int((r.ps_partkey - 1) / s_cnt))) % s_cnt + 1
            for i in range(4)
        }
        assert r.ps_suppkey in spread
        aq = int(hashlib.md5(f"aq:{r.ps_partkey}:{r.ps_suppkey}".encode()).hexdigest()[:15], 16) % 9999 + 1
        sc = int(hashlib.md5(f"sc:{r.ps_partkey}:{r.ps_suppkey}".encode()).hexdigest()[:15], 16) % 99901 + 100
        assert r.ps_availqty == aq
        assert r.ps_supplycost_cents == sc
        assert 1 <= r.ps_availqty <= 9999
        assert 100 <= r.ps_supplycost_cents <= 100000


def test_partsupp_quartet_nonempty_at_oracle_sf(spark):
    """Dataset-strength guard: at the oracle SF every quartet key must
    return rows (an all-empty compare certifies nothing). q11's HAVING
    keeps ~half the NATION_7 parts; q20 is naturally thin (3 suppliers
    in NATION_3) but must not be empty."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_sql_tpch_q2,
        q_sql_tpch_q9,
        q_sql_tpch_q11,
        q_sql_tpch_q20,
    )

    for fn in (q_sql_tpch_q2, q_sql_tpch_q9, q_sql_tpch_q11, q_sql_tpch_q20):
        assert fn(spark, SF_DIR_ORACLE).count() > 0, fn.__name__
