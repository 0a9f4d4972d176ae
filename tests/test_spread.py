"""operators/spread.spread_rows — the r16 scale-adaptive input spread.

Contract under test:
- a small scan spreads to defaultParallelism hash partitions;
- the guard no-ops when the estimate says the scan is already wide
  enough (bytes_per_slot tiny => threshold crossed);
- the exchange never changes row values (pure relayout), so oracle
  hashes cannot move;
- the estimate survives broadcast-join inflation (min with leaf sum —
  the covid-frame case measured at ~1e15 plan bytes vs ~3 MB of
  leaves);
- the ``n`` override caps the partition count (the CrossValidator
  concurrent-fits case).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.operators.spread import (
    _estimated_bytes,
    spread_rows,
)
from machine_learning_algorithm_sparkml__spark.sources import load_table


def test_spread_fires_on_small_scan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    spread = spread_rows(docs, "doc_id")
    assert spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    plan = spread._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan and "hashpartitioning(doc_id" in plan, plan


def test_spread_noops_when_scan_wide_enough(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    same = spread_rows(docs, "doc_id", bytes_per_slot=1)
    assert same is docs  # guard short-circuits, no exchange added


def test_spread_preserves_values(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = {(r.doc_id, r.text) for r in docs.collect()}
    spread = {(r.doc_id, r.text) for r in spread_rows(docs, "doc_id").collect()}
    assert base == spread


def test_estimate_survives_broadcast_join_inflation(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"]
    )
    est = _estimated_bytes(joined)
    # leaf sum caps the join-multiplied plan estimate: both files
    # together are under ~4 MB at any test SF
    assert est < 64 << 20, est
    assert spread_rows(joined, "o_orderkey").rdd.getNumPartitions() == (
        spark.sparkContext.defaultParallelism
    )


def test_spread_n_override_caps_partitions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assert spread_rows(docs, "doc_id", n=4).rdd.getNumPartitions() == 4


def test_spread_keyless_round_robin_fallback(spark, sf_dir):
    # ADVICE r16 #1: with no high-cardinality key available, by=None
    # round-robins instead of hashing an arbitrary (possibly
    # low-cardinality) column — every partition gets rows
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    spread = spread_rows(docs, None)
    n = spark.sparkContext.defaultParallelism
    assert spread.rdd.getNumPartitions() == n
    sizes = spread.rdd.glom().map(len).collect()
    assert min(sizes) > 0  # a 4-value hash key would leave most empty
    assert sorted(r.lang for r in spread.collect()) == sorted(
        r.lang for r in docs.collect()
    )
