"""Semantics tests that the testdata can't exercise directly
(no nulls in the driver tables) plus sampling/split invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.operators import (
    dropna_rows,
    sample_fraction,
    seeded_random_split,
    union_all,
)
from machine_learning_algorithm_sparkml__spark.sources import load_table


def test_dropna_drops_any_null_row(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c"), (None, None)],
        "id int, name string",
    )
    assert dropna_rows(df).count() == 1
    assert dropna_rows(df, subset=["id"]).count() == 2


def test_union_all_keeps_duplicates(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    assert union_all(df, df, df).count() == 6


def test_sample_fraction_seeded_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sample_fraction(docs, 0.5, seed=754).count()
    b = sample_fraction(docs, 0.5, seed=754).count()
    assert a == b
    total = docs.count()
    assert 0.3 * total < a < 0.7 * total


def test_random_split_partitions_whole_frame(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").cache()
    total = orders.count()
    train, test = seeded_random_split(orders, (0.8, 0.2), seed=754)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == total
    assert n_train > n_test
    # same seed => identical split membership
    train2, _ = seeded_random_split(orders, (0.8, 0.2), seed=754)
    assert train.exceptAll(train2).count() == 0
    orders.unpersist()


def test_flagship_one_winner_per_customer(spark, sf_dir):
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        flagship_top_order_per_customer,
    )

    df = flagship_top_order_per_customer(spark, sf_dir)
    assert df.filter(F.col("rnk") != 1).count() == 0
    dup = df.groupBy("o_custkey").count().filter(F.col("count") > 1)
    # unique tie-break on o_orderkey => at most one row per customer
    assert dup.count() == 0
