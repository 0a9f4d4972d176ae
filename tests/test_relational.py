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


def test_hash_gate_sample_invariant_under_repartitioning(spark, sf_dir):
    """The portable sampler's defining property — the one Spark's RNG
    sample() lacks: membership is a pure function of the row key, so
    ANY physical layout yields the identical row set (at 100 TB an AQE
    coalesce or source re-split must not change which rows survive).
    Also: disjoint seeds gate independently (samples differ), and the
    realized rate sits near the nominal fraction."""
    from machine_learning_algorithm_sparkml__spark.operators.setops import (
        hash_gate_sample,
    )

    orders = load_table(spark, sf_dir, "orders")
    keys_a = {
        r.o_orderkey
        for r in hash_gate_sample(orders.repartition(3), "o_orderkey", 0.25).select("o_orderkey").collect()
    }
    keys_b = {
        r.o_orderkey
        for r in hash_gate_sample(orders.repartition(17), "o_orderkey", 0.25).select("o_orderkey").collect()
    }
    assert keys_a == keys_b
    total = orders.count()
    assert 0.2 * total < len(keys_a) < 0.3 * total
    keys_other_seed = {
        r.o_orderkey
        for r in hash_gate_sample(orders, "o_orderkey", 0.25, seed=99).select("o_orderkey").collect()
    }
    assert keys_other_seed != keys_a  # independent gate, not a threshold shift


def test_hash_gate_sample_by_rates_per_stratum(spark, sf_dir):
    from machine_learning_algorithm_sparkml__spark.operators.setops import (
        hash_gate_sample_by,
    )

    orders = load_table(spark, sf_dir, "orders").cache()
    fractions = {"F": 0.3, "O": 0.1, "P": 0.5}
    kept = hash_gate_sample_by(orders, "o_orderkey", "o_orderstatus", fractions)
    per_stratum = {r["o_orderstatus"]: r["n"] for r in kept.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    base = {r["o_orderstatus"]: r["n"] for r in orders.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    assert set(per_stratum) <= set(fractions)  # unlisted strata dropped
    for status, frac in fractions.items():
        rate = per_stratum.get(status, 0) / base[status]
        assert abs(rate - frac) < 0.1, (status, rate)
    orders.unpersist()


def test_hash_gate_split_partitions_exactly_and_portably(spark, sf_dir):
    """Every row gets exactly one label; 80/20 weights respected; the
    labeling is identical under a different partitioning (the
    train/test contamination failure mode of RNG randomSplit on a
    re-shuffled source cannot happen here)."""
    from machine_learning_algorithm_sparkml__spark.operators.setops import (
        hash_gate_split,
    )

    orders = load_table(spark, sf_dir, "orders").cache()
    total = orders.count()
    labeled = hash_gate_split(orders, "o_orderkey", (0.8, 0.2))
    counts = {r["split"]: r["n"] for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"s0", "s1"}
    assert sum(counts.values()) == total  # exact partition of the input
    assert abs(counts["s0"] / total - 0.8) < 0.05
    again = {
        (r.o_orderkey, r.split)
        for r in hash_gate_split(orders.repartition(11), "o_orderkey", (0.8, 0.2)).select("o_orderkey", "split").collect()
    }
    assert again == {(r.o_orderkey, r.split) for r in labeled.select("o_orderkey", "split").collect()}
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


def test_profile_table_counts(spark, sf_dir):
    from machine_learning_algorithm_sparkml__spark.sources import load_table
    from machine_learning_algorithm_sparkml__spark.workload.relational import q_profile_table

    orders = load_table(spark, sf_dir, "orders")
    rows = {r["column_name"]: r for r in q_profile_table(spark, sf_dir).collect()}
    n = orders.count()
    assert set(rows) == {"o_custkey", "o_orderstatus", "o_orderpriority"}
    for r in rows.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_nulls"] <= n
        assert 1 <= r["n_distinct"] <= n
        assert r["min_str"] <= r["max_str"]
    assert rows["o_orderstatus"]["n_distinct"] <= 3


def test_scd2_intervals_tile_each_user_timeline(spark, sf_dir):
    """Intervals are disjoint and ordered: each run's valid_to equals
    the next run's valid_from; exactly one open interval per user;
    n_events sums to the user's event count."""
    from pyspark.sql import functions as F
    from machine_learning_algorithm_sparkml__spark.sources import load_table
    from machine_learning_algorithm_sparkml__spark.workload.relational import q_scd2_intervals

    out = q_scd2_intervals(spark, sf_dir)
    # one open (valid_to IS NULL) interval per user
    open_counts = (
        out.filter(F.col("valid_to").isNull()).groupBy("user_id").count()
    )
    assert open_counts.filter(F.col("count") != 1).count() == 0
    # intervals never invert
    assert out.filter(F.col("valid_to") < F.col("valid_from")).count() == 0
    # event conservation
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == load_table(spark, sf_dir, "events").count()
    # consecutive runs change type
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("valid_from")
    consec = out.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    assert consec.filter(F.col("event_type") == F.col("prev_type")).count() == 0


def test_fuzzy_join_blocked_is_symmetric_free_and_verified(spark, sf_dir):
    """Each pair appears once (id_a < id_b), every emitted distance
    respects the threshold, and planted near-duplicate names in the
    same block are found while cross-block near-dups are (by design)
    not evaluated."""
    import os
    import tempfile

    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_fuzzy_join_blocked,
    )

    rows = [
        (1, "Customer#000000101"),
        (2, "Customer#000010101"),  # same blk '101', dist 1 -> found
        (3, "Customer#000000102"),  # blk '102': near-dup of 1 but other block
        (4, "Customer#000999101"),  # same blk '101', dist 3 -> rejected by verify
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string")
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
        out = q_fuzzy_join_blocked(spark, d).collect()
    pairs = {(r["id_a"], r["id_b"]): r["dist"] for r in out}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] == 1
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert 0 <= r["dist"] <= 2


def test_agg_decimal_exact_is_partitioning_invariant_and_matches_ledger(spark, sf_dir):
    """The decimal claim: the same frame summed under different
    physical partitionings yields the IDENTICAL decimal (double sums
    only promise this after rounding), and the result equals an
    exact driver-side Decimal ledger of the cast values."""
    from decimal import Decimal

    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_agg_decimal_exact,
    )

    base = {r.o_orderstatus: r.sum_price_cents for r in q_agg_decimal_exact(spark, sf_dir).collect()}

    orders = load_table(spark, sf_dir, "orders")
    for n in (1, 17):
        redo = {
            r.o_orderstatus: r.s
            for r in orders.repartition(n)
            .groupBy("o_orderstatus")
            .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
            .collect()
        }
        assert {k: int(v * 100) for k, v in redo.items()} == base, n

    ledger: dict[str, Decimal] = {}
    for r in orders.select("o_orderstatus", F.col("o_totalprice").cast("decimal(18,2)").alias("p")).collect():
        ledger[r.o_orderstatus] = ledger.get(r.o_orderstatus, Decimal(0)) + r.p
    assert {k: int(v * 100) for k, v in ledger.items()} == base


def test_cdc_diff_counts_and_roundtrip_apply(spark, sf_dir):
    """CDC correctness statement: the change set has exactly the
    planted insert/update/delete counts, and APPLYING it to the old
    snapshot reproduces the new snapshot exactly — diff and merge are
    inverses."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_cdc_snapshot_diff,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).cache()
    diff = q_cdc_snapshot_diff(spark, sf_dir).cache()
    mod = F.col("o_orderkey") % 10
    expected = {
        "insert": orders.filter(mod == 1).count(),
        "delete": orders.filter(mod == 3).count(),
        "update": orders.filter(mod == 7).count(),
    }
    got = {r.change_type: r.n for r in diff.groupBy("change_type").agg(F.count("*").alias("n")).collect()}
    assert got == expected

    # apply: drop deleted/updated keys, add back new values of
    # updates + inserts
    dead = diff.filter(F.col("change_type").isin("delete", "update")).select("o_orderkey")
    incoming = diff.filter(F.col("change_type").isin("insert", "update")).select(
        "o_orderkey",
        F.col("new_o_orderstatus").alias("o_orderstatus"),
        F.col("new_o_totalprice").alias("o_totalprice"),
    )
    applied = orders.join(dead, "o_orderkey", "left_anti").unionByName(incoming)
    new = (
        orders.filter(mod != 3)
        .withColumn(
            "o_totalprice",
            F.when(mod == 7, F.col("o_totalprice") + 1000.0).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.filter(mod == 1).select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_orderstatus", "o_totalprice",
            )
        )
    )
    assert applied.exceptAll(new).count() == 0
    assert new.exceptAll(applied).count() == 0
    diff.unpersist(); orders.unpersist()


def test_cdc_diff_null_safe_comparison(spark):
    """A NULL-to-value transition is an UPDATE (eqNullSafe), never a
    silent match; identical rows including NULLs produce no change."""
    from machine_learning_algorithm_sparkml__spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None)], "id long, v string"
    )
    new = spark.createDataFrame(
        [(1, "now_set"), (2, "x"), (3, None)], "id long, v string"
    )
    rows = {r.id: r.change_type for r in snapshot_diff(old, new, ["id"], ["v"]).collect()}
    assert rows == {1: "update"}  # 2 unchanged, 3 NULL==NULL unchanged


def test_cdc_soft_delete_composite_key_semantics(spark):
    """Soft-delete contract on a composite key: a tombstoned row is
    ABSENT from its snapshot — live->tombstone is a delete,
    tombstone->live a resurrection insert, tombstoned-in-both (and a
    tombstone whose payload churns) is a no-op; a NULL flag means
    live. The flag column never appears in the output."""
    from machine_learning_algorithm_sparkml__spark.operators.cdc import snapshot_diff

    schema = "k1 long, k2 int, v double, is_deleted boolean"
    old = spark.createDataFrame(
        [
            (1, 1, 10.0, False),   # stays live, value changes -> update
            (1, 2, 20.0, False),   # live -> tombstoned        -> delete
            (2, 1, 30.0, True),    # tombstoned -> live        -> insert
            (2, 2, 40.0, True),    # tombstoned in both        -> no-op
            (3, 1, 50.0, None),    # NULL flag = live, unchanged -> no-op
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            (1, 1, 11.0, False),
            (1, 2, 20.0, True),
            (2, 1, 30.0, False),
            (2, 2, 99.0, True),    # payload churn on a tombstone: still no-op
            (3, 1, 50.0, None),
            (4, 1, 60.0, False),   # brand-new live row        -> insert
        ],
        schema,
    )
    diff = snapshot_diff(old, new, ["k1", "k2"], ["v"], soft_delete_col="is_deleted")
    assert "is_deleted" not in diff.columns
    got = {(r.k1, r.k2): r.change_type for r in diff.collect()}
    assert got == {
        (1, 1): "update",
        (1, 2): "delete",
        (2, 1): "insert",
        (4, 1): "insert",
    }
    resurrected = {r.k1: (r.old_v, r.new_v) for r in diff.collect() if r.change_type == "insert" and r.k1 == 2}
    assert resurrected == {2: (None, 30.0)}  # old side filtered, not joined


def test_dq_audit_detects_planted_violations(spark):
    """The audit's detection logic on planted defects: one orphaned
    child row and one duplicated parent key must be counted exactly,
    and a clean pair must audit to zero violations."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_dq_referential_integrity,  # noqa: F401  (registry import guard)
    )

    parent = spark.createDataFrame([(1,), (2,), (2,), (3,)], "pk long")
    child = spark.createDataFrame([(1, 1), (2, 2), (3, 9)], "id long, fk long")
    orphans = child.join(
        F.broadcast(parent.select("pk").distinct()),
        child["fk"] == parent["pk"],
        "left_anti",
    )
    assert orphans.count() == 1 and orphans.collect()[0].fk == 9
    dup = parent.agg((F.count("pk") - F.countDistinct("pk")).alias("v")).collect()[0].v
    assert dup == 1
    clean = child.filter(F.col("fk") != 9)
    assert clean.join(F.broadcast(parent.select("pk").distinct()), clean["fk"] == parent["pk"], "left_anti").count() == 0


def test_incremental_merge_equals_full_rescan_exactly(spark, sf_dir):
    """The maintenance algebra: merging the delta's partials into the
    history rollup equals the from-scratch aggregate to the CENT
    (decimal state — no rounding anywhere), and both sides of the
    split are non-empty so the merge is genuinely exercised."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_agg_incremental_merge,
    )

    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-07-01").cast("timestamp")
    assert orders.filter(F.col("o_orderdate") < cutoff).count() > 0
    assert orders.filter(F.col("o_orderdate") >= cutoff).count() > 0

    merged = {
        (r.yr, r.mo, r.o_orderstatus): (r.n_orders, r.sum_price_cents)
        for r in q_agg_incremental_merge(spark, sf_dir).collect()
    }
    scratch = {
        (r.yr, r.mo, r.o_orderstatus): (r.n_orders, r.sum_price_cents)
        for r in orders.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("sum_price_cents"),
        )
        .collect()
    }
    assert merged == scratch


def test_try_funcs_vs_ansi_throwing_forms(spark, sf_dir):
    """The claim behind scalar_try_funcs: under Spark 4's default
    ANSI mode the UNSAFE forms really do kill the job on the same
    data (bigint overflow, malformed cast), while the try_ forms
    return exactly one NULL per planted error row — errors become
    quarantinable data."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    for unsafe in (
        "SELECT o_orderkey * 9223372036854775807L FROM orders WHERE o_orderkey > 1",
        "SELECT CAST(o_orderstatus AS INT) FROM orders",
    ):
        with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception)):
            spark.sql(unsafe).collect()

    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_scalar_try_funcs,
    )

    df = q_scalar_try_funcs(spark, sf_dir).cache()
    n = df.count()
    assert df.filter(F.col("safe_ratio").isNull()).count() == df.filter(F.col("o_orderkey") % 5 == 0).count()
    assert df.filter(F.col("overflow_guard").isNull()).count() == df.filter(F.col("o_orderkey") % 100 == 7).count()
    assert df.filter(F.col("parsed_int").isNull()).count() == df.filter(F.col("o_orderkey") % 100 == 13).count()
    assert df.filter(F.col("missing_part").isNotNull()).count() == 0
    assert n == load_table(spark, sf_dir, "orders").count()  # no row lost to an error
    df.unpersist()


def test_session_variables_rebind_changes_result(spark, sf_dir):
    """Session-variable semantics: the same EXECUTE IMMEDIATE text
    re-runs under a new SET VAR binding and returns the other
    parameterization's answer; the workload key is idempotent in a
    shared session (DECLARE OR REPLACE)."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_sql_session_variables,
    )

    first = {r.c_nationkey: r.n_orders for r in q_sql_session_variables(spark, sf_dir).collect()}
    again = {r.c_nationkey: r.n_orders for r in q_sql_session_variables(spark, sf_dir).collect()}
    assert first == again  # idempotent re-declare + re-bind

    spark.sql("SET VAR mla_cut = 0.0")
    stmt = """
        EXECUTE IMMEDIATE
        'SELECT COUNT(*) AS n FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = ? AND o_totalprice > ?'
        USING mla_seg, mla_cut
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    loose = spark.sql(stmt).collect()[0].n
    assert loose > sum(first.values())  # threshold 0 admits strictly more


def test_recursive_cte_resolves_digit_tree_exactly(spark, sf_dir):
    """WITH RECURSIVE semantics: over the dense orderkey space every
    order is reachable from a single-digit root, its depth is exactly
    its digit count - 1, and its root is its leading digit — the
    closed form of the recursion, computed per row in Python."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_sql_recursive_cte,
    )

    rows = q_sql_recursive_cte(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert len(rows) == n_orders  # dense keys: the whole table resolves
    for r in rows:
        s = str(r.o_orderkey)
        assert r.depth == len(s) - 1, r
        assert r.root_key == int(s[0]), r


def test_cdc_soft_delete_key_counts(spark, sf_dir):
    """The workload key's planted mutation classes land in the right
    buckets: mod 9 = resurrection inserts, mod 3 tombstone + mod 5
    hard delete = deletes, mod 7 = updates; nothing else changes."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_cdc_soft_delete,
    )

    base = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("mod", (F.col("l_orderkey") + F.col("l_linenumber")) % 10)
    ).cache()
    by_mod = {r["mod"]: r["c"] for r in base.groupBy("mod").agg(F.count(F.lit(1)).alias("c")).collect()}
    diff = q_cdc_soft_delete(spark, sf_dir)
    got = {r.change_type: r.n for r in diff.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {
        "insert": by_mod.get(9, 0),
        "delete": by_mod.get(3, 0) + by_mod.get(5, 0),
        "update": by_mod.get(7, 0),
    }
    base.unpersist()


def test_incremental_retract_equals_corrected_rescan(spark, sf_dir):
    """The retraction algebra: history partials + signed deltas
    re-aggregated must equal the from-scratch aggregate over the
    CORRECTED table exactly (decimal state, group-inverse law), and
    the planted corrections are non-vacuous: repricing touches rows,
    and the status correction MOVES rows between groups (the case a
    plain upsert of new values under old groups gets wrong)."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_agg_incremental_retract,
    )

    orders = load_table(spark, sf_dir, "orders")
    mod = F.col("o_orderkey") % 50
    assert orders.filter(mod == 7).count() > 0
    moved = orders.filter((mod == 23) & (F.col("o_orderstatus") != "F")).count()
    assert moved > 0  # group-moving corrections genuinely exercised

    corrected = orders.select(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.when(mod == 23, F.lit("F")).otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.when(mod == 7, F.col("o_totalprice") + 1000.0)
        .otherwise(F.col("o_totalprice"))
        .cast("decimal(18,2)")
        .alias("p"),
    )
    scratch = {
        (r.yr, r.mo, r.o_orderstatus): (r.n_orders, r.sum_price_cents)
        for r in corrected.groupBy("yr", "mo", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("p") * 100).cast("bigint").alias("sum_price_cents"),
        )
        .collect()
    }
    merged = {
        (r.yr, r.mo, r.o_orderstatus): (r.n_orders, r.sum_price_cents)
        for r in q_agg_incremental_retract(spark, sf_dir).collect()
    }
    assert merged == scratch


def test_dq_expectations_detects_the_planted_violation(spark, sf_dir):
    """The declarative gate must DETECT: exactly one expectation (the
    max-price ceiling set below the corpus max by design) fails, the
    other five pass, and the measured metrics tie back to direct
    aggregates."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_dq_expectations,
    )

    rows = {r.check_name: r for r in q_dq_expectations(spark, sf_dir).collect()}
    assert len(rows) == 6
    failed = {n for n, r in rows.items() if not r.passed}
    assert failed == {"max:o_totalprice"}

    orders = load_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("o_totalprice").alias("mx"),
        F.min("o_totalprice").alias("mn"),
    ).collect()[0]
    assert rows["row_count:orders"].metric == float(agg.n)
    assert rows["max:o_totalprice"].metric == agg.mx
    assert rows["min:o_totalprice"].metric == agg.mn
    assert rows["null_rate:o_custkey"].metric == 0.0
    assert rows["domain_rate:o_orderstatus"].metric == 1.0


def test_recursive_cte_bounded_guard_is_load_bearing(spark, sf_dir):
    """The cyclic-graph walk: the depth guard is the ONLY terminator —
    a meaningful fraction of walks revisit a node within the bound
    (cycles genuinely in range, so a guard-free traversal diverges),
    every walk stops exactly at the bound when its successor chain
    survives, and depth never exceeds it."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_sql_recursive_cte_bounded,
    )

    walk = q_sql_recursive_cte_bounded(spark, sf_dir).cache()
    try:
        assert walk.agg(F.max("depth")).collect()[0][0] == 5
        revisits = (
            walk.groupBy("start_k", "node")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        assert revisits > 0  # cycles exist inside the bound
        n_nodes = (
            load_table(spark, sf_dir, "orders")
            .select((F.col("o_orderkey") % 1000).alias("k"))
            .distinct()
            .count()
        )
        # every node starts a walk, and no walk exceeds 6 rows
        assert walk.select("start_k").distinct().count() == n_nodes
        per_walk = walk.groupBy("start_k").agg(F.count(F.lit(1)).alias("n"))
        assert per_walk.agg(F.max("n")).collect()[0][0] <= 6
    finally:
        walk.unpersist()


def test_lateral_agg_keeps_zero_order_customers(spark, sf_dir):
    """The scalar-aggregate LATERAL is an implicit outer join: every
    customer appears exactly once, customers with no open orders carry
    COUNT 0 and a COALESCEd 0.0 total, and the non-zero rows tie back
    to a direct grouped aggregate."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_sql_lateral_agg,
    )

    out = q_sql_lateral_agg(spark, sf_dir).cache()
    try:
        n_cust = load_table(spark, sf_dir, "customer").count()
        assert out.count() == n_cust
        zeros = out.filter(F.col("n_open") == 0)
        assert zeros.count() > 0
        assert zeros.filter(F.col("open_total") != 0.0).count() == 0
        direct = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderstatus") == "O")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n_open"))
        )
        got = {r.c_custkey: r.n_open for r in out.filter(F.col("n_open") > 0).collect()}
        want = {r.o_custkey: r.n_open for r in direct.collect()}
        assert got == want
    finally:
        out.unpersist()


def test_scan_xml_roundtrip_exact_and_schema_paths_agree(spark, sf_dir):
    """The XML round-trip is lossless (keys, statuses, and doubles
    byte-exact vs the source — the writer emits shortest-repr text),
    and the explicit-schema read (the 100 TB path: inference is a full
    extra parse of every file) equals the inferred-schema read."""
    from machine_learning_algorithm_sparkml__spark.sources import scratch_sink_path
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_scan_xml,
    )

    back = q_scan_xml(spark, sf_dir)
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    got = {(r.o_orderkey, r.o_orderstatus, r.o_totalprice) for r in back.collect()}
    want = {(r.o_orderkey, r.o_orderstatus, r.o_totalprice) for r in src.collect()}
    assert got == want

    inferred = (
        spark.read.format("xml")
        .option("rowTag", "order")
        .load(scratch_sink_path(sf_dir, "orders_xml"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    assert {tuple(r) for r in inferred.collect()} == want


def test_collation_unicode_ci_folds_canonical_equivalence(spark, sf_dir):
    """The non-ASCII collation key exists BECAUSE lower()-grouping and
    ICU UNICODE_CI disagree off-ASCII (r10 verdict): the decomposed
    e+combining-acute must land in the precomposed e-acute group under
    UNICODE_CI, while a naive lower()-only grouping strands it. Both
    halves are pinned here so a fixture change that re-ASCIIfies the
    domain (or an editor that NFC-composes the source literal) fails
    loudly instead of silently weakening the key."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        _COLLATION_UNICODE_MIXED,
        q_sql_collation_unicode,
    )

    # the fixture really contains the decomposed byte form
    assert "e\u0301" in _COLLATION_UNICODE_MIXED  # decomposed e + combining acute
    assert "\u00e9" in _COLLATION_UNICODE_MIXED  # precomposed e-acute

    rows = {r["status_rep"]: r for r in q_sql_collation_unicode(spark, sf_dir).collect()}
    # 5 ICU groups; the e-acute family's byte-min rep IS the decomposed
    # form (0x65... < 0xc3...) and carries all three byte variants
    assert len(rows) == 5
    assert "e\u0301" in rows and rows["e\u0301"]["n_byte_forms"] == 3
    assert rows["\u00df"]["n_byte_forms"] == 2  # ß + capital sharp s
    assert rows["\u0131"]["n_byte_forms"] == 1  # dotless-i stays alone

    # naive lower()-only grouping diverges: 6 groups, decomposed stranded
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    naive = spark.sql(
        _COLLATION_UNICODE_MIXED
        + "SELECT lower(st) AS g, COUNT(DISTINCT st) AS n FROM mixed GROUP BY lower(st)"
    ).collect()
    assert len(naive) == 6
    naive_map = {r["g"]: r["n"] for r in naive}
    assert naive_map["e\u0301"] == 1  # stranded: lower() can't compose it


def test_collation_ci_domain_is_ascii_only(spark, sf_dir):
    """sql_collation_ci's oracle is lower()-grouping, which equals
    UNICODE_CI ONLY on an ASCII domain (ADVICE r10 #3) — the
    non-ASCII semantics live in sql_collation_unicode. If the
    o_orderstatus fixture ever grows a non-ASCII value, this reds
    before the oracle silently diverges from ICU case folding."""
    vals = [
        r[0]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderstatus").distinct().collect()
    ]
    assert vals
    assert all(v is not None and v.isascii() for v in vals), vals


def test_sql_scripting_while_matches_driver_replay(spark, sf_dir):
    """The scripting WHILE loop's fixpoint must equal a driver-side
    replay of the same doubling sweep (loop semantics: condition
    checked before each doubling, iters counts completed doublings),
    and the IF/ELSE band must follow iters. Also idempotent — the
    script re-runs in a shared session without state bleed."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_sql_scripting_while,
    )

    row = q_sql_scripting_while(spark, sf_dir).collect()[0]
    again = q_sql_scripting_while(spark, sf_dir).collect()[0]
    assert row == again

    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    n_total = orders.count()
    t, iters = 1000.0, 0
    n_above = orders.filter(F.col("o_totalprice") > t).count()
    while n_above * 20 > n_total:
        t, iters = t * 2, iters + 1
        n_above = orders.filter(F.col("o_totalprice") > t).count()
    assert (row.threshold, row.iters, row.n_above, row.n_total) == (t, iters, n_above, n_total)
    assert row.band == ("high" if iters > 5 else "low")
