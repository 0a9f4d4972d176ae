"""Invariants for the analytics workload keys that the oracle can't
cover (seeded sampling, plan shape). Oracle-checked keys are covered
by tests/test_oracle_parity.py automatically."""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.sources import load_table
from machine_learning_algorithm_sparkml__spark.workload import analytics


def _physical_plan(df) -> str:
    # public explain output, Connect-safe (ADVICE r7 — no _jdf bridge)
    from machine_learning_algorithm_sparkml__spark.plans import formatted_plan

    return formatted_plan(df)


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    full = (
        analytics.load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = {r["o_orderstatus"]: r["n"] for r in full.collect()}
    sampled = analytics.q_sample_stratified(spark, sf_dir)
    got = {
        r["o_orderstatus"]: r["n"]
        for r in sampled.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    targets = {"F": 0.3, "O": 0.1, "P": 0.5}
    for status, frac in targets.items():
        expected = totals[status] * frac
        # 5-sigma binomial margin so the seeded draw never flakes
        margin = 5 * (totals[status] * frac * (1 - frac)) ** 0.5
        assert abs(got.get(status, 0) - expected) <= margin, (status, got, expected)
    # seeded => identical on rerun
    again = analytics.q_sample_stratified(spark, sf_dir)
    assert sampled.exceptAll(again).isEmpty() and again.exceptAll(sampled).isEmpty()


def test_lag_lead_group_boundaries(spark, sf_dir):
    out = analytics.q_window_lag_lead(spark, sf_dir)
    firsts = out.filter(F.col("seq") == 1)
    assert firsts.filter(F.col("prev_value").isNotNull()).isEmpty()
    # every user contributes exactly one seq=1 row
    n_users = out.select("user_id").distinct().count()
    assert firsts.count() == n_users


def test_moving_avg_first_row_equals_value(spark, sf_dir):
    out = analytics.q_window_moving_avg(spark, sf_dir)
    ranked = out.withColumn(
        "rn",
        F.row_number().over(
            analytics.Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
        ),
    )
    firsts = ranked.filter(F.col("rn") == 1)
    bad = firsts.filter(
        (F.abs(F.col("avg_value_3") - F.col("value")) > 1e-6)
        | (F.abs(F.col("cum_value") - F.col("value")) > 1e-4)
    )
    assert bad.isEmpty()


def test_window_keys_single_shuffle(spark, sf_dir):
    """Both window keys must shuffle exactly once: all their window
    expressions share one partitioning."""
    import re

    for fn in (analytics.q_window_lag_lead, analytics.q_window_moving_avg):
        plan = _physical_plan(fn(spark, sf_dir))
        # formatted explain names shuffle exchanges "(N) Exchange"
        # (broadcast ones are "BroadcastExchange" — excluded by \b)
        assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1, plan


def test_outlier_iqr_no_spend_shuffle_for_fences(spark, sf_dir):
    """The one-row fence frame must cross via broadcast, not shuffle
    the spend aggregate again."""
    plan = _physical_plan(analytics.q_filter_outlier_iqr(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_approx_invariants_hold(spark, sf_dir):
    row = analytics.q_agg_approx(spark, sf_dir).collect()[0]
    assert row["approx_distinct_ok"] is True
    assert row["approx_p50_ok"] is True


def test_range_frame_includes_exact_boundary(spark):
    """RANGE BETWEEN 3600 PRECEDING is inclusive: an event exactly one
    hour after another must see it in its frame."""
    from datetime import datetime

    rows = [
        (1, 7, datetime(2024, 1, 1, 10, 0, 0), 1.0),
        (2, 7, datetime(2024, 1, 1, 11, 0, 0), 2.0),   # exactly +3600s
        (3, 7, datetime(2024, 1, 1, 12, 0, 1), 4.0),   # +3601s from #2
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    spec = (
        analytics.Window.partitionBy("user_id")
        .orderBy(F.asc(F.col("ts").cast("long")))
        .rangeBetween(-3600, 0)
    )
    out = {r["event_id"]: r["s"] for r in df.select(
        "event_id", F.sum("value").over(spec).alias("s")
    ).collect()}
    assert out[1] == 1.0
    assert out[2] == 3.0   # boundary event included
    assert out[3] == 4.0   # 3601s gap excluded


def test_full_outer_join_populates_both_null_sides(spark, sf_dir):
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_join_full_outer,
    )

    df = q_join_full_outer(spark, sf_dir)
    assert df.filter(F.col("o_orderkey").isNull()).count() > 0, "customers w/o big orders"
    assert df.filter(F.col("c_custkey").isNull()).count() > 0, "big orders w/o surviving customer"


def test_string_collect_is_sorted_and_deterministic(spark, sf_dir):
    out1 = {r["o_orderpriority"]: r["statuses"]
            for r in analytics.q_agg_string_collect(spark, sf_dir).collect()}
    out2 = {r["o_orderpriority"]: r["statuses"]
            for r in analytics.q_agg_string_collect(
                spark, sf_dir).repartition(7).collect()}
    for k, v in out1.items():
        parts = v.split(",")
        assert parts == sorted(parts), v
        assert out2[k] == v


def test_event_funnel_is_monotone_and_ordered(spark, sf_dir):
    """Stage counts can only shrink, and the strictly-after rule means
    a user with click-before-view never reaches stage 2."""
    rows = {r["stage"]: r["n_users"] for r in analytics.q_event_funnel(spark, sf_dir).collect()}
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    assert rows["1_view"] >= rows["2_click"] >= rows["3_purchase"]
    assert rows["1_view"] > 0


def test_event_funnel_strictly_after_semantics(spark):
    """click at the exact same ts as the first view does NOT count
    (strict >); a later one does."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t, 10, "view", 1.0, "{}"),
        (2, t, 10, "click", 1.0, "{}"),              # same instant: no
        (3, t + dt.timedelta(seconds=1), 11, "view", 1.0, "{}"),
        (4, t + dt.timedelta(seconds=2), 11, "click", 1.0, "{}"),  # yes
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        out = {r["stage"]: r["n_users"] for r in analytics.q_event_funnel(spark, d).collect()}
    assert out["1_view"] == 2
    assert out["2_click"] == 1
    assert out["3_purchase"] == 0


def test_retention_cohort_week_zero_covers_every_user(spark, sf_dir):
    """Every user is active in their own cohort week, so the sum of
    week_offset=0 counts equals the number of distinct users."""
    from machine_learning_algorithm_sparkml__spark.sources import load_table

    df = analytics.q_retention_cohort(spark, sf_dir)
    week0 = df.filter(F.col("week_offset") == 0).agg(F.sum("n_users")).collect()[0][0]
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert week0 == n_users
    assert df.filter(F.col("week_offset") < 0).count() == 0


def test_time_rollup_levels_are_consistent(spark, sf_dir):
    """ROLLUP hierarchy invariants: the grand-total row equals the
    table; each year row equals the sum of its month rows."""
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_agg_time_rollup,
    )

    rows = q_agg_time_rollup(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "orders").count()
    grand = [r for r in rows if r.yr == -1 and r.mo == -1]
    assert len(grand) == 1 and grand[0].n_orders == total
    years = {r.yr: r.n_orders for r in rows if r.yr != -1 and r.mo == -1}
    for yr, n in years.items():
        month_sum = sum(r.n_orders for r in rows if r.yr == yr and r.mo != -1)
        assert month_sum == n, yr


def test_argmax_maxby_is_sort_free_single_aggregation(spark, sf_dir):
    """The scale claim: max_by argmax does map-side partial
    aggregation (one candidate per group per partition crosses the
    shuffle) and needs NO Window pass over the raw rows — and the
    winner really carries the group's max price. (Struct-ordered
    extremum is sort-BASED aggregation, so a group-key Sort of the
    combined rows is expected; a Window operator is not.)"""
    from machine_learning_algorithm_sparkml__spark.plans import (
        formatted_plan,
        has_partial_aggregation,
    )
    from machine_learning_algorithm_sparkml__spark.workload.relational import (
        q_agg_argmax_maxby,
    )

    df = q_agg_argmax_maxby(spark, sf_dir)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "partial_max_by" in plan  # map-side combine of the extremum
    assert has_partial_aggregation(df)

    orders = load_table(spark, sf_dir, "orders")
    joined = df.join(orders, df.best_orderkey == orders.o_orderkey)
    assert joined.filter(F.round(F.col("o_totalprice"), 2) != F.col("best_price")).count() == 0


def test_theta_setops_identities_and_partitioning_invariance(spark, sf_dir):
    """Set-algebra identities must hold exactly in the sketch's exact
    regime (inclusion-exclusion, difference complement), and the
    estimates must be invariant to how the input is partitioned —
    the mergeability claim the 100 TB story rests on."""
    from machine_learning_algorithm_sparkml__spark.sources import load_table
    from machine_learning_algorithm_sparkml__spark.workload.analytics import (
        q_agg_distinct_setops_sketch,
    )
    import pyspark.sql.functions as F  # noqa: N812

    r = q_agg_distinct_setops_sketch(spark, sf_dir).collect()[0]
    assert r["n_any"] == r["n_96"] + r["n_97"] - r["n_both"]
    assert r["n_96_only"] == r["n_96"] - r["n_both"]

    orders = load_table(spark, sf_dir, "orders")
    for n in (1, 17):
        redo = (
            orders.repartition(n)
            .filter(F.year("o_orderdate") == 1996)
            .agg(F.expr("theta_sketch_estimate(theta_sketch_agg(o_custkey, 20)) AS e"))
            .collect()[0]["e"]
        )
        assert redo == r["n_96"], n


def test_timeseries_ewma_hand_computed_and_plan(spark, sf_dir):
    """Hand-computed EWMA on a crafted series (decay 0.5, window 8,
    partial-window normalizer at the head), and the plan pin: ONE
    window, no self-join (the oracle's relational formulation is an
    8x row blowup the production plan must not use)."""
    import datetime

    from machine_learning_algorithm_sparkml__spark.workload.analytics import (
        q_timeseries_ewma,
    )

    # crafted: one user, values 1, 2, 4 at increasing ts
    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, i), 1, "e", float(2 ** i), "{}")
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-7, 0)
    vals = F.collect_list("value").over(w)
    frame = df.select("event_id", vals.alias("vals"))
    got = {r["event_id"]: r["vals"] for r in frame.collect()}
    assert got[2] == [1.0, 2.0, 4.0]  # frame order is oldest -> newest

    # full-key values are oracle-checked; here check the math on the
    # crafted frame with the SAME expression pipeline:
    # t=0: 1/1; t=1: (0.5*1 + 2)/1.5; t=2: (0.25*1 + 0.5*2 + 4)/1.75
    m = F.size("vals")
    weighted = F.transform("vals", lambda x, i: x * F.pow(F.lit(0.5), (m - 1 - i).cast("double")))
    num = F.aggregate(weighted, F.lit(0.0), lambda a, x: a + x)
    den = F.lit(2.0) - F.pow(F.lit(0.5), (m - 1).cast("double"))
    res = {r["event_id"]: r["e"] for r in frame.select("event_id", F.round(num / den, 6).alias("e")).collect()}
    assert res[0] == 1.0
    assert abs(res[1] - round((0.5 * 1 + 2) / 1.5, 6)) < 1e-12
    assert abs(res[2] - round((0.25 * 1 + 0.5 * 2 + 4) / 1.75, 6)) < 1e-12

    plan = _physical_plan(q_timeseries_ewma(spark, sf_dir))
    assert "Join" not in plan, "EWMA must be a window + fold, not a self-join"
    assert plan.count("Window") >= 1
