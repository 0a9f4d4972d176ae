"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §7.4 streaming hook).

Running per-event-type totals: state = (count, sum); each micro-batch
updates the state and emits the new totals. Arrow-batched — the state
handler sees pandas DataFrames, never per-row Python.

Over the bounded events source (single batch) the emitted totals equal
the batch aggregation, which makes the operator oracle-checkable; in
production the same code runs over an unbounded kafka source, emitting
one update per key per batch.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from machine_learning_algorithm_sparkml__spark.streaming.events import read_events_stream

OUTPUT_SCHEMA = "event_type string, n_events long, sum_value double"
STATE_SCHEMA = "n long, total double"


def _update_totals(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n_events": [n], "sum_value": [round(total, 2)]}
    )


def run_stateful_running_totals(
    spark: SparkSession, sf_dir: str, *, num_state_partitions: int | None = None
) -> DataFrame:
    """Drive the stateful totals over the bounded events source; the
    final emission per key is the complete total.
    ``num_state_partitions`` right-sizes the state-store width exactly
    as ``events._run_to_completion`` does (see its docstring) — here
    state has only |event_type| keys, so wide layouts are pure
    commit overhead."""
    query_name = f"ev_state_{uuid.uuid4().hex[:8]}"
    events = read_events_stream(spark, sf_dir)
    totals = events.groupBy("event_type").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    from machine_learning_algorithm_sparkml__spark.streaming.events import (
        frozen_shuffle_partitions,
    )

    with frozen_shuffle_partitions(spark, num_state_partitions):
        q = totals.writeStream.outputMode("update").format("memory").queryName(query_name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends one emission per key per batch; keep the last
    # (= complete) emission per key
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    raw = spark.table(query_name).withColumn("_ord", F.monotonically_increasing_id())
    w = Window.partitionBy("event_type").orderBy(F.desc("_ord"))
    latest = (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_type", "n_events", "sum_value")
    )
    # snapshot JVM-side, then release the memory sink (same leak as
    # events._run_to_completion: the sink table pins the per-batch
    # emissions in driver memory; same r17 checkpoint-not-collect
    # rationale — no Python round-trip of the result rows)
    out = latest.localCheckpoint(eager=True)
    spark.catalog.dropTempView(query_name)
    return out
