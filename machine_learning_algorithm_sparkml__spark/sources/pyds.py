"""Custom connector via the Python Data Source API (Spark 4).

The extension surface for feeds Spark has no built-in reader for
(internal tick services, bespoke binary logs, REST-paginated APIs):
subclass ``pyspark.sql.datasource.DataSource``, describe the split
layout in ``partitions()``, and each ``read(partition)`` runs IN AN
EXECUTOR TASK — the source scales out like any file scan, one task
per partition, no driver bottleneck. This is the Spark-4-native
replacement for the old pattern of parallelizing an id range and
mapping a fetch function over it (which hid the split layout from
the scheduler and the UI).

``SynthLogDataSource`` is the demonstrator: a deterministic
arithmetic event feed (pure function of the row id) so the whole
connector crossing — option parsing, partition planning, per-task
generation, type mapping — is oracle-replayable row-for-row from a
``generate_series`` in any SQL engine. A real connector swaps the
formula for its fetch loop; the split/streaming shape stays.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

# Knuth's multiplicative-hash constant and a prime modulus: spreads
# values pseudo-randomly but stays in exact integer space
# (MULT * id < 2^62 for any id this source emits), so both Spark and
# the SQL oracle compute bit-identical doubles from the same integer.
_MULT = 2654435761
_MOD = 1000003
_CATEGORIES = ("auth", "page", "api", "batch")


class _SynthLogReader(DataSourceReader):
    """Range-keyed reader with FILTER PUSHDOWN (Spark 4.1
    ``pushFilters``): comparison predicates on ``id`` tighten an
    [lo, hi) bound BEFORE ``partitions()`` runs, so non-intersecting
    splits are never planned (partition pruning — the custom-source
    analogue of directory pruning) and each surviving task generates
    only in-bound rows (row-group skipping). Unhandled filters are
    yielded back; Spark evaluates them post-scan, so over-pruning is
    the only way to be wrong — the bounds only ever tighten, and the
    read honors them exactly."""

    def __init__(self, n_partitions: int, rows_per_partition: int):
        self.n_partitions = n_partitions
        self.rows_per_partition = rows_per_partition
        self.lo = 0
        self.hi = n_partitions * rows_per_partition  # exclusive

    def pushFilters(self, filters):
        for f in filters:
            if getattr(f, "attribute", None) == ("id",) and isinstance(
                f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ) and isinstance(f.value, int):
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                else:  # EqualTo
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
            else:
                yield f

    def partitions(self):
        rpp = self.rows_per_partition
        return [
            InputPartition(i)
            for i in range(self.n_partitions)
            if i * rpp < self.hi and (i + 1) * rpp > self.lo
        ] or [InputPartition(0)]  # degenerate empty range: one no-op task

    def read(self, partition):
        rpp = self.rows_per_partition
        base = partition.value * rpp
        for rid in range(max(base, self.lo), min(base + rpp, self.hi)):
            yield (
                rid,
                partition.value,
                ((rid * _MULT) % _MOD) / 1000.0,
                _CATEGORIES[rid % 4],
            )


def _feed_rows(lo: int, hi: int, rows_per_partition: int):
    # a LIST, not a generator: Spark's stream-reader prefetch cache
    # copy.copy()s the returned iterator when a batch is planned, and
    # generators aren't copyable — bounded by rows_per_batch anyway
    return [
        (
            rid,
            rid // rows_per_partition,
            ((rid * _MULT) % _MOD) / 1000.0,
            _CATEGORIES[rid % 4],
        )
        for rid in range(lo, hi)
    ]


class _SynthLogStreamReader(SimpleDataSourceStreamReader):
    """STREAMING plane of the same connector: an offset-managed feed.
    The offset is a plain ``{"pos": n}`` cursor; Spark checkpoints it
    per committed micro-batch, so a restarted query resumes at the
    recovered position and every row is delivered EXACTLY ONCE across
    process death — the property the workload key witnesses with
    three sequential ``availableNow`` incarnations over one
    checkpoint. ``readBetweenOffsets`` replays a planned-but-
    uncommitted batch after failure; the feed is a pure function of
    the row id, so replay is bit-identical."""

    def __init__(self, rows_per_batch: int, max_rows: int, rows_per_partition: int):
        self.rows_per_batch = rows_per_batch
        self.max_rows = max_rows
        self.rows_per_partition = rows_per_partition

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = start["pos"]
        end = min(pos + self.rows_per_batch, self.max_rows)
        if end == pos:
            # drained: the wrapper's empty-batch validation calls
            # next() on the returned value, so it must be an ITERATOR
            # here — while a non-empty batch must be a copyable
            # SEQUENCE (the prefetch cache copy.copy()s it when the
            # batch is planned). Both contracts live in
            # pyspark/sql/datasource_internal.py; violating either is
            # a TypeError only surfaced on the path that hits it.
            return iter(()), {"pos": pos}
        return _feed_rows(pos, end, self.rows_per_partition), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return _feed_rows(start["pos"], end["pos"], self.rows_per_partition)


class SynthLogDataSource(DataSource):
    """``spark.read.format("synthlog").option("partitions", 8)
    .option("rowsPerPartition", 2500).load()`` — or
    ``spark.readStream.format("synthlog").option("rowsPerBatch", n)
    .option("maxRows", m).load()`` for the offset-managed stream."""

    @classmethod
    def name(cls) -> str:
        return "synthlog"

    def schema(self) -> str:
        return "id bigint, part int, value double, category string"

    def reader(self, schema) -> _SynthLogReader:
        return _SynthLogReader(
            int(self.options.get("partitions", 4)),
            int(self.options.get("rowsperpartition", 1000)),
        )

    def simpleStreamReader(self, schema) -> _SynthLogStreamReader:
        return _SynthLogStreamReader(
            int(self.options.get("rowsperbatch", 1000)),
            int(self.options.get("maxrows", 3000)),
            int(self.options.get("rowsperpartition", 1000)),
        )

    def writer(self, schema, overwrite: bool) -> "_ManifestJsonWriter":
        return _ManifestJsonWriter(self.options["path"], [f.name for f in schema])


@dataclass
class _TaskFile(WriterCommitMessage):
    path: str
    count: int


class _ManifestJsonWriter(DataSourceWriter):
    """WRITE plane of the connector: a transactional JSON-lines sink
    built on the two-phase commit the DataSourceWriter API provides.
    Each task streams its partition to a ``.staged`` file and returns
    a commit message (path + row count); only the DRIVER's
    ``commit()`` — which runs iff every task succeeded — renames the
    staged files and publishes a ``_MANIFEST`` naming exactly the
    committed files with their counts. Readers that trust only the
    manifest never observe a torn write: ``abort()`` deletes the
    staged files of a failed job, and a crash before commit leaves
    nothing but ignorable ``.staged`` orphans. This is the same
    atomicity recipe as parquet's ``_spark_metadata`` / a lakehouse
    transaction log, reduced to its minimal form — and the shape any
    custom Python sink (an index, a feature store, a vendor API with
    a finalize call) should copy."""

    def __init__(self, path: str, column_names: list[str]):
        self.path = path
        self.column_names = column_names

    def write(self, iterator) -> _TaskFile:
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl.staged")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.column_names, row))) + "\n")
                n += 1
        return _TaskFile(staged, n)

    def commit(self, messages) -> None:
        import json
        import os

        final = []
        for m in messages:
            done = m.path[: -len(".staged")]
            os.replace(m.path, done)
            final.append({"file": os.path.basename(done), "count": m.count})
        with open(os.path.join(self.path, "_MANIFEST"), "w") as f:
            json.dump({"files": final, "n_rows": sum(e["count"] for e in final)}, f)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def register(spark) -> None:
    """Idempotent registration of the synthlog format on a session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` for the
    session: Spark 4.1 REFUSES to plan a Python data source whose
    reader implements ``pushFilters`` while the flag is off (hard
    assertion, not a silent fallback), and the flag must outlive this
    call because the returned DataFrames plan lazily. Enabling it is
    monotone-safe — it only lets sources that opted into pushdown see
    their filters."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SynthLogDataSource)
