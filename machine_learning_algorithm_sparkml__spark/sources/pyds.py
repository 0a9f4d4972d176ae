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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Knuth's multiplicative-hash constant and a prime modulus: spreads
# values pseudo-randomly but stays in exact integer space
# (MULT * id < 2^62 for any id this source emits), so both Spark and
# the SQL oracle compute bit-identical doubles from the same integer.
_MULT = 2654435761
_MOD = 1000003
_CATEGORIES = ("auth", "page", "api", "batch")


class _SynthLogReader(DataSourceReader):
    def __init__(self, n_partitions: int, rows_per_partition: int):
        self.n_partitions = n_partitions
        self.rows_per_partition = rows_per_partition

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition):
        base = partition.value * self.rows_per_partition
        for i in range(self.rows_per_partition):
            rid = base + i
            yield (
                rid,
                partition.value,
                ((rid * _MULT) % _MOD) / 1000.0,
                _CATEGORIES[rid % 4],
            )


class SynthLogDataSource(DataSource):
    """``spark.read.format("synthlog").option("partitions", 8)
    .option("rowsPerPartition", 2500).load()``"""

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


def register(spark) -> None:
    """Idempotent registration of the synthlog format on a session."""
    spark.dataSource.register(SynthLogDataSource)
