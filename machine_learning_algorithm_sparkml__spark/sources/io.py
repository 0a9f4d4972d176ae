"""Sources and sinks (SURVEY.md §2.1, S1-S3).

The reference reads header-CSV with an all-string inferred-by-header
schema (``MarchineLearningAlgorithm.txt:38-41``, ``A related
code.txt:41-44``, ``RandomeForestAnalysisOnUSElectionPrediction.txt:
44-52``) and writes header-CSV (``MarchineLearningAlgorithm.txt:
283-293``). This engine keeps those entry points but upgrades the hot
path to parquet with explicit schemas — ``inferSchema`` is never used
(100 TB rule: schema inference is a full extra scan).

Storage layer: the reference hardcodes HDFS URIs
(``MarchineLearningAlgorithm.txt:41``); here any Hadoop-compatible
path works unchanged (``hdfs://``, ``s3a://``, ``file:/``) because we
delegate to ``spark.read``/``df.write``.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@contextmanager
def _nanos_as_long(spark: SparkSession):
    """Scope ``spark.sql.legacy.parquet.nanosAsLong`` to one read.

    The flag is consulted only at eager schema inference (the
    ``spark.read.parquet`` call), so restoring the prior value right
    after is safe — and prevents a side effect where loading events
    silently changes how every LATER parquet scan in the session
    treats nanos timestamps."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prior = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)

#: Driver-generated testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(spark: SparkSession, path: str, *, schema: T.StructType | None = None) -> DataFrame:
    """Columnar scan with pushdown. Schema optional: parquet is self-
    describing, so an explicit schema is a *check*, not an inference."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """Reference CSV scan (S1): names from header, all-string values when
    no schema is given — exactly the reference's loading behavior
    (``MarchineLearningAlgorithm.txt:38-41``; no ``inferSchema`` option
    anywhere in the reference). Pass ``schema`` for the typed fast path.
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format("csv").load(path)


def write_csv(df: DataFrame, path: str, *, header: bool = True, mode: str = "overwrite") -> None:
    """Reference CSV sink (S2): ``MarchineLearningAlgorithm.txt:283-293``,
    ``A related code.txt:202-212``."""
    df.write.mode(mode).option("header", str(header).lower()).format("csv").save(path)


def write_parquet(df: DataFrame, path: str, *, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """Parquet sink — the engine's preferred persistence (not in the
    reference; additive). ``partition_by`` gives partition pruning on
    re-read, the cheapest win at 100 TB."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table from a scale-factor directory.

    ``events.ts`` has been generated both as parquet TIMESTAMP(NANOS)
    (which Spark 4 rejects by default — read via the legacy
    nanos-as-long path and truncated to micros, the same narrowing
    DuckDB applies) and as TIMESTAMP(MICROS, isAdjustedToUTC=false)
    (which Spark 4 infers as TIMESTAMP_NTZ). Either way the public
    schema is normalized to a real ``timestamp`` (LTZ) — the session
    timezone is pinned to UTC, so the NTZ→LTZ cast is value-preserving
    and every downstream epoch/double cast stays legal.
    """
    from pyspark.sql import functions as F

    if name == "events":
        with _nanos_as_long(spark):
            df = read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer div: ns values exceed double's 2^53 exact range
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load several testdata tables at once."""
    return tuple(load_table(spark, sf_dir, n) for n in names)


def scratch_sink_path(sf_dir: str, leaf: str) -> str:
    """Fixed per-(sf, leaf) scratch path for sink round-trip keys,
    reused across invocations with mode=overwrite.

    ``mkdtemp`` per call would leak a full table copy to the temp dir
    on every bench iteration / test run / driver sweep; the returned
    DataFrame also reads lazily from the dir, so it must outlive the
    call — a stable overwritten path does both."""
    import tempfile

    sf_name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    base = os.path.join(tempfile.gettempdir(), "spark_graft_sinks", sf_name)
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, leaf)
