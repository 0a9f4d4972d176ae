from machine_learning_algorithm_sparkml__spark.sources.io import (
    load_table,
    load_tables,
    read_csv,
    read_parquet,
    scratch_sink_path,
    write_csv,
    write_parquet,
    TESTDATA_TABLES,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_csv",
    "read_parquet",
    "scratch_sink_path",
    "write_csv",
    "write_parquet",
    "TESTDATA_TABLES",
]
