"""Feature encoders (SURVEY.md §2.12, M1-M5).

Reference parity map:
- M1 StringIndexer single-col — ``MarchineLearningAlgorithm.txt:95-97``
- M2 StringIndexer multi-col  — ``MarchineLearningAlgorithm.txt:65-70``
- M4 OneHotEncoder multi-col  — ``A related code.txt:123-127``
- M5 VectorAssembler          — ``MarchineLearningAlgorithm.txt:109-111``

Determinism: the reference leaves StringIndexer's order policy at its
default; this engine PINS ``stringOrderType="frequencyDesc"`` (the
default, made explicit) because frequency ties are then broken
alphabetically — a total order, reproducible across partitionings
(SURVEY §7.6 risk register).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler


def make_string_indexer(
    input_cols: str | Sequence[str],
    output_cols: str | Sequence[str],
    *,
    handle_invalid: str = "error",
) -> StringIndexer:
    """M1/M2: label-encode string column(s) by descending frequency,
    alphabetical tie-break. Single-col mirrors ``new StringIndexer()
    .setInputCol("Outcome").setOutputCol("Outcome_Index")``
    (``MarchineLearningAlgorithm.txt:95-97``); multi-col mirrors the
    array form at ``:65-70``."""
    if isinstance(input_cols, str):
        return StringIndexer(
            inputCol=input_cols,
            outputCol=str(output_cols),
            stringOrderType="frequencyDesc",
            handleInvalid=handle_invalid,
        )
    return StringIndexer(
        inputCols=list(input_cols),
        outputCols=list(output_cols),
        stringOrderType="frequencyDesc",
        handleInvalid=handle_invalid,
    )


def make_one_hot_encoder(input_cols: Sequence[str], output_cols: Sequence[str]) -> OneHotEncoder:
    """M4: sparse one-hot vectors from index columns (``A related
    code.txt:123-127``). Keeps Spark's dropLast=True default — the
    reference does not override it."""
    return OneHotEncoder(inputCols=list(input_cols), outputCols=list(output_cols))


def make_vector_assembler(input_cols: Sequence[str], output_col: str = "assembled_features") -> VectorAssembler:
    """M5: concatenate numeric/vector columns into one feature vector
    (``MarchineLearningAlgorithm.txt:109-111`` builds
    ``assembled-features``; renamed with an underscore — hyphens in
    column names need backtick-quoting everywhere downstream)."""
    return VectorAssembler(inputCols=list(input_cols), outputCol=output_col)
