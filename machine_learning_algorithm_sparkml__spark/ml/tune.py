"""Evaluation and hyperparameter tuning (M8-M11).

Reference parity map:
- M8  MulticlassClassificationEvaluator(accuracy)
      — ``MarchineLearningAlgorithm.txt:168-171``
- M9  ParamGridBuilder maxDepth x impurity
      — ``MarchineLearningAlgorithm.txt:192-194`` ({3,4} x {entropy,gini});
      ``RandomeForestAnalysisOnUSElectionPrediction.txt:175-177`` uses {3,5}
- M10 CrossValidator, 3 folds — ``MarchineLearningAlgorithm.txt:217-221``
      (3 folds x 4 combos = 12 fits, ``...USElectionPrediction.txt:189``)
- M11 fit / transform / evaluate — ``MarchineLearningAlgorithm.txt:237,
      253, 268-270``

Engine improvement over the reference: ``parallelism`` fits the grid
concurrently (the reference's 12 fits run serially), and callers are
expected to cache the training frame (the reference rescans it 12x —
SURVEY §7.5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Estimator
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder
from pyspark.sql import DataFrame

from machine_learning_algorithm_sparkml__spark.operators.spread import spread_rows


def make_accuracy_evaluator(label_col: str = "label_index", prediction_col: str = "prediction") -> MulticlassClassificationEvaluator:
    """M8: accuracy of ``prediction`` vs indexed label."""
    return MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol=prediction_col, metricName="accuracy"
    )


def make_param_grid(
    rf: RandomForestClassifier,
    *,
    max_depths: Sequence[int] = (3, 4),
    impurities: Sequence[str] = ("entropy", "gini"),
) -> list:
    """M9: maxDepth x impurity grid (``MarchineLearningAlgorithm
    .txt:192-194``)."""
    return (
        ParamGridBuilder()
        .addGrid(rf.maxDepth, list(max_depths))
        .addGrid(rf.impurity, list(impurities))
        .build()
    )


def make_cross_validator(
    estimator: Estimator,
    evaluator: MulticlassClassificationEvaluator,
    param_grid: list,
    *,
    num_folds: int = 3,
    parallelism: int = 8,
    seed: int = 754,
) -> CrossValidator:
    """M10: 3-fold grid-search CV (``MarchineLearningAlgorithm.txt:
    217-221``). Seeded fold assignment; parallel fits (additive)."""
    return CrossValidator(
        estimator=estimator,
        evaluator=evaluator,
        estimatorParamMaps=param_grid,
        numFolds=num_folds,
        parallelism=parallelism,
        seed=seed,
    )


def fit_predict_evaluate(
    estimator: Estimator,
    evaluator: MulticlassClassificationEvaluator,
    train: DataFrame,
    test: DataFrame,
) -> tuple[object, DataFrame, float]:
    """M11: ``fit`` on the training split, ``transform`` the test split,
    ``evaluate`` -> accuracy (``MarchineLearningAlgorithm.txt:237,253,
    268-270``). Caches ``train`` around the (possibly iterative) fit.

    The train split is ``spread_rows``-spread first: it derives from a
    small single-row-group scan, so it reaches the (possibly 12-fold
    CV) fit as ONE partition and every tree aggregation serializes onto
    one core (r16: RF pipeline.fit 7.4-10.5 s single-partition vs
    3.0-4.7 s spread at sf0.1/32 cores; no-op at cluster scale). The
    spread happens AFTER the caller's seeded_random_split, so split
    membership is unchanged; only MLlib's layout-dependent seeded
    bagging/fold draws shift, which no rows-only contract pins."""
    # hash-spread on row_id when present; otherwise round-robin — an
    # arbitrary first column can be a low-cardinality label/feature
    # whose hash collapses into a few skewed partitions (ADVICE r16 #1)
    spread_key = "row_id" if "row_id" in train.columns else None
    # A CrossValidator runs `parallelism` fits CONCURRENTLY over this
    # one frame: the concurrency already fills the cores, so each fit
    # wants cores/parallelism partitions, not cores (r16 measurement in
    # operators/spread.py). Plain estimators get the full spread.
    get_par = getattr(estimator, "getParallelism", None)
    n_jobs = get_par() if callable(get_par) else 1
    sc = train.sparkSession.sparkContext
    train = spread_rows(
        train, spread_key, n=max(2, sc.defaultParallelism // max(1, n_jobs))
    )
    train.cache()
    try:
        model = estimator.fit(train)
    finally:
        train.unpersist()
    predictions = model.transform(test)
    accuracy = evaluator.evaluate(predictions)
    return model, predictions, accuracy
