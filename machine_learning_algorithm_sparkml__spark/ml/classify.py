"""Random Forest classification + pipeline composition (M6, M7).

Reference parity map:
- M6 RandomForestClassifier — ``MarchineLearningAlgorithm.txt:127-130``
  (seed 1234; the report run used 3642, DOCX ``word/media/image6.png``)
- M7 Pipeline               — ``MarchineLearningAlgorithm.txt:145-146``

Scale notes: MLlib RF training is already distributed (per-depth-level
aggregation of split statistics across executors); the engine's only
jobs are to seed it (reproducibility rule, ``MarchineLearningAlgorithm
.txt:87-91``) and to cache the training frame before iterative fits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.base import Estimator
from pyspark.ml.classification import RandomForestClassifier

REFERENCE_RF_SEED = 1234  # MarchineLearningAlgorithm.txt:130
REFERENCE_SPLIT_SEED = 754  # MarchineLearningAlgorithm.txt:91


def make_random_forest(
    features_col: str = "assembled_features",
    label_col: str = "label_index",
    *,
    seed: int = REFERENCE_RF_SEED,
    num_trees: int = 20,
    max_depth: int = 5,
    impurity: str = "gini",
) -> RandomForestClassifier:
    """M6: multiclass tree ensemble, fixed seed — ``new
    RandomForestClassifier().setFeaturesCol("assembled-features")
    .setLabelCol("Outcome_Index").setSeed(1234)``
    (``MarchineLearningAlgorithm.txt:127-130``)."""
    return RandomForestClassifier(
        featuresCol=features_col,
        labelCol=label_col,
        seed=seed,
        numTrees=num_trees,
        maxDepth=max_depth,
        impurity=impurity,
    )


def make_pipeline(stages: Sequence[Estimator]) -> Pipeline:
    """M7: stage composition — ``new Pipeline().setStages(Array(
    stringIndexer, assembler, rf))`` (``MarchineLearningAlgorithm
    .txt:145-146``)."""
    return Pipeline(stages=list(stages))


def fit_transform(estimator: Estimator, df) -> tuple[PipelineModel, object]:
    """M3: explicit fit/transform chaining outside a Pipeline
    (``A related code.txt:102-103``)."""
    model = estimator.fit(df)
    return model, model.transform(df)
