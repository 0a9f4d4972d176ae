from machine_learning_algorithm_sparkml__spark.ml.features import (
    make_one_hot_encoder,
    make_string_indexer,
    make_vector_assembler,
)
from machine_learning_algorithm_sparkml__spark.ml.classify import (
    make_pipeline,
    make_random_forest,
)
from machine_learning_algorithm_sparkml__spark.ml.tune import (
    fit_predict_evaluate,
    make_accuracy_evaluator,
    make_cross_validator,
    make_param_grid,
)
from machine_learning_algorithm_sparkml__spark.ml.balance import undersample_balance

__all__ = [
    "make_string_indexer",
    "make_one_hot_encoder",
    "make_vector_assembler",
    "make_random_forest",
    "make_pipeline",
    "make_accuracy_evaluator",
    "make_param_grid",
    "make_cross_validator",
    "fit_predict_evaluate",
    "undersample_balance",
]
