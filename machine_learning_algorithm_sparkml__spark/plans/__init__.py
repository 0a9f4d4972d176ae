from machine_learning_algorithm_sparkml__spark.plans.inspect import (
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregation,
    has_pushed_filters,
    scan_read_schema_columns,
    whole_stage_codegen_spans,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "has_partial_aggregation",
    "has_pushed_filters",
    "scan_read_schema_columns",
    "whole_stage_codegen_spans",
]
