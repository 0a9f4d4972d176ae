"""Physical-plan inspection helpers (SURVEY.md §4).

The engine's scale guarantees are properties of the PLAN, not the
code: filters must reach the parquet scan (PushedFilters), projections
must prune the read schema (ReadSchema), dim joins must broadcast, and
expressions must stay inside WholeStageCodegen. These helpers turn
those properties into assertions so tests fail when a refactor
silently degrades the plan.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """``df.explain('formatted')`` captured as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filters(df: DataFrame) -> bool:
    """True if any scan in the plan carries a non-empty PushedFilters list."""
    plan = formatted_plan(df)
    return bool(re.search(r"PushedFilters: \[(?!\])", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def scan_read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each parquet scan (from ReadSchema) —
    assert on these to prove column pruning reached the scan."""
    plan = formatted_plan(df)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return [
        [field.split(":")[0].strip() for field in s.split(",") if field.strip()]
        for s in schemas
    ]


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen stages (the
    ``[codegen id : N]`` markers of formatted explain). EXECUTES the
    frame: with AQE the physical plan is only final after at least one
    run, so this helper collects first and re-explains — public
    explain output only, no ``_jdf`` bridge (ADVICE r7; formatted
    explain shows ``isFinalPlan=true`` after the run)."""
    df.collect()
    return len(set(re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df))))


def has_partial_aggregation(df: DataFrame) -> bool:
    """True when the aggregate runs map-side partials before the
    exchange (partial_sum/partial_count/... in the formatted plan)."""
    return "partial_" in formatted_plan(df)
