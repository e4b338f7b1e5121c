"""Physical-plan inspection helpers.

The reference has no optimizer (SURVEY.md §4); on Spark the optimizer is the
point.  These helpers let tests *assert* plan properties — filters pushed to
the parquet scan, broadcast joins chosen, whole-stage codegen present —
rather than hoping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def physical_plan_checks(df: DataFrame) -> dict[str, bool]:
    """Quick booleans over the formatted plan for test assertions."""
    plan = explain_str(df)
    return {
        "has_pushed_filters": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        "has_broadcast_join": "BroadcastHashJoin" in plan,
        "has_codegen": "WholeStageCodegen" in plan,
        "reads_all_columns": False,  # caller should check ReadSchema explicitly
    }
