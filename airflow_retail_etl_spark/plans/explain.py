"""Physical-plan introspection helpers.

Used by tests to pin the plans we want at scale — filter pushdown reaching the
parquet scan, broadcast joins for dims, whole-stage codegen coverage — so a
refactor that silently regresses the plan fails CI, not the 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same path .explain() uses
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every scan node in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def wholestage_codegen_ids(df: DataFrame) -> set[int]:
    plan = formatted_plan(df)
    return {int(m) for m in re.findall(r"WholeStageCodegen \((\d+)\)", plan)}
