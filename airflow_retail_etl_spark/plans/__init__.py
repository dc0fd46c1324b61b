from airflow_retail_etl_spark.plans.explain import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    wholestage_codegen_ids,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_join",
    "pushed_filters",
    "wholestage_codegen_ids",
]
