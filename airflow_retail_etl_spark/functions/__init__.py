from airflow_retail_etl_spark.functions.columns import (
    conditional_count,
    conditional_sum,
    money_sum,
    safe_ratio,
    split_hierarchy,
)

__all__ = [
    "conditional_count",
    "conditional_sum",
    "money_sum",
    "safe_ratio",
    "split_hierarchy",
]
