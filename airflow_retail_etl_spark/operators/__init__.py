from airflow_retail_etl_spark.operators.star import (
    build_dim,
    dedup_keep_first,
    dim_date,
    fact_rollup,
)
from airflow_retail_etl_spark.operators.marts import (
    daily_revenue_summary,
    events_summary,
    funnel_by_dim,
    top_k,
)

__all__ = [
    "build_dim",
    "dedup_keep_first",
    "dim_date",
    "fact_rollup",
    "daily_revenue_summary",
    "events_summary",
    "funnel_by_dim",
    "top_k",
]
