"""airflow_retail_etl_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference ETL (``arpan65/airflow-retail-ETL``): a retail star schema (staging →
fact/dims → KPI marts) plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) that a 100 TB
deployment of the same pipeline would need.

Design rules (see SURVEY.md §7):

- Declarative DataFrame/SQL everywhere; Catalyst/Tungsten pick the physical plan.
- No row-at-a-time Python UDFs in hot paths; Arrow-batched pandas UDFs only where
  built-ins genuinely cannot express the semantics.
- No driver-side ``collect()`` loops inside operators; everything stays
  distributed and lazy until a sink.
- Small dimensions are broadcast; big joins/aggs shuffle on their keys only once.
"""

__version__ = "0.1.0"
