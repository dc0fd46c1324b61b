"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is forced end-to-end with the
noop sink (full execution, no driver-side collect of the result set).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from airflow_retail_etl_spark.session import get_spark

#: Queries timed for the headline number (the rest still run in correctness).
HEADLINE = (
    "staging_clean",
    "fact_rollup",
    "dim_user",
    "dim_product",
    "daily_revenue_summary",
    "daily_funnel_by_brand",
    "top_brands_by_revenue",
    "events_summary",
    "pricing_summary",
    "revenue_by_nation",
    "shipping_priority",
    "sessionize",
    "doc_stats",
    "dedup_exact",
    "neardup_jaccard",
    "minhash_lsh_pairs",
    "knn_cosine",
    "events_hourly",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    # the testdata is one smallish parquet file per table; split finer so
    # scans parallelize locally (cluster deployments keep the 128MB default)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    # warmup: JIT + filesystem metadata, not counted
    queries["daily_revenue_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
