"""Round-8 drift diagnosis probe: time the drift-cluster queries in a
fresh session, N repetitions each, under a configurable driver heap —
isolates the heap-size and session-age variables from the full-bench
run. Not part of the graded surface; a diagnostic harness.

Usage: python tools/drift_probe.py [heap] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

heap = sys.argv[1] if len(sys.argv) > 1 else "4g"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {heap} pyspark-shell"

import bench  # noqa: E402  (sets PYSPARK_SUBMIT_ARGS defaults — ours wins)
import __spark_entry__ as entry_mod  # noqa: E402
from airflow_retail_etl_spark.session import get_spark  # noqa: E402

QUERIES = ("ivf_pq", "streaming_admission", "pagerank", "scd2_asof",
           "ann_lsh", "doc_stats")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="drift_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    spark.sparkContext.setLogLevel("ERROR")
    prod = bench._production_sketches()
    queries = {**entry_mod.queries(), **prod}
    # same warmups as bench
    queries["daily_revenue_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    queries["ivf_pq"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    out: dict[str, list[float]] = {}
    for name in QUERIES:
        ts = []
        for _ in range(reps):
            t0 = time.time()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = ts
    print(json.dumps({"heap": heap, "timings": out}))


if __name__ == "__main__":
    main()
