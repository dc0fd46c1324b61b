"""Per-query time decomposition: DSL build vs Catalyst plan vs execute.

Optimization-round triage (guide §1): a 2-4 s query at sf0.1 can be
spending its window in three very different places —

- ``build``    — Python-side DataFrame construction (the ``fn(spark,
  sf_dir)`` call): literal generation, driver-side counts/collects some
  operators legitimately do (k-means fits, calendar probes), plan-object
  assembly;
- ``plan``     — analysis + optimization + physical planning, triggered
  via ``df.queryExecution.executedPlan`` WITHOUT executing (AQE keeps
  re-planning at runtime, so this is the floor, not the whole cost);
- ``exec``     — the noop-sink end-to-end run (includes AQE re-planning,
  shuffles, Python workers — everything bench.py times minus build).

bench.py's timed window covers build + plan + exec; knowing which bucket
dominates picks the optimization (guide §2/§3 for exec, §7.3/plan-size
surgery for plan, literal/collect surgery for build).

Usage: python tools/decompose_probe.py <sf_dir> <query> [<query> ...]
Runs all requested queries in ONE session (same as bench), two exec
passes each (cold/warm), prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 4g pyspark-shell"
)


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as entry_mod
    from airflow_retail_etl_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="decompose_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    spark.sparkContext.setLogLevel("ERROR")
    queries = dict(entry_mod.queries())
    from bench import _production_sketches

    for name, fn in _production_sketches().items():
        queries[name] = fn

    # session warmup (bench protocol)
    queries["daily_revenue_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    from bench import _drop_persistent_blocks

    for name in names:
        fn = queries[name]
        _drop_persistent_blocks(spark)
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        _ = df._jdf.queryExecution().executedPlan()
        t_plan = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.time() - t0
        # warm repeat: fresh build (bench semantics) so codegen/JIT and
        # exchange-reuse caches are the only difference
        _drop_persistent_blocks(spark)
        t0 = time.time()
        df2 = fn(spark, sf_dir)
        t_build2 = time.time() - t0
        t0 = time.time()
        df2.write.format("noop").mode("overwrite").save()
        t_exec2 = time.time() - t0
        print(
            json.dumps(
                {
                    "query": name,
                    "build": round(t_build, 3),
                    "plan": round(t_plan, 3),
                    "exec": round(t_exec, 3),
                    "build2": round(t_build2, 3),
                    "exec2": round(t_exec2, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
