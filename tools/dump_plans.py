"""Dump .explain('formatted') for named queries to files.

Usage: python tools/dump_plans.py <repo_root> <out_dir> <suffix> <q> [...]
Writes <out_dir>/<query>_<suffix>.txt for each query, built from the
registry (and bench production overrides where they exist) of the repo
at <repo_root> — so a git worktree at an older commit dumps the
"before" plans and the working tree the "after" plans.
"""

from __future__ import annotations

import os
import sys

root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, root)
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 4g pyspark-shell"
)
os.makedirs(out_dir, exist_ok=True)

import __spark_entry__ as entry_mod  # noqa: E402
from airflow_retail_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name=f"dump_plans_{suffix}", master="local[32]",
    shuffle_partitions=32,
)
spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
spark.sparkContext.setLogLevel("ERROR")
queries = dict(entry_mod.queries())
import bench  # noqa: E402

for pname, pfn in bench._production_sketches().items():
    queries.setdefault(f"{pname}__prod", pfn)
for name in names:
    fn = queries[name]
    try:
        df = fn(spark, "/root/testdata/sf0.01")
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as exc:  # noqa: BLE001
        txt = f"ERROR building {name}: {exc}"
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(txt)
    print(name, "ok", flush=True)
