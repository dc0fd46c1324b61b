"""cProfile the BUILD phase of registry queries (driver-side only).

Separates what tools/decompose_probe.py lumps as ``build`` into
py4j/DSL assembly vs eager Spark actions (localCheckpoint/count/collect
show up as socket waits under py4j ``send_command``; pure assembly shows
up as thousands of Column/DataFrame calls).

Usage: python tools/build_profile.py <sf_dir> <query> [top_n]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 4g pyspark-shell"
)


def main() -> None:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    import __spark_entry__ as entry_mod
    from airflow_retail_etl_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="build_profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    spark.sparkContext.setLogLevel("ERROR")
    queries = dict(entry_mod.queries())
    fn = queries[name]
    # warm pass so JIT/codegen/import costs don't pollute the profile
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    df = fn(spark, sf_dir)
    pr.disable()
    build = time.time() - t0
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    ex = time.time() - t0
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(top_n)
    print(s.getvalue())
    print(f"### build={build:.3f}s exec={ex:.3f}s")


if __name__ == "__main__":
    main()
