"""Fresh-JVM single-query probe (round-9 verdict item 3).

Session-aging wobble: iterative probes (pagerank above all) accumulate
localCheckpointed RDDs and GC debt across a long curve session, so their
single-shot in-session sf1 numbers ranged 13-50 s for identical plans.
Running the probe in its OWN JVM removes every session variable; the
remaining spread is the OS page cache, which the two-run protocol makes
explicit: one cold run (reported as ``cold_sec``), one warm run
(``sec`` — the comparable number; measured pagerank sf1 band ±20%).

Usage: python tools/isolated_probe.py <query> <sf_dir>
Prints one JSON line: {"query", "sf_dir", "cold_sec", "sec"}.
Invoked by tools/scaling_curve.py for ISOLATED_PROBES; usable standalone
to re-probe any registry query that looks like a regression in-curve.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 48g pyspark-shell"
)


def main() -> None:
    query, sf_dir = sys.argv[1], sys.argv[2]
    import __spark_entry__ as entry_mod
    from airflow_retail_etl_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"isolated_probe_{query}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024)
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()[query]
    # JIT warm-up at the smallest sf (same protocol as the curve)
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold = round(time.time() - t0, 3)
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    warm = round(time.time() - t0, 3)
    print(
        json.dumps(
            {"query": query, "sf_dir": sf_dir, "cold_sec": cold,
             "sec": warm}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
