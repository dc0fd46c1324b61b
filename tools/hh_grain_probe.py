"""Fine-grain grouped heavy-hitters probe: broadcast vs shuffle cells.

``heavy_hitters_by(broadcast_cells=...)`` picks between two probe-join
strategies for the per-group CMS cell table (frequency.py docstring):

- ``True`` (default): the sparse cell table broadcasts into d map-side
  joins — the occurrence stream never shuffles before the prune. Sized
  for coarse grains (language/source/tier): ~16 B x |groups|·depth·width.
- ``False``: the probes run as shuffle joins on (group, idx) — the
  occurrence stream shuffles d times pre-prune. The fallback for grains
  too fine to broadcast (per-URL-host), where the cell table outgrows
  executor broadcast budgets.

Until round 11 the fallback was correctness-tested but had no measured
scale point. This probe times BOTH paths at a coarse and a fine
synthetic grain (host = md5-bucket of doc_id — the per-URL-host shape)
over real token occurrences, and appends one SCALING_HISTORY.jsonl
record. The crossover rule derived from the measurements lives in
SCALE.md ("grouped heavy hitters: broadcast vs shuffle cells").

Usage: python tools/hh_grain_probe.py [sf_dir ...]
(defaults to sf0.1 and .scale_data/sf1 when present)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

# probe JVMs run Xms=Xmx + AlwaysPreTouch (CLAUDE.md invariant: lazy heap
# commit page-faults inside timed windows); 48g for the fine-grain
# broadcast builds. Shared guard — a bare setdefault silently dropped
# the flags under a caller-set PYSPARK_SUBMIT_ARGS (round-11 advice).
sys.path.insert(0, str(_ROOT / "tools"))
from _probe_env import ensure_pretouch_args  # noqa: E402  (shared guard)

ensure_pretouch_args("hh_grain_probe")

DEFAULT_SF_DIRS = (
    "/root/testdata/sf0.1",
    str(_ROOT / ".scale_data" / "sf1"),
)

#: synthetic group grains: hosts = md5 buckets of doc_id. 16 is the
#: language/source regime the broadcast default targets; 4096 is the
#: per-URL-host regime the docstring names as past broadcast budgets.
GRAINS = (16, 4096)


def _occurrences(spark, sf_dir: str, n_hosts: int):
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.functions import xhash
    from airflow_retail_etl_spark.functions.partitioning import spread
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    host = F.concat(
        F.lit("h"),
        (xhash.md5_u64(F.col("doc_id").cast("string")) % F.lit(n_hosts))
        .cast("long")
        .cast("string"),
    )
    return (
        docs.filter(F.col("text").isNotNull())
        .select(F.col("doc_id").alias("id"), host.alias("host"), norm.alias("__t"))
        .filter(F.length("__t") > 0)
        .transform(lambda d: spread(d, "id"))
        .select("host", F.explode(F.split("__t", " ")).alias("token"))
    )


def main() -> None:
    sf_dirs = sys.argv[1:] or [d for d in DEFAULT_SF_DIRS if os.path.isdir(d)]
    if not sf_dirs:
        raise SystemExit(
            "hh_grain_probe: no sf dirs — pass one or more parquet dirs "
            f"on the command line (defaults {DEFAULT_SF_DIRS} are absent)"
        )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from bench import _contamination_reason, _release_bench_lock

    contaminated = _contamination_reason()
    if contaminated:
        print(
            f"# CONTAMINATED ({contaminated}): probes will print but "
            "SCALING_HISTORY gets nothing",
            file=sys.stderr, flush=True,
        )

    from airflow_retail_etl_spark.operators import frequency
    from airflow_retail_etl_spark.session import get_spark

    spark = get_spark(
        app_name="hh_grain_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    spark.sparkContext.setLogLevel("ERROR")

    def run(sf_dir: str, n_hosts: int, broadcast: bool) -> float:
        occ = _occurrences(spark, sf_dir, n_hosts)
        t0 = time.time()
        frequency.heavy_hitters_by(
            occ,
            "token",
            "host",
            threshold_frac=0.005,
            broadcast_cells=broadcast,
        ).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # JIT warm-up: both plan shapes once at the smallest tier/grain
    for b in (True, False):
        run(sf_dirs[0], GRAINS[0], b)

    probes: dict[str, dict] = {}
    for n_hosts in GRAINS:
        for b in (True, False):
            key = f"hosts{n_hosts}_{'broadcast' if b else 'shuffle'}"
            times = {}
            for d in sf_dirs:
                sf = d.rstrip("/").rsplit("sf", 1)[-1]
                times[sf] = run(d, n_hosts, b)
                print(f"# {key} sf{sf}: {times[sf]}s", file=sys.stderr,
                      flush=True)
            probes[key] = {"sec": times}

    record = {
        "metric": "heavy_hitters_fine_grain",
        "cpus": int(cpus),
        "grains": list(GRAINS),
        "probes": probes,
        "note": (
            "synthetic host grain = md5 bucket of doc_id over unigram "
            "occurrences; crossover rule documented in SCALE.md "
            "('grouped heavy hitters: broadcast vs shuffle cells')"
        ),
    }
    if contaminated:
        record["history_append_refused"] = contaminated
    else:
        with open(_ROOT / "SCALING_HISTORY.jsonl", "a") as fh:
            fh.write(json.dumps(record) + "\n")
        _release_bench_lock()
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
