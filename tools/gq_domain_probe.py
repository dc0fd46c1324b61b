"""Grouped-quantiles value-domain probe: discrete vs continuous grains.

``selection.grouped_quantiles``' cumulative window runs per group over
VALUE-GRAIN rows, so its per-group state is the group's DISTINCT-VALUE
count, not its row count (`selection.py` docstring). On a discrete
domain (prices on a cent grid) that is a huge win; on a CONTINUOUS
domain distinct ≈ rows and each group's window degrades to a
single-partition sort of the whole group — the documented monster-group
caveat (`selection.py:116-119`).

Until round 12 the caveat was documented but had no measured scale
point. This probe times grouped_quantiles at each sf dir on BOTH
domains over the events table (5 event_type groups):

- discrete: `value` as stored (~10k distinct per group at sf1);
- continuous: `value` plus a deterministic md5-fraction jitter of
  event_id — distinct ≈ rows (~200k per group at sf1), the worst case.

and appends one SCALING_HISTORY.jsonl record. The rule derived from the
measurements lives in SCALE.md ("grouped quantiles: value-domain
grain").

Usage: python tools/gq_domain_probe.py [sf_dir ...]
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
sys.path.insert(0, str(_ROOT / "tools"))

from _probe_env import ensure_pretouch_args  # noqa: E402  (shared guard)

ensure_pretouch_args("gq_domain_probe")

DEFAULT_SF_DIRS = (
    "/root/testdata/sf0.1",
    str(_ROOT / ".scale_data" / "sf1"),
)

QS = [0.25, 0.5, 0.9, 0.99]


def _events(spark, sf_dir: str, continuous: bool):
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.functions import xhash
    from airflow_retail_etl_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    )
    if not continuous:
        return ev
    # deterministic sub-cent jitter: distinct values ≈ rows, ordering
    # still value-dominated — the continuous-domain worst case
    jitter = (
        xhash.md5_u64(F.col("event_id").cast("string"))
        .cast("double") / float(2**64) / 1e6
    )
    return ev.withColumn("value", F.col("value") + jitter)


def main() -> None:
    sf_dirs = sys.argv[1:] or [d for d in DEFAULT_SF_DIRS if os.path.isdir(d)]
    if not sf_dirs:
        raise SystemExit(
            "gq_domain_probe: no sf dirs — pass one or more parquet dirs "
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

    from airflow_retail_etl_spark.operators import selection
    from airflow_retail_etl_spark.session import get_spark

    spark = get_spark(
        app_name="gq_domain_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    spark.sparkContext.setLogLevel("ERROR")

    def run(sf_dir: str, continuous: bool) -> float:
        df = _events(spark, sf_dir, continuous)
        t0 = time.time()
        selection.grouped_quantiles(
            df, "event_type", "value", QS
        ).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    for c in (False, True):  # JIT warm-up, both plan shapes
        run(sf_dirs[0], c)

    probes: dict[str, dict] = {}
    for continuous in (False, True):
        key = "continuous" if continuous else "discrete"
        times = {}
        for d in sf_dirs:
            sf = d.rstrip("/").rsplit("sf", 1)[-1]
            times[sf] = run(d, continuous)
            print(f"# {key} sf{sf}: {times[sf]}s", file=sys.stderr,
                  flush=True)
        probes[key] = {"sec": times}

    record = {
        "metric": "grouped_quantiles_value_domain",
        "cpus": int(cpus),
        "qs": QS,
        "probes": probes,
        "note": (
            "discrete = events.value as stored (~10k distinct/group at "
            "sf1); continuous = +md5 sub-cent jitter (distinct ~= rows, "
            "~200k/group) — the selection.py monster-group caveat's "
            "measured point; rule in SCALE.md ('grouped quantiles: "
            "value-domain grain')"
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
