"""Job/stage-level profile of one registry query via the Spark event log.

Runs the query once (warm session, same confs as bench), then parses the
event log to print every job with its duration, stage task counts and
per-stage wall, attributing the query's time to concrete jobs (eager
localCheckpoints, counts, the final noop write). This is the evidence
layer under tools/decompose_probe.py's build/plan/exec split.

Usage: python tools/job_profile.py <sf_dir> <query> [--cold]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault(
    "PYSPARK_SUBMIT_ARGS", "--driver-memory 4g pyspark-shell"
)


def main() -> None:
    sf_dir = sys.argv[1]
    name = sys.argv[2]
    cold = "--cold" in sys.argv[3:]
    evdir = tempfile.mkdtemp(prefix="spark_graft_evlog_")
    import __spark_entry__ as entry_mod
    from airflow_retail_etl_spark.session import get_spark
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(f"job_profile_{name}")
        .config("spark.master", f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    spark = builder.getOrCreate()
    from airflow_retail_etl_spark.session import configure

    configure(spark)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    spark.sparkContext.setLogLevel("ERROR")
    queries = dict(entry_mod.queries())
    from bench import _production_sketches

    for pname, pfn in _production_sketches().items():
        queries[pname] = pfn
    fn = queries[name]
    if not cold:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    from bench import _drop_persistent_blocks

    _drop_persistent_blocks(spark)
    sc = spark.sparkContext
    t0 = time.time()
    marker_before = sc.uiWebUrl  # no-op touch
    lo = sc._jsc.sc().dagScheduler().nextJobId()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    total = time.time() - t0
    hi = sc._jsc.sc().dagScheduler().nextJobId()
    sc._jsc.sc().listenerBus().waitUntilEmpty()
    app_id = sc.applicationId
    spark.stop()

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    import glob as _glob
    import io as _io

    cands = _glob.glob(os.path.join(evdir, f"*{app_id}*"))
    path = cands[0]
    if os.path.isdir(path):  # rolling event log v2 layout
        evs = sorted(_glob.glob(os.path.join(path, "events_*")))
        path = evs[0]
    if path.endswith(".zstd"):
        import zstandard

        fh = _io.TextIOWrapper(
            zstandard.ZstdDecompressor().stream_reader(open(path, "rb"))
        )
    else:
        fh = open(path)
    for line in fh:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "t0": ev["Submission Time"],
                "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )[:60],
                "callsite": (ev.get("Properties") or {}).get(
                    "callSite.short", ""
                ),
            }
        elif e == "SparkListenerJobEnd":
            jid = ev["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "tasks": si["Number of Tasks"],
                "name": si["Stage Name"][:50],
                "ms": si.get("Completion Time", 0)
                - si.get("Submission Time", 0),
            } | stages.get(si["Stage ID"], {})
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            ti = ev.get("Task Info") or {}
            agg = stages.setdefault(sid, {})
            agg["run_ms"] = agg.get("run_ms", 0) + m.get(
                "Executor Run Time", 0
            )
            agg["deser_ms"] = agg.get("deser_ms", 0) + m.get(
                "Executor Deserialize Time", 0
            )
            agg["gc_ms"] = agg.get("gc_ms", 0) + m.get("JVM GC Time", 0)
            dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            agg["max_task_ms"] = max(agg.get("max_task_ms", 0), dur)
    print(f"# query={name} total={total:.3f}s jobs {lo}..{hi - 1}")
    tsum = 0.0
    for jid in sorted(jobs):
        if not (lo <= jid < hi):
            continue
        j = jobs[jid]
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
        tsum += dur
        ss = [
            (sid, stages.get(sid))
            for sid in j["stages"]
            if stages.get(sid)
        ]
        sdesc = " ".join(
            f"s{sid}:{s.get('tasks', '?')}t/{s.get('ms', 0)}ms"
            f"(run{s.get('run_ms', 0)} deser{s.get('deser_ms', 0)}"
            f" gc{s.get('gc_ms', 0)} max{s.get('max_task_ms', 0)}"
            f" {s.get('name', '')[:28]})"
            for sid, s in ss
        )
        print(
            f"job {jid:4d} {dur:7.3f}s  {j['callsite'] or j['desc']:35s} {sdesc}"
        )
    print(f"# sum(job durations)={tsum:.3f}s of total {total:.3f}s")


if __name__ == "__main__":
    main()
