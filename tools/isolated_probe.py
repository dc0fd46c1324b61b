"""Fresh-JVM single-query probe (round-9 verdict item 3).

THE probe-noise root cause (found round 10, after heap size, GC logs,
and tmpfs shuffle dirs were all ruled out): LAZY JVM HEAP COMMIT. With
a plain ``--driver-memory 48g`` (i.e. -Xmx48g, default -Xms), the heap
grows on demand, and the kernel zeroes every newly committed page
INSIDE the timed window — a slow run burns 31.5% of all 32 CPUs in
system time vs 2.6% in a fast one (measured via /proc/stat around two
probes), producing a bimodal 12-88 s band for the identical pagerank
sf1 plan, degrading PROGRESSIVELY across iterations (2.4→2.1→1.8 s in
a fast run, 11.4→20.4→97.8 s in a slow one — allocation pressure keeps
tripping expansion). Fix: ``-Xms = -Xmx`` plus ``-XX:+AlwaysPreTouch``,
which moves the entire commit+zero cost to JVM startup (untimed;
~45 s wall for 48 GB). Measured after the fix: pagerank sf1
12.2-13.2 s (48g) / 11.4-13.1 s (24g) across fresh JVMs — the old
14-88 s band collapses to ±8%. Keep 48g: span_excise sf1 needs the
shuffle headroom (177 s at 24g vs its 20-85 s at 48g).

This probe still does exactly ONE timed run per JVM (after a small-sf
JIT warm-up) and exits — in-JVM repeats accumulate checkpointed blocks
and re-trip heap growth on un-pretouched heaps, and a fresh JVM is the
only state an operator can reproduce. tools/scaling_curve.py runs it
twice per tier in separate processes (cold_sec / sec).

Usage: python tools/isolated_probe.py <query> <sf_dir> [--twice]
                                      [--registry-form]
Prints one JSON line: {"query", "sf_dir", "form", "sec"} — with
``--twice`` also {"sec_first", "sec_second", "cold_tax_ratio"}: the same
plan executed a second time in the SAME JVM, separating cold-JIT/codegen
cost from steady-state work (read sec_second as the warm floor).

The probe times the PRODUCTION form (bench._production_sketches
override) when one exists, matching what the scaling curve times;
``--registry-form`` opts back into the md5/oracle registry form. Round
10's "span_excise isolated-cold 260-296 s vs 59.5 s in-curve" was mostly
THIS form gap (md5 + uncapped vs xxhash64 + cap), not a cold-JIT tax.
Run it standalone to re-probe any registry query that looks like a
regression inside a long-lived session before believing the number.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _probe_env import ensure_pretouch_args  # noqa: E402  (shared guard)

ensure_pretouch_args("isolated_probe")


def main() -> None:
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    twice = "--twice" in flags
    query, sf_dir = args[0], args[1]
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
    # probe the PRODUCTION form by default — the same override set the
    # scaling curve times — so isolated numbers are comparable to curve
    # numbers. Round 10 recorded span_excise sf1 "isolated-cold
    # 260-296 s vs 59.5 s in-curve" as a cold-JIT tax; most of that gap
    # was FORM conflation: the probe ran the registry oracle form (md5
    # anchor hashing, uncapped doc frequency) against the curve's
    # xxhash64 + max_doc_freq=200 production form. --registry-form
    # opts back into the oracle form when that is what needs re-timing.
    queries = dict(entry_mod.queries())
    form = "registry"
    if "--registry-form" not in flags:
        from bench import _production_sketches

        prod = _production_sketches()
        if query in prod:
            queries[query] = prod[query]
            form = "production"
    fn = queries[query]
    # JIT warm-up at the smallest sf (same protocol as the curve)
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    rec = {
        "query": query,
        "sf_dir": sf_dir,
        "form": form,
        "sec": round(time.time() - t0, 3),
    }
    if twice:
        # --twice: quantify the cold-JIT/codegen tax of THIS plan shape
        # at THIS sf — the small-sf warm-up above compiles the stages it
        # reaches, but a different sf can take different (AQE) stage
        # shapes, so first-vs-second inside one JVM isolates compile +
        # first-touch cost from steady-state work (round-10 verdict 3b).
        # Caveat from the module docstring stands: the second run sees
        # residual state (checkpointed blocks, warmed allocator), so
        # read sec_second as the warm FLOOR, not the reproducible number.
        t1 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        rec["sec_first"] = rec["sec"]
        rec["sec_second"] = round(time.time() - t1, 3)
        rec["cold_tax_ratio"] = round(
            rec["sec_first"] / max(rec["sec_second"], 1e-9), 3
        )
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
