"""Span-anchor cap-transition probe one decade past sf1 (round-8 verdict
item 4).

SCALE.md documents the exact-shared-spans family's df²→capped-regime
transition with a proven Σmin(df, cap)² bound; sf1 sits AT the
transition, so whether the capped join's per-decade step has settled
into the linear regime was unmeasured. This probe synthesizes an
sf10-SHAPED documents corpus (100 shards of the sf0.1 corpus with the
gen_scale token-suffix scheme: within-shard span structure byte-identical
to the original, cross-shard k-gram overlap zero — dup RATE preserved,
100× volume) and times shared_span_pairs at sf0.1 / sf1 / sf10 across a
max_doc_freq cap sweep, appending one annotated record to
SCALING_HISTORY.jsonl.

Usage: python tools/span_scale_probe.py  (≈10–20 min; run in isolation —
bench's contamination rule applies to any timing run)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from airflow_retail_etl_spark.session import get_spark

ROOT = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.1"
SF10_DOCS = ROOT / ".scale_data" / "sf10_docs"
OFF = 100_000_000


def _ensure_sf10_docs(spark) -> str:
    out = str(SF10_DOCS / "documents.parquet")
    if os.path.exists(out):
        return str(SF10_DOCS)
    # shards written INCREMENTALLY (append) — a 100-way union in one
    # write buffered 32 tasks of 100x-expanded text and OOM'd the JVM
    src = spark.read.parquet(f"{SRC}/documents.parquet")
    tmp = out + "__staging"
    # a crash mid-build leaves the staging dir; appending 100 MORE
    # shards onto the leftover would rename a 2x corpus with duplicate
    # doc_ids into place and silently skew every sf10 timing — always
    # start from a clean staging dir
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    for s in range(100):
        text = F.col("text") if s == 0 else F.regexp_replace(
            "text", r"(\S+)", rf"$1x{s}"
        )
        src.select(
            (F.col("doc_id") + F.lit(s * OFF)).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text")).write.mode(
            "append"
        ).parquet(tmp)
    os.rename(tmp, out)
    return str(SF10_DOCS)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # bench's contamination gate (round-9 verdict item 5 — all
    # SCALING_HISTORY writers share it); check BEFORE our own driver
    # opens a Spark UI port
    from bench import _contamination_reason, _release_bench_lock

    contaminated = _contamination_reason()
    if contaminated:
        print(
            f"# CONTAMINATED ({contaminated}): probes will print but "
            "SCALING_HISTORY gets nothing",
            file=sys.stderr, flush=True,
        )
    spark = get_spark(
        app_name="span_scale_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024)
    )
    spark.sparkContext.setLogLevel("ERROR")
    from airflow_retail_etl_spark.operators import dedup

    sf10 = _ensure_sf10_docs(spark)
    tiers = [("0.1", SRC), ("1", str(ROOT / ".scale_data" / "sf1")),
             ("10", sf10)]
    caps = [
        int(c)
        for c in os.environ.get("SPAN_PROBE_CAPS", "100,200").split(",")
    ]
    # cap=400 at sf10 is NOT in the default sweep: its shuffle spill
    # exhausted local disk (the Σmin(df,cap)² bound's cap² constant) —
    # see the round-9 span_cap_probe SCALING_HISTORY record
    probes: dict[str, dict] = {}
    for cap in caps:
        sec: dict[str, float] = {}
        pairs: dict[str, int] = {}
        try:
            for sf, d in tiers:
                docs = spark.read.parquet(f"{d}/documents.parquet")
                t0 = time.time()
                # unsafe_large_cap: this probe IS the envelope
                # measurement the guard's ceiling comes from, so it may
                # sweep past SPAN_CAP_SAFE_MAX deliberately
                n = dedup.shared_span_pairs(
                    docs, "text", "doc_id", k=16, min_len=60,
                    hash_family="xxhash64", max_doc_freq=cap,
                    unsafe_large_cap=True,
                ).count()
                sec[sf] = round(time.time() - t0, 3)
                pairs[sf] = int(n)
        except Exception as exc:  # noqa: BLE001 — record partial sweeps
            probes[f"cap={cap}"] = {
                "sec": sec, "pairs": pairs, "dnf": str(exc)[:200],
            }
            print(json.dumps({f"cap={cap}": "DNF"}), flush=True)
            continue
        steps = {
            "0.1->1": round(sec["1"] / sec["0.1"], 2),
            "1->10": round(sec["10"] / sec["1"], 2),
        }
        probes[f"cap={cap}"] = {
            "sec": sec, "pairs": pairs, "step_ratio": steps,
        }
        print(json.dumps({f"cap={cap}": probes[f"cap={cap}"]}), flush=True)
    record = {
        "metric": "span_cap_probe",
        "cpus": int(cpus),
        "probes": probes,
        "notes": (
            "shared_span_pairs (k=16, min_len=60, xxhash64) timed at "
            "sf0.1/sf1/sf10 across a max_doc_freq sweep; sf10 is the "
            "gen_scale token-suffix synthesis (100 shards, dup rate "
            "preserved, zero cross-shard gram overlap). The 1->10 step "
            "is the verdict's question: settled-linear means ~10x or "
            "less per decade at the default cap."
        ),
    }
    if contaminated:
        record["history_append_refused"] = contaminated
        print(json.dumps({"appended": False, "reason": contaminated}),
              flush=True)
    else:
        with open(ROOT / "SCALING_HISTORY.jsonl", "a") as fh:
            fh.write(json.dumps(record) + "\n")
        _release_bench_lock()
        print(json.dumps({"appended": True}), flush=True)


if __name__ == "__main__":
    main()
