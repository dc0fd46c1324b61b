"""Component-timing probe for ann_ivf's decade step (round-13 verdict
item 3: sf0.1→sf1 measured ~5.8× across four curves while sibling
ivf_pq steps ~3.1× on the same data — diagnose WHERE the time goes
before touching the plan).

The registry form runs INTEGRITY MODE (n_probe = n_cells = 16, so the
result must equal exact brute force): every query scores every corpus
vector, i.e. |pairs| = |corpus| · |corpus|/50 — the pair count grows
QUADRATICALLY with the decade (sf0.1: 2,000 vectors × 40 queries =
80k pairs; sf1: 20,000 × 400 = 8M pairs, 100×). A sub-quadratic
wall-clock step therefore means fixed overheads still dominate; the
interesting question is which component turns over first.

Components timed (each forced with a noop sink, downstream of an eager
localCheckpoint of its inputs so no stage re-times its predecessor):
  fit_assign  — coarse KMeans fit (+ content-hash fit sample) and the
                broadcast centroid assignment of the corpus
  pair_sim    — cell join + hoisted-cosine similarity over all pairs
  topk_window — the single per-query window (row_number ≤ k) over the
                materialized pair rows
  topk_two_phase — the sampling._two_phase_grouped_trim analog (shard
                by neighbor hash, partial trim, final trim) over the
                SAME pair rows — identical output (strict total order:
                sim desc, neighbor_id asc, ids unique), candidate fix
                if the single window is the bottleneck
  full        — the production ivf_topk end to end (reference number)

Usage: python tools/ann_component_probe.py <sf_dir> [n_probe]
Prints one JSON line. Fresh pretouched JVM per invocation (CLAUDE.md
probe invariant); run per sf_dir and compare steps per component.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _probe_env import ensure_pretouch_args  # noqa: E402

ensure_pretouch_args("ann_component_probe")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_probe = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.operators import similarity
    from airflow_retail_etl_spark.operators.similarity import (
        _fit_coarse_cells,
        _ivf_corpus,
        _probe_cells,
        as_double,
        cosine_hoisted,
        dot,
    )
    from airflow_retail_etl_spark.session import get_spark
    from airflow_retail_etl_spark.sources.tables import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ann_component_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024)
    )
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df) -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # JIT warm-up on the smallest tier (full plan shape, untimed)
    warm = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    similarity.ivf_topk(
        warm, warm.filter(F.col("vec_id") % 50 == 0),
        k=10, n_cells=16, n_probe=16, fit_fraction=0.5,
    ).write.format("noop").mode("overwrite").save()

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    out: dict = {
        "sf_dir": sf_dir,
        "n_vectors": emb.count(),
        "n_queries": queries_df.count(),
        "n_probe": n_probe,
    }

    # -- component 1: fit + assign ------------------------------------
    v = _ivf_corpus(emb, "vec_id", "embedding")
    t0 = time.time()
    assigned, centers_df = _fit_coarse_cells(
        v, n_cells=16, seed=7, fit_fraction=0.5,
        init_mode="random", max_iter=4,
    )
    assigned = assigned.localCheckpoint(eager=True)
    centers_df = centers_df.localCheckpoint(eager=True)
    out["fit_assign"] = round(time.time() - t0, 3)

    # -- component 2: probe + pair similarity -------------------------
    q = queries_df.select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
    ).withColumn("qq", dot(F.col("qv"), F.col("qv")))
    probed = (
        _probe_cells(q, centers_df, n_probe)
        .select("query_id", "qv", "qq", "cell")
        .localCheckpoint(eager=True)
    )
    pairs = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_hoisted(
                F.col("qv"), F.col("cv"), F.col("qq"), F.col("cc")
            ).alias("sim"),
        )
    )
    out["pair_sim"] = noop(pairs)
    mat_pairs = pairs.localCheckpoint(eager=True)
    out["n_pairs"] = mat_pairs.count()

    # -- component 3: single-window top-k over materialized pairs -----
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    single = (
        mat_pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6))
    )
    out["topk_window"] = noop(single)

    # -- component 3b: two-phase sharded trim over the same pairs -----
    shard = F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(32)).cast(
        "int"
    )
    w1 = Window.partitionBy("query_id", "__shard").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    two = (
        mat_pairs.withColumn("__shard", shard)
        .withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= 10)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6))
    )
    out["topk_two_phase"] = noop(two)

    # -- reference: full production form end to end -------------------
    t0 = time.time()
    similarity.ivf_topk(
        emb, queries_df, k=10, n_cells=16, n_probe=n_probe,
        fit_fraction=0.5,
    ).write.format("noop").mode("overwrite").save()
    out["full"] = round(time.time() - t0, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
