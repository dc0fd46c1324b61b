"""Synthesize an sf1-equivalent dataset (10× sf0.1) for scaling probes.

The driver testdata stops at sf0.1; the quadratic-risk families (banded
LSH, semdedup, IVF-PQ, iterative graph) need one more decade to show
whether their bucket/cluster caps actually hold. This generator shards
sf0.1 ten times with Spark-native, deterministic transforms chosen to
PRESERVE the workload's statistical shape instead of naively duplicating
rows (which would create a 10-way exact-dup clique for every document
and measure a pathology, not scale):

- documents: shard 0 verbatim; shard s>0 suffixes every token with
  ``x{s}`` — within-shard shingle/dup structure is byte-identical to the
  original corpus, cross-shard shingle overlap is zero. Total docs 10×,
  dup RATE unchanged: exactly what a bigger crawl looks like to LSH.
- embeddings: vec_id offset per shard; every component shifted by
  ``10·s`` so each shard keeps the original cluster geometry but shards
  are far apart — corpus 10×, local density unchanged.
- lineitem/supplier: all join keys offset per shard → ten disjoint
  copies of the supplier–part graph (pagerank's iteration count is
  unchanged; per-round join volume is 10×).
- events: event_id/user_id offset per shard → 10× events, same per-user
  session/temporal profile.
- region/nation/customer/part/orders: copied verbatim (dimension-sized;
  the probes don't scale on them).

Output: .scale_data/sf1/<table>.parquet under the repo root (gitignored
— regenerate on demand). Usage: python tools/gen_scale.py [out_dir]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F

from airflow_retail_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
SHARDS = 10
OFF = 100_000_000


def _sharded(df: DataFrame, build_one) -> DataFrame:
    out = None
    for s in range(SHARDS):
        part = build_one(df, s)
        out = part if out is None else out.unionByName(part)
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / ".scale_data" / "sf1"
    )
    os.makedirs(out_dir, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="gen_scale", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def docs_one(df, s):
        text = F.col("text") if s == 0 else F.regexp_replace(
            "text", r"(\S+)", rf"$1x{s}"
        )
        return df.select(
            (F.col("doc_id") + F.lit(s * OFF)).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
        ).withColumn("n_chars", F.length("text"))

    def emb_one(df, s):
        shift = F.lit(float(10 * s))
        return df.select(
            (F.col("vec_id") + F.lit(s * OFF)).alias("vec_id"),
            F.transform("embedding", lambda x: (x + shift).cast("float"))
            .alias("embedding"),
            "label",
        )

    def li_one(df, s):
        return df.select(
            (F.col("l_orderkey") + F.lit(s * OFF)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(s * OFF)).alias("l_partkey"),
            (F.col("l_suppkey") + F.lit(s * OFF)).alias("l_suppkey"),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
        )

    def supp_one(df, s):
        return df.select(
            (F.col("s_suppkey") + F.lit(s * OFF)).alias("s_suppkey"),
            F.concat("s_name", F.lit(f"#{s}")).alias("s_name"),
            "s_nationkey", "s_acctbal",
        )

    def ev_one(df, s):
        return df.select(
            (F.col("event_id") + F.lit(s * OFF)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(s * OFF)).alias("user_id"),
            "event_type", "value", "props",
        )

    plans = {
        "documents": docs_one,
        "embeddings": emb_one,
        "lineitem": li_one,
        "supplier": supp_one,
        "events": ev_one,
    }
    for name, fn in plans.items():
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        _sharded(src, fn).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"wrote {name}", flush=True)
    for name in ("region", "nation", "customer", "part", "orders"):
        spark.read.parquet(f"{SRC}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
        print(f"copied {name}", flush=True)
    # materialize partsupp from the sharded lineitem with the SAME
    # derivation queries use when the file is absent (statistics
    # consistent with lineitem by construction); its presence flips
    # sources.tables.partsupp to the file-backed read path. On a re-run
    # the file already exists, and partsupp() would take the file-backed
    # READ of the very path we are about to overwrite — Spark refuses to
    # overwrite an input path (or corrupts it mid-delete) — so drop the
    # stale file first to force the derivation branch (round-9 advice).
    import shutil

    from airflow_retail_etl_spark.sources.tables import partsupp

    ps_path = f"{out_dir}/partsupp.parquet"
    if os.path.exists(ps_path):
        shutil.rmtree(ps_path)
    partsupp(spark, out_dir).write.mode("overwrite").parquet(ps_path)
    print("wrote partsupp", flush=True)
    print(f"done: {out_dir}", flush=True)


if __name__ == "__main__":
    main()
