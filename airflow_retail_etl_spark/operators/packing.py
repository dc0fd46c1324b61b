"""Sequence packing: chunks → fixed-length training sequences.

The last step of an LLM data pipeline lays tokenized chunks end-to-end and
slices the stream every ``max_tokens`` to form training sequences
("concat-and-chop" packing — maximal utilization, chunk boundaries may
span sequences, exactly like GPT-style pretraining loaders). A global
concatenation order would serialize the corpus through one task, so the
corpus is first split into ``n_buckets`` deterministic hash buckets and
each bucket is packed independently:

- one shuffle (the window exchange on ``bucket``), then a per-bucket sort
  by (doc_id, chunk_id) and a running token sum — all inside a single
  window over that exchange;
- buckets are independent, so parallelism = ``n_buckets``; at 100 TB pick
  buckets so each holds a few hundred MB of tokens (e.g. 1e5 buckets) and
  the window sort never exceeds one task's memory;
- bucket assignment hashes ONLY the doc id (md5-u64 mod, engine-portable),
  so membership is reproducible across runs, layouts, and the DuckDB
  oracle, and all chunks of a doc stay adjacent in one bucket.

Everything is built-in expressions; sequence ids are derived per row from
the running sum — no driver loop, no Python.

Greedy next-fit packing (never split a chunk) needs a sequential scan per
bucket — not window-expressible — and wastes the tail of every sequence;
chop packing is both the scalable and the standard choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions import xhash


def pack_chunks(
    chunks: DataFrame,
    *,
    doc_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_chunk_tokens",
    max_tokens: int = 2048,
    n_buckets: int = 64,
) -> DataFrame:
    """Assign every chunk a (bucket, seq_id, seq_offset) packing address.

    Within a bucket, chunks are laid out in (doc_id, chunk_id) order; a
    chunk whose running start offset is ``p`` lands in sequence
    ``p // max_tokens`` at offset ``p % max_tokens``.  ``spans_boundary``
    marks chunks whose tokens straddle two sequences (the loader splits
    them at read time). Per-bucket token offsets stay well under 2^53, so
    the floor-division arithmetic is exact.
    """
    if max_tokens <= 0 or n_buckets <= 0:
        raise ValueError(f"need positive {max_tokens=} and {n_buckets=}")
    # LONG-domain md5 mod (round 15): bit-identical, no BigDecimal
    bucket = xhash.md5_u64_mod(
        F.col(doc_col).cast("string"), n_buckets
    ).cast("int")
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(doc_col).asc(), F.col(chunk_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col(tokens_col).cast("long")
    cum = F.sum(n).over(w)
    seq = F.floor((cum - n) / F.lit(max_tokens))
    offset = (cum - n) % F.lit(max_tokens)
    last_tok = cum - n + F.greatest(n - 1, F.lit(0))
    return (
        chunks.withColumn("bucket", bucket)
        .select(
            doc_col,
            chunk_col,
            "bucket",
            seq.cast("long").alias("seq_id"),
            offset.cast("int").alias("seq_offset"),
            n.alias("n_tokens"),
            (F.floor(last_tok / F.lit(max_tokens)) > seq).alias(
                "spans_boundary"
            ),
        )
    )


def pack_stats(packed: DataFrame, *, max_tokens: int = 2048) -> DataFrame:
    """Per-sequence utilization: (bucket, seq_id, n_chunks, head_tokens).

    ``head_tokens`` counts tokens that chunks STARTING in this sequence
    place into it (a spanning chunk's tail is carry-in to the next
    sequence, whose row lives here); ``head_fill`` = head_tokens /
    max_tokens. For interior sequences head_fill + carry-in = 1 exactly —
    chop packing leaves waste only in each bucket's final sequence.
    Reuses the bucket exchange of :func:`pack_chunks` when chained.
    """
    head = F.sum(
        F.least(
            F.col("n_tokens"),
            F.lit(max_tokens) - F.col("seq_offset").cast("long"),
        )
    )
    return (
        packed.groupBy("bucket", "seq_id")
        .agg(
            F.count("*").alias("n_chunks"),
            head.alias("head_tokens"),
        )
        .withColumn(
            "head_fill",
            F.round(F.col("head_tokens") / F.lit(max_tokens), 6),
        )
    )


def packing_report(
    packed: DataFrame, *, max_tokens: int, bucket_col: str = "bucket"
) -> DataFrame:
    """Packing-efficiency report: one row per bucket from the
    pack_chunks output — how full the training sequences actually are.

    ``fill_rate`` = total tokens / (sequences × max_tokens); only each
    bucket's LAST sequence can be underfull (concat-and-chop), so low
    fill means too many buckets for the corpus, not packing waste —
    exactly the knob (n_buckets vs corpus tokens) this report tunes.
    One aggregation at the bucket grain; exact integer sums, the ratio
    rounded to 6dp at the end (report grain, never accumulated).
    """
    return (
        packed.groupBy(bucket_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            (F.max("seq_id") + 1).cast("long").alias("n_seqs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(F.col("spans_boundary").cast("long"))
            .cast("long")
            .alias("n_boundary_spans"),
        )
        .withColumn(
            "fill_rate",
            F.round(
                F.col("total_tokens")
                / (F.col("n_seqs") * F.lit(int(max_tokens))),
                6,
            ),
        )
    )
