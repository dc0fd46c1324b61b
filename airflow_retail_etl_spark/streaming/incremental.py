"""Streaming incremental dimension maintenance (foreachBatch → SCD-2).

The reference's intent is incremental loads; the streaming-first form is
a snapshot feed (one row per key per day) folded into a persistent SCD-2
history as batches arrive. ``foreachBatch`` is the right primitive: the
stream delivers micro-batches exactly once (checkpointed), and each batch
runs the same DataFrame MERGE logic the batch path uses
(operators.scd.scd2_upsert) — no second implementation to drift.

Per batch: the distinct snapshot dates are collected to the driver (a
few DATE values — bounded by days per batch, never data rows), each
date's slice is folded in order, and the new history OVERWRITES the
store after an eager localCheckpoint cuts the read-lineage (you cannot
lazily overwrite the parquet you are reading). History size is dimension
scale × versions, so the rewrite is cheap relative to the fact stream;
at very long histories move the store to a log table format and swap the
overwrite for a MERGE.

Out-of-order DAYS across batches are rejected by scd2_upsert's contract
(batch_date must advance); late rows WITHIN a day are fine — the day's
slice is whatever the feed delivered for that date in this batch.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators.scd import (
    scd2_from_snapshots,
    scd2_upsert,
)


def _read_history(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:  # AnalysisException: path does not exist yet
        return None


def fold_snapshot_batch(
    batch: DataFrame,
    history_path: str,
    keys: Sequence[str],
    attrs: Sequence[str],
    snap_col: str,
) -> None:
    """Fold one micro-batch of dated snapshots into the history store."""
    if batch.isEmpty():
        return
    spark = batch.sparkSession
    dates = sorted(
        r[0] for r in batch.select(snap_col).distinct().collect()
    )
    hist = _read_history(spark, history_path)
    if hist is None:
        first = batch.filter(F.col(snap_col) == dates[0])
        hist = scd2_from_snapshots(first, keys, attrs, snap_col)
        dates = dates[1:]
    for day in dates:
        slice_ = batch.filter(F.col(snap_col) == day).drop(snap_col)
        hist = scd2_upsert(hist, slice_, keys, attrs, F.lit(day))
    hist.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        history_path
    )


def scd2_stream_sink(
    snapshots: DataFrame,
    *,
    history_path: str,
    checkpoint: str,
    keys: Sequence[str],
    attrs: Sequence[str],
    snap_col: str,
    available_now: bool = True,
):
    """Start the snapshot stream folding into an SCD-2 parquet history.

    Returns the StreamingQuery; callers drain with awaitTermination (the
    AvailableNow default reproduces daily-batch semantics)."""

    def _fold(batch: DataFrame, _batch_id: int) -> None:
        fold_snapshot_batch(batch, history_path, keys, attrs, snap_col)

    writer = (
        snapshots.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Streaming corpus admission: foreachBatch → incremental LSH dedup
# ---------------------------------------------------------------------------


def admit_doc_batch(
    batch: DataFrame,
    *,
    index_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
) -> None:
    """Admit one micro-batch of documents against the persisted LSH index.

    Survivors (docs near-duplicating neither the indexed corpus nor a
    smaller-id batch sibling) append to ``out_path``; their band-index
    rows append to ``index_path`` so the NEXT batch sees them. Batch
    work scales with the batch (dedup.incremental_lsh_dedup); the index
    grows by bands rows per admitted doc.
    """
    from airflow_retail_etl_spark.operators import dedup

    if batch.isEmpty():
        return
    spark = batch.sparkSession
    index = _read_history(spark, index_path)
    if index is None:
        survivors = dedup.incremental_dedup(
            batch.limit(0), batch, text_col, id_col, min_jaccard=min_jaccard
        )
    else:
        survivors = dedup.incremental_lsh_dedup(
            index, batch, text_col, id_col, min_jaccard=min_jaccard
        )
    # pin survivors before the two writes so admission evaluates once
    survivors = survivors.localCheckpoint(eager=True)
    survivors.write.mode("append").parquet(out_path)
    dedup.minhash_band_index(survivors, text_col, id_col).write.mode(
        "append"
    ).parquet(index_path)


def dedup_stream_sink(
    docs: DataFrame,
    *,
    index_path: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
    available_now: bool = True,
):
    """Start a document stream deduplicating through the LSH index store.

    The streaming face of incremental corpus dedup: exactly-once
    micro-batches (checkpointed), each admitted with the SAME operator
    the batch path uses — the admitted corpus and its index stay
    consistent across restarts. Returns the StreamingQuery.
    """

    def _admit(batch: DataFrame, _batch_id: int) -> None:
        admit_doc_batch(
            batch,
            index_path=index_path,
            out_path=out_path,
            text_col=text_col,
            id_col=id_col,
            min_jaccard=min_jaccard,
        )

    writer = (
        docs.writeStream.foreachBatch(_admit)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
