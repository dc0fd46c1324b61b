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


def _require_batches(batches: Sequence[DataFrame], fn: str) -> None:
    """Fail fast on an empty replay. Every ``replay_*`` helper folds
    with a ``None``-seeded accumulator; zero batches would otherwise
    surface as an ``AttributeError`` deep inside the state fold instead
    of naming the actual mistake (round-12 advice)."""
    if not batches:
        raise ValueError(f"{fn}: empty batches — nothing to replay")


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
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
) -> None:
    """Admit one micro-batch of documents against the persisted LSH index.

    Survivors (docs near-duplicating neither the indexed corpus nor a
    smaller-id batch sibling) land under ``out_path``; their band rows
    and shingle sets land under ``index_path`` (``bands/`` partitioned
    by band — directory-level pruning for any band-filtered read — plus
    ``shingles/``, one row per doc) so the NEXT batch sees them. Batch
    work scales with the batch (dedup.incremental_lsh_dedup).

    IDEMPOTENT PER BATCH: foreachBatch is at-least-once, so every write
    is a dynamic partition OVERWRITE keyed by ``batch_id`` — a replayed
    batch rewrites its own partitions instead of appending duplicates —
    and the index reads EXCLUDE the current batch_id (partition-pruned),
    so a crash that indexed this batch before checkpointing cannot make
    the replay self-match and drop its own docs. Replay therefore
    recomputes the identical survivor set and the rewrite is a no-op:
    effectively exactly-once output on top of at-least-once delivery.
    """
    from airflow_retail_etl_spark.operators import dedup

    if batch.isEmpty():
        return
    spark = batch.sparkSession
    bands = _read_history(spark, f"{index_path}/bands")
    shingles = _read_history(spark, f"{index_path}/shingles")
    if bands is None or shingles is None:
        # bootstrap: empty index with the correct schema (first batch
        # self-dedups through the same LSH path as every later one)
        bands = dedup.minhash_band_index(batch.limit(0), text_col, id_col)
        shingles = dedup.shingle_store(batch.limit(0), text_col, id_col)
    else:
        bands = bands.filter(F.col("batch_id") != batch_id).select(
            "id", "band", "bucket"
        )
        shingles = shingles.filter(F.col("batch_id") != batch_id).select(
            "id", "shingles"
        )
    # sign the batch ONCE (the expensive pass: shingle explode + 63-hash
    # min-agg) and pin it; the dedup, the survivor write, and the index
    # writes are all cheap derivations off this one materialization
    sigs = dedup.minhash_signatures(
        batch, text_col, id_col, num_hashes=63
    ).localCheckpoint(eager=True)
    survivors = dedup.incremental_lsh_dedup(
        bands,
        batch,
        text_col,
        id_col,
        min_jaccard=min_jaccard,
        index_shingles=shingles,
        incoming_sigs=sigs,
    ).localCheckpoint(eager=True)
    surv_ids = survivors.select(F.col(id_col).alias("id"))
    surv_bands = dedup.band_rows(sigs).join(surv_ids, "id", "left_semi")
    surv_shingles = sigs.select("id", "shingles").join(
        surv_ids, "id", "left_semi"
    )
    bid = F.lit(batch_id).cast("long")

    def _overwrite(df: DataFrame, path: str, *partition_cols: str) -> None:
        (
            df.withColumn("batch_id", bid)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols, "batch_id")
            .parquet(path)
        )

    _overwrite(survivors, out_path)
    _overwrite(surv_bands, f"{index_path}/bands", "band")
    _overwrite(surv_shingles, f"{index_path}/shingles")


def compact_index(
    spark: SparkSession,
    index_path: str,
    *,
    compacted_batch_id: int = -1,
) -> None:
    """Maintenance compaction for the persisted LSH admission index.

    Every admitted batch adds one ``batch_id`` partition per band (21
    bands × N batches of small files); long-running admission therefore
    accumulates exactly the small-file pathology ``io.compact_partitions``
    exists for. This folds ALL batch partitions into a single
    ``batch_id=compacted_batch_id`` layout (one file per band partition;
    shingles into one partition), shrinking both file count and the
    partition listing the per-batch index read must prune.

    RUN BETWEEN STREAM RUNS (like any table-maintenance job): the
    per-batch idempotence scheme replays a crashed batch by excluding its
    own ``batch_id`` from the index read — rows folded into the
    compacted id would escape that exclusion. A cleanly stopped stream
    has committed its last batch, so nothing can replay; the default
    ``-1`` sits below every real foreachBatch id by construction.
    """
    from airflow_retail_etl_spark.io import promote_staging

    for sub, parts in (("bands", ["band"]), ("shingles", [])):
        path = f"{index_path}/{sub}"
        df = _read_history(spark, path)
        if df is None:
            continue
        folded = df.drop("batch_id").withColumn(
            "batch_id", F.lit(compacted_batch_id).cast("long")
        )
        # stage-to-temp-then-swap (promote_staging), never overwrite the
        # path being read in place: the old cache()+overwrite approach
        # could recompute from partially-deleted input if cached blocks
        # were evicted mid-write, and a crash mid-overwrite destroyed the
        # admission index with no backup. The staged write also makes the
        # old batch_id partitions disappear by construction (fresh dir) —
        # no static-overwrite-mode override needed.
        staging = f"{path}__staging"
        (
            folded.repartition(*[F.col(c) for c in (*parts, "batch_id")])
            .write.mode("overwrite")
            .partitionBy(*parts, "batch_id")
            .parquet(staging)
        )
        promote_staging(spark, staging, path)


def replay_admission(
    batches: Sequence[DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_jaccard: float = 0.5,
    hash: str = "xxhash64",
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Replay ordered document batches through incremental LSH admission,
    entirely as DataFrames — the batch face of dedup_stream_sink.

    Exactly the per-micro-batch logic admit_doc_batch runs (empty typed
    index bootstrap, incremental_lsh_dedup per batch, survivors' band +
    shingle rows feeding the next batch) with the parquet store replaced
    by accumulating DataFrames, so the admission SEMANTICS — drop on a
    verified match with any previously admitted doc or a smaller-id
    batch sibling — are testable and oracle-checkable without a
    checkpoint directory. Each batch is SIGNED ONCE (the expensive
    shingle-explode + 63-hash min-agg) into an eager localCheckpoint,
    and its admission VERDICT (the drop-id set — kilobytes) into a
    second; the admitted rows and the next-batch band/shingle index
    rows are all cheap anti/semi joins off those two materializations
    (checkpointing full survivor documents instead re-writes every
    batch's text for no extra pinning). The fold is inherently
    sequential (batch N's index depends on N−1's survivors), and
    without the pinning every later batch's plan re-shingles ALL prior
    survivors through the accumulated union's lineage — quadratic in
    batches (measured 11.1 s → 8.5 s at sf0.1 even at just 3 batches;
    the gap widens with batch count).

    Only the VERDICTS are sequential: each batch's SIGNING pass is a
    pure function of that batch alone, so all signing checkpoints are
    submitted CONCURRENTLY from a small driver thread pool before the
    fold starts (round 16, guide §2.6 "overlap independent jobs" —
    Spark's scheduler back-fills executors across jobs, and the
    per-job driver gaps, 40-50% of this query's wall at sf0.1, overlap
    instead of serializing; the fold previously alternated
    sign→verdict→sign→verdict through ~57 strictly sequential jobs).
    Values are unchanged — each checkpoint materializes the identical
    per-batch frame; ``pyspark.inheritable_thread_target`` carries the
    caller's job group/description onto the pool threads so bench job
    accounting still sees these jobs.
    Returns the admitted union in arrival order.
    """
    _require_batches(batches, "replay_admission")
    from airflow_retail_etl_spark.operators import dedup

    first = batches[0]
    bands = dedup.minhash_band_index(
        first.limit(0), text_col, id_col, hash=hash
    )
    shingles = dedup.shingle_store(first.limit(0), text_col, id_col)
    sigs_lazy = [
        dedup.minhash_signatures(
            b, text_col, id_col, num_hashes=63, hash=hash
        )
        for b in batches
    ]
    if len(sigs_lazy) > 1:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        # session form: clones the caller's job group/description (and
        # tags) at WRAP time — i.e. here, inside the timed window — so
        # bench job accounting attributes the pool's jobs to this query
        @inheritable_thread_target(first.sparkSession)
        def _pin(s: DataFrame) -> DataFrame:
            return s.localCheckpoint(eager=True)

        # 3 concurrent signing jobs is plenty (guide §2.6): enough to
        # fill each other's driver gaps and stage tails, not so many
        # that they fight for executor slots
        with ThreadPoolExecutor(
            max_workers=min(3, len(sigs_lazy))
        ) as pool:
            sigs_pinned = list(pool.map(_pin, sigs_lazy))
    else:
        sigs_pinned = [sigs_lazy[0].localCheckpoint(eager=True)]
    admitted: DataFrame | None = None
    for b, sigs in zip(batches, sigs_pinned):
        drops = dedup.incremental_lsh_dedup(
            bands,
            b,
            text_col,
            id_col,
            min_jaccard=min_jaccard,
            hash=hash,
            max_bucket_size=max_bucket_size,
            index_shingles=shingles,
            incoming_sigs=sigs,
            return_drops=True,
        ).localCheckpoint(eager=True)
        surv = b.join(
            drops, b[id_col] == drops["drop_id"], "left_anti"
        )
        admitted = surv if admitted is None else admitted.unionByName(surv)
        surv_ids = sigs.select("id").join(
            drops, F.col("id") == drops["drop_id"], "left_anti"
        )
        bands = bands.unionByName(
            dedup.band_rows(sigs, hash=hash).join(surv_ids, "id", "left_semi")
        )
        shingles = shingles.unionByName(
            sigs.select("id", "shingles").join(surv_ids, "id", "left_semi")
        )
    return admitted


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

    The streaming face of incremental corpus dedup: checkpointed
    micro-batches, each admitted with the SAME operator the batch path
    uses, and each batch's writes idempotent per batch_id (see
    admit_doc_batch) — so the at-least-once foreachBatch contract still
    yields an exactly-once admitted corpus, consistent with its index
    across restarts and replays. Returns the StreamingQuery.
    """

    def _admit(batch: DataFrame, batch_id: int) -> None:
        admit_doc_batch(
            batch,
            index_path=index_path,
            out_path=out_path,
            batch_id=batch_id,
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


# ---------------------------------------------------------------------------
# Streaming sketch state (round 10): per-batch HLL register folds
# ---------------------------------------------------------------------------


def fold_hll_batch(
    batch: DataFrame, state_path: str, col: str, *, p: int = 11
) -> None:
    """Fold one micro-batch into a persisted HLL register store
    (reg, mx) — streaming distinct-count state that never rescans
    delivered data.

    HLL union is MAX per register: idempotent, associative, and
    commutative, so a REPLAYED batch (foreachBatch's at-least-once
    window) cannot change any register — no batch-id bookkeeping is
    needed, unlike the CMS counter sum (linear, NOT idempotent; stream
    a CMS with per-batch-partition overwrite like admit_doc_batch and
    fold partitions with operators.frequency.cms_merge instead). The
    store is ≤ 2^p rows; the read-merge-overwrite cycle pays one eager
    localCheckpoint to cut the read lineage (same contract as
    fold_snapshot_batch). Estimates come from
    cardinality.hll_fold(store) at any time."""
    from airflow_retail_etl_spark.operators import cardinality

    if batch.isEmpty():
        return
    spark = batch.sparkSession
    regs = cardinality.hll_registers(batch, (), col, p=p)
    prior = _read_history(spark, state_path)
    if prior is not None:
        regs = (
            regs.unionByName(prior.select("reg", "mx"))
            .groupBy("reg")
            .agg(F.max("mx").alias("mx"))
        )
    regs.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        state_path
    )


def replay_sketch(
    batches: Sequence[DataFrame], col: str, *, p: int = 11
) -> DataFrame:
    """Replay ordered batches through the HLL state fold, entirely as
    DataFrames — the batch face of fold_hll_batch (the parquet store
    replaced by an accumulating register frame). Because the merge is
    exactly HLL union, the folded estimate is BIT-IDENTICAL to the
    one-shot sketch of the concatenated input — which is what the
    oracle computes, certifying stream ≡ batch cross-engine. Returns
    the hll_fold row of the final state."""
    _require_batches(batches, "replay_sketch")
    from airflow_retail_etl_spark.operators import cardinality

    merged: DataFrame | None = None
    for b in batches:
        regs = cardinality.hll_registers(b, (), col, p=p)
        merged = (
            regs
            if merged is None
            else merged.unionByName(regs)
            .groupBy("reg")
            .agg(F.max("mx").alias("mx"))
        )
    return cardinality.hll_fold(merged, (), p=p)


def fold_cms_batch(
    batch: DataFrame,
    state_path: str,
    col: str,
    *,
    batch_id: int,
    width: int = 1024,
    depth: int = 4,
) -> None:
    """Fold one micro-batch into a persisted CMS cell store — streaming
    FREQUENCY state (the counter twin of :func:`fold_hll_batch`'s
    distinct-count registers).

    CMS counters are LINEAR (sums), so a replayed batch folded into one
    accumulated store would double-count — the opposite failure mode of
    HLL's idempotent MAX. Replay safety therefore comes from the
    admit_doc_batch contract instead: each batch's SPARSE cells
    (operators.frequency.cms_cells, ≤ depth·width rows) land under
    their own ``batch_id=`` partition with dynamic partition OVERWRITE,
    so an at-least-once redelivery rewrites its own partition with
    identical cells (a no-op) rather than appending. Estimates at any
    time: read the store and densify — summing cells ACROSS batch
    partitions is exactly the linear merge, bit-identical to the
    one-shot sketch of everything delivered
    (``frequency.cms_from_cells(spark.read.parquet(state_path))``).
    State is ≤ n_batches · depth·width rows; compact by summing old
    partitions into one when batch count grows past reading comfort.
    """
    from airflow_retail_etl_spark.operators import frequency

    cells = frequency.cms_cells(batch, col, width=width, depth=depth)
    (
        cells.withColumn("batch_id", F.lit(int(batch_id)))
        .repartition(1)  # ≤ depth·width rows — one file per partition
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(state_path)
    )


def replay_cms(
    batches: Sequence[DataFrame], col: str, *, width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Replay ordered batches through the CMS cell fold entirely as
    DataFrames — the batch face of :func:`fold_cms_batch` (the
    partitioned parquet store replaced by a union of per-batch cell
    frames). Because counter sums are exact integers under any
    grouping, the merged sketch is BIT-IDENTICAL to the one-shot
    ``cms_build`` of the concatenated input — which is what the oracle
    computes, certifying stream ≡ batch cross-engine. Returns the
    one-row (counters, width, depth) probe form."""
    _require_batches(batches, "replay_cms")
    from airflow_retail_etl_spark.operators import frequency

    spark = batches[0].sparkSession
    cells: DataFrame | None = None
    for b in batches:
        c = frequency.cms_cells(b, col, width=width, depth=depth)
        cells = c if cells is None else cells.unionByName(c)
    return frequency.cms_from_cells(spark, cells, width=width, depth=depth)


def fold_qsketch_batch(
    batch: DataFrame,
    state_path: str,
    value_col: str,
    key_col: str,
    *,
    batch_id: int,
    cap: int = 2048,
) -> None:
    """Fold one micro-batch into a persisted quantile-sketch state store
    — streaming QUANTILE state (the third face: :func:`fold_hll_batch`
    holds distinct-count registers, :func:`fold_cms_batch` frequency
    counters, this one holds operators.qsketch level-sample rows).

    Each batch's state (qsketch_state: ≤ ~cap rows, a pure function of
    the batch) lands under its own ``batch_id=`` partition with dynamic
    partition OVERWRITE, so an at-least-once redelivery rewrites its
    own partition with identical rows — a no-op, like the CMS cells.
    Estimates at any time: read the store, requantize to cap, read the
    sample (``qsketch.sample_quantiles(qsketch.requantize(
    spark.read.parquet(state_path).drop("batch_id"), (), cap=cap),
    (), qs)``) — bit-identical to the one-shot sketch of everything
    delivered, because merged-then-requantized states equal the
    one-shot survivor set exactly (qsketch module docstring). State is
    ≤ n_batches · cap rows; compact by requantizing old partitions into
    one when batch count grows past reading comfort (the result is
    again valid state: survivors at the merged threshold with
    thr = lvl_used)."""
    from airflow_retail_etl_spark.operators import qsketch

    state = qsketch.qsketch_state(batch, (), value_col, key_col, cap=cap)
    (
        state.withColumn("batch_id", F.lit(int(batch_id)))
        .repartition(1)  # ≤ ~cap rows — one file per partition
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(state_path)
    )


def replay_qsketch(
    batches: Sequence[DataFrame],
    value_col: str,
    key_col: str,
    qs: Sequence[float],
    *,
    cap: int = 2048,
) -> DataFrame:
    """Replay ordered batches through the quantile-sketch state fold
    entirely as DataFrames — the batch face of
    :func:`fold_qsketch_batch` (the partitioned parquet store replaced
    by a union of per-batch state frames). Because merged states
    re-thresholded to cap equal the one-shot sketch of the concatenated
    input EXACTLY (qsketch module docstring), the folded estimates are
    BIT-IDENTICAL to the one-shot form — which is what the oracle
    computes, certifying stream ≡ batch cross-engine. Returns the
    (q, lvl_used, n_kept, quantile) estimate rows."""
    _require_batches(batches, "replay_qsketch")
    from airflow_retail_etl_spark.operators import qsketch

    state: DataFrame | None = None
    for b in batches:
        s = qsketch.qsketch_state(b, (), value_col, key_col, cap=cap)
        state = s if state is None else state.unionByName(s)
    # ≤ batches·cap rows whose lineage holds every batch's level pass;
    # requantize + the estimate windows reuse it — materialize once
    # (A/B-measured: streaming_quantiles 4.54 → 3.67 s warm at sf0.1;
    # the query's oracle-grade audit legs keep the remainder)
    state = state.localCheckpoint(eager=True)
    surv = qsketch.requantize(state, (), cap=cap)
    return qsketch.sample_quantiles(surv, (), qs)


def fold_sample_batch(
    batch: DataFrame, state_path: str, col: str, *, k: int,
    seed: str = "",
) -> None:
    """Fold one micro-batch into a persisted uniform-sample store
    (h, v) — streaming SAMPLE state (the fourth face:
    :func:`fold_hll_batch` holds distinct-count registers,
    :func:`fold_cms_batch` frequency counters, :func:`fold_qsketch_batch`
    quantile level-samples, this one holds operators.sampling bottom-k
    sample rows).

    The bottom-k merge is an order statistic — idempotent, associative,
    commutative — so like the HLL registers (and unlike the CMS
    counters) a REPLAYED batch cannot change the state: no batch-id
    bookkeeping. The store is ≤ k rows; the read-merge-overwrite cycle
    pays one eager localCheckpoint to cut the read lineage (same
    contract as fold_hll_batch). Read the sample at any time via
    ``sampling.sample_read(spark.read.parquet(state_path), (), k=k)``
    — bit-identical to the one-shot bottom-k of everything delivered.
    """
    from airflow_retail_etl_spark.operators import sampling

    if batch.isEmpty():
        return
    spark = batch.sparkSession
    state = sampling.sample_state(batch, (), col, k=k, seed=seed)
    prior = _read_history(spark, state_path)
    if prior is not None:
        state = sampling.sample_fold(
            state.unionByName(prior.select("h", "v")), (), k=k
        )
    state.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        state_path
    )


def replay_sample(
    batches: Sequence[DataFrame], col: str, *, k: int, seed: str = "",
) -> DataFrame:
    """Replay ordered batches through the sample-state fold entirely as
    DataFrames — the batch face of :func:`fold_sample_batch` (the
    parquet store replaced by an accumulating state frame). Because the
    bottom-k merge equals the one-shot bottom-k of the concatenated
    input EXACTLY (operators.sampling.sample_state docstring), the
    folded sample is BIT-IDENTICAL to the one-shot form — which is what
    the oracle computes, certifying stream ≡ batch cross-engine.
    Returns the sample_read rows (rk, v, n_kept, threshold, estimate)
    of the final state."""
    _require_batches(batches, "replay_sample")
    from airflow_retail_etl_spark.operators import sampling

    state: DataFrame | None = None
    for b in batches:
        s = sampling.sample_state(b, (), col, k=k, seed=seed)
        state = (
            s
            if state is None
            else sampling.sample_fold(state.unionByName(s), (), k=k)
        )
    return sampling.sample_read(state, (), k=k)


def fold_kpi_batch(
    batch: DataFrame,
    state_path: str,
    keys: Sequence[str],
    *,
    batch_id: int,
    date_col: str = "event_date",
    type_col: str = "event_type",
    revenue_col: str = "price",
    view_value: str = "view",
    cart_value: str = "cart",
    purchase_value: str = "purchase",
) -> None:
    """Fold one micro-batch into a persisted additive-KPI cell store —
    streaming MART state (operators.mart_state generalizes the sketch
    stores to exact relational aggregates; this is its streaming face).

    KPI cells are LINEAR (exact DECIMAL cent sums + counts), so — like
    the CMS counters and unlike HLL's idempotent MAX — a replayed batch
    folded into one accumulated store would double-count. Replay safety
    is therefore the :func:`fold_cms_batch` pattern: each batch's cells
    land under their own ``batch_id=`` partition with dynamic partition
    OVERWRITE, so an at-least-once redelivery rewrites identical rows
    (cells are a pure function of the batch). Read the mart at any time
    by folding the store across batch partitions
    (``mart_state.kpi_fold(spark.read.parquet(state_path), keys)``) —
    bit-identical to the one-shot aggregate of everything delivered.
    The distinct-user half streams via :func:`fold_hll_batch`, whose
    registers ``mart_state.kpi_read`` joins at read time.
    """
    from airflow_retail_etl_spark.operators import mart_state

    cells = mart_state.kpi_cells(
        batch,
        list(keys),
        date_col=date_col,
        type_col=type_col,
        revenue_col=revenue_col,
        view_value=view_value,
        cart_value=cart_value,
        purchase_value=purchase_value,
    )
    (
        cells.withColumn("batch_id", F.lit(int(batch_id)))
        .repartition(1)  # grain × days-per-batch rows — one file
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(state_path)
    )


def replay_kpi(
    batches: Sequence[DataFrame],
    keys: Sequence[str],
    *,
    date_col: str = "event_date",
    type_col: str = "event_type",
    revenue_col: str = "price",
    view_value: str = "view",
    cart_value: str = "cart",
    purchase_value: str = "purchase",
) -> DataFrame:
    """Replay ordered batches through the KPI cell fold entirely as
    DataFrames — the batch face of :func:`fold_kpi_batch` (the
    partitioned parquet store replaced by a union of per-batch cell
    frames). Because cent sums and counts are exact under any grouping,
    the folded mart is BIT-IDENTICAL to the one-shot aggregate of the
    concatenated input — which is what the oracle computes, certifying
    stream ≡ batch cross-engine. Returns cells folded to
    ``keys + [date_col]`` grain (the mart's state grain)."""
    _require_batches(batches, "replay_kpi")
    from airflow_retail_etl_spark.operators import mart_state

    cells: DataFrame | None = None
    for b in batches:
        c = mart_state.kpi_cells(
            b,
            list(keys),
            date_col=date_col,
            type_col=type_col,
            revenue_col=revenue_col,
            view_value=view_value,
            cart_value=cart_value,
            purchase_value=purchase_value,
        )
        cells = c if cells is None else cells.unionByName(c)
    return mart_state.kpi_fold(cells, [*keys, date_col])


def replay_moment(
    batches: Sequence[DataFrame],
    keys: Sequence[str],
    value_col: str,
    *,
    date_col: str = "event_date",
    dp: int = 2,
) -> DataFrame:
    """Replay ordered batches through the moment-cell fold entirely as
    DataFrames — the batch face of :func:`fold_moment_batch` (the
    partitioned parquet store replaced by a union of per-batch cell
    frames), completing the stream ≡ batch replay set: every mergeable
    state face (HLL, CMS, qsketch, sample, KPI cells, moment cells) now
    has both a store fold and a DataFrame replay. Moment sums are
    LINEAR exact DECIMALs, so the folded state is BIT-IDENTICAL to the
    one-shot per-day aggregate of everything delivered — which is what
    the oracle computes. Returns cells folded to ``keys + [date_col]``
    grain."""
    _require_batches(batches, "replay_moment")
    from airflow_retail_etl_spark.operators import mart_state

    cells: DataFrame | None = None
    for b in batches:
        c = mart_state.moment_cells(
            b, list(keys), value_col, date_col=date_col, dp=dp
        )
        cells = c if cells is None else cells.unionByName(c)
    return mart_state.moment_fold(cells, [*keys, date_col], dp=dp)


def fold_moment_batch(
    batch: DataFrame,
    state_path: str,
    keys: Sequence[str],
    value_col: str,
    *,
    batch_id: int,
    date_col: str = "event_date",
    dp: int = 2,
) -> None:
    """Fold one micro-batch into a persisted moment-cell store — the
    streaming face of ``mart_state.moment_cells`` (univariate
    statistics from (n, Σx, Σx²) state). Moment sums are LINEAR, so
    replay safety is the :func:`fold_cms_batch` / :func:`fold_kpi_batch`
    pattern: per-``batch_id`` dynamic partition OVERWRITE (cells are a
    pure function of the batch — redelivery rewrites identical rows).
    Read statistics any time via ``mart_state.moment_read`` over the
    store folded across batch partitions — exact, so stream ≡ batch."""
    from airflow_retail_etl_spark.operators import mart_state

    cells = mart_state.moment_cells(
        batch, list(keys), value_col, date_col=date_col, dp=dp
    )
    (
        cells.withColumn("batch_id", F.lit(int(batch_id)))
        .repartition(1)
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(state_path)
    )


def fold_decayed_batch(
    batch: DataFrame,
    state_path: str,
    value_col: str,
    *,
    batch_id: int,
    lam: float,
    date_col: str = "event_date",
    dp: int = 6,
) -> None:
    """Fold one micro-batch into a persisted DECAYED-read store — the
    streaming face of ``mart_state.decayed_read``'s O(1) incremental
    law (``decayed(D+g) = decayed(D)·λ^g + S``), completing the state
    family: the sixth mergeable face (HLL, CMS, qsketch, sample,
    KPI/moment cells, now the decayed scalar) to gain a streaming fold.

    Unlike the linear cell folds, the decayed state is a CARRIED SCALAR
    (one unrounded double per series plus its calendar position), so
    partition N is a pure function of (partition N−1's carry, batch N):
    replay safety is still per-``batch_id`` dynamic partition OVERWRITE
    — an at-least-once redelivery recomputes from the SAME prior carry
    and rewrites identical rows (test-pinned). Each partition holds the
    batch's published (date, n_days, decayed) rows (``is_obs``) plus
    one carry row with the unrounded ``__acc`` (rounding the carry
    would break bit-equality with the one-shot fold). Batch days must
    advance monotonically — ``mart_state.decayed_step`` raises the
    backfill recipe otherwise (late days belong to the permutation-safe
    CELL store, not to a decayed scalar). Read the series any time with
    :func:`read_decayed_store` — bit-identical to decayed_read of
    everything delivered.
    """
    from airflow_retail_etl_spark.operators import mart_state

    spark = batch.sparkSession
    carry = None
    if batch_id > 0:
        prior = _read_history(spark, state_path)
        if prior is not None:
            carry = prior.filter(
                (F.col("batch_id") == int(batch_id) - 1)
                & (~F.col("is_obs"))
            ).select("__lo", "__last", "__acc")
            if carry.isEmpty():  # empty-store prefix (no days yet)
                carry = None
    cells = batch.filter(F.col(date_col).isNotNull())
    if cells.isEmpty():
        # nothing delivered: rewrite the prior carry under this batch id
        # (pure function of the empty batch — redelivery-idempotent)
        rows = (
            carry.select(
                F.col("__last").alias(date_col),
                F.lit(None).cast("long").alias("n_days"),
                F.lit(None).cast("double").alias("decayed"),
                "__lo",
                "__last",
                "__acc",
                F.lit(False).alias("is_obs"),
            )
            if carry is not None
            else spark.createDataFrame(
                [],
                f"{date_col} date, n_days long, decayed double, "
                "__lo date, __last date, __acc double, is_obs boolean",
            )
        )
    else:
        day_cells = cells.groupBy(date_col).agg(
            F.sum(value_col).alias(value_col)
        )
        out, new_carry = mart_state.decayed_step(
            day_cells, carry, value_col, lam=lam, date_col=date_col, dp=dp
        )
        rows = out.select(
            date_col,
            "n_days",
            "decayed",
            F.lit(None).cast("date").alias("__lo"),
            F.lit(None).cast("date").alias("__last"),
            F.lit(None).cast("double").alias("__acc"),
            F.lit(True).alias("is_obs"),
        ).unionByName(
            new_carry.select(
                F.col("__last").alias(date_col),
                F.lit(None).cast("long").alias("n_days"),
                F.lit(None).cast("double").alias("decayed"),
                "__lo",
                "__last",
                "__acc",
                F.lit(False).alias("is_obs"),
            )
        )
    (
        rows.withColumn("batch_id", F.lit(int(batch_id)))
        .repartition(1)  # ≤ days-per-batch + 1 rows — one file
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(state_path)
    )


def read_decayed_store(spark: SparkSession, state_path: str) -> DataFrame:
    """The decayed series published so far: every batch's observed-day
    rows across partitions (day sets are disjoint — days advance), in
    calendar order. Bit-identical to ``mart_state.decayed_read`` over
    everything delivered (the fold's certificate)."""
    store = spark.read.parquet(state_path)
    return (
        store.filter(F.col("is_obs"))
        .select(store.columns[0], "n_days", "decayed")
        .orderBy(store.columns[0])
    )


def replay_decayed(
    batches: Sequence[DataFrame],
    value_col: str,
    *,
    lam: float,
    date_col: str = "event_date",
    dp: int = 6,
) -> DataFrame:
    """Replay TIME-ORDERED batches through the decayed carry fold
    entirely as DataFrames — the batch face of
    :func:`fold_decayed_batch` (the parquet store replaced by the
    chained 1-row carry frames). Resuming the Horner fold from the
    carried acc is the identical IEEE operation sequence as the
    one-shot fold, so the union of per-batch outputs is BIT-IDENTICAL
    to ``mart_state.decayed_read`` of the concatenated input — which is
    what the oracle computes, certifying stream ≡ batch cross-engine
    for the decayed face. Batches must advance in event time (the
    streaming reality; late days raise the backfill recipe in-plan);
    empty batches are skipped (carry unchanged)."""
    _require_batches(batches, "replay_decayed")
    from airflow_retail_etl_spark.operators import mart_state

    carry: DataFrame | None = None
    outs: list[DataFrame] = []
    for b in batches:
        cells = b.filter(F.col(date_col).isNotNull())
        if cells.isEmpty():
            continue
        day_cells = cells.groupBy(date_col).agg(
            F.sum(value_col).alias(value_col)
        )
        out, carry = mart_state.decayed_step(
            day_cells, carry, value_col, lam=lam, date_col=date_col, dp=dp
        )
        outs.append(out)
    if not outs:
        raise ValueError("replay_decayed: every batch was empty")
    folded = outs[0]
    for o in outs[1:]:
        folded = folded.unionByName(o)
    return folded.orderBy(date_col)
