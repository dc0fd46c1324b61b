"""End-to-end LLM training-corpus pipeline: raw docs → packed sequences.

The flagship composition of the training-data operators, in the order a
production corpus build runs them (cheapest filters first so expensive
stages see the fewest rows):

1. quality gate     — gopher_flags keep (projection)
1b. LM fluency gate — optional unigram cross-entropy threshold
                      (operators/lm.py; off by default)
1c. model gate      — optional logistic-classifier score threshold
                      (operators/classifier.py; off by default —
                      projection, fuses with the other gates)
2. PII redaction    — regex scrub (projection)
3. decontamination  — drop eval-overlapping docs (broadcast probe)
4. exact dedup      — collapse byte-identical copies FIRST (uniform
                      shuffle; also what keeps LSH buckets small)
5. near-dup resolve — MinHash-LSH candidates → exact-Jaccard verify →
                      connected components → keep best-quality doc
6. chunk + pack     — sliding windows → concat-and-chop addresses
7. split            — deterministic 90/5/5 train/val/test by hash
                      (optionally keyed by near-dup CLUSTER id so
                      residual near-dups never straddle splits)

Each stage consumes the previous stage's DataFrame lazily — Catalyst
fuses the projection stages (1, 2, 7 add zero shuffles) — and the whole
build is deterministic: re-running on the same input yields byte-equal
outputs (hash sampling, min-id keepers, quality argmax).

``run_corpus_build`` returns every intermediate so callers can write,
audit, or resume at any stage boundary; ``CorpusStats`` is a one-pass
summary of what each gate dropped (one tiny aggregate per stage — at
100 TB you want the funnel numbers, not a second full pass).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions import pii
from airflow_retail_etl_spark.functions import text as tf
from airflow_retail_etl_spark.operators import chunking, decontam, dedup, packing
from airflow_retail_etl_spark.operators.sampling import _sample_u, threshold_for


@dataclass(frozen=True)
class CorpusConfig:
    text_col: str = "text"
    id_col: str = "doc_id"
    decontam_ngram: int = 13
    neardup_jaccard: float = 0.5
    chunk_size: int = 128
    chunk_overlap: int = 16
    max_tokens: int = 2048
    pack_buckets: int = 64
    train_frac: float = 0.9
    val_frac: float = 0.05
    #: drop docs whose unigram-LM cross-entropy exceeds this (nats/token);
    #: None disables the LM gate (KenLM-style filters typically prune the
    #: top few percent of surprisal)
    lm_nll_max: float | None = None
    #: drop docs the shipped logistic quality model scores below this
    #: (operators/classifier.py DEFAULT_TEXT_* — swap in trained weights
    #: for production); None disables the model gate
    classifier_min_score: float | None = None
    #: draw the train/val/test hash on the near-dup CLUSTER id instead of
    #: the doc id, so residual near-duplicates can never straddle a split
    #: boundary (matters whenever dedup is partial — e.g. a high
    #: neardup_jaccard keeps mild paraphrases in-corpus)
    split_by_cluster: bool = False
    #: excise exact shared substrings >= this many chars from the
    #: later document after near-dup resolution (span-grain dedup: a
    #: quoted paragraph is cut, the quoting doc survives). None disables.
    #: Runs over the SURVIVING corpus, so whole-doc duplicates are
    #: already gone and excision only handles partial inclusions.
    excise_min_span: int | None = None
    #: anchor k-gram length for span excision
    excise_k: int = 16
    #: drop span anchors present in more than this many documents before
    #: the anchor self-join — the boilerplate/stop-phrase skew guard
    #: shared with the jaccard/containment family. The anchor join's cost
    #: is Σ_h freq(h)²: one 16-char license-header k-gram in 10⁵ docs of
    #: a 100 TB crawl otherwise yields 10¹⁰ matches on a single hash key.
    #: A dropped hot anchor can split or shrink a reported span (never
    #: invent one); None disables the cap (exhaustive mode — small
    #: corpora / verification only).
    excise_max_doc_freq: int | None = 200
    #: acknowledge a cap above dedup.SPAN_CAP_SAFE_MAX (=200): the
    #: anchor join's shuffle volume is quadratic in the cap and the sf10
    #: probe DNF'd at cap=400 (SCALE.md span-cap envelope) — without
    #: this, shared_span_pairs refuses oversized caps
    excise_unsafe_large_cap: bool = False
    #: SOFT dedup: replace the hard keep-best-per-cluster resolve with
    #: the 1/cluster_size survivor draw (sampling.inverse_cluster_sample
    #: over the same near-dup components) — each duplicate family
    #: contributes ONE expected survivor, hash-chosen rather than
    #: quality-chosen, preserving benign template variation that hard
    #: dedup collapses. Unbiased in expectation (what mixture arithmetic
    #: downstream needs); combine with split_by_cluster so the survivors
    #: of one family still share a split.
    soft_dedup: bool = False
    #: seed for the soft-dedup survivor draw
    soft_dedup_seed: str = "soft-dedup"
    #: FIM/PSM augmentation rate applied to the TRAIN split only, after
    #: dedup/excision and before chunking (chunking.fim_transform —
    #: val/test stay unpermuted); None disables. The permuted text is a
    #: normalize_text fixed point, so chunk/pack see it verbatim.
    fim_rate: float | None = None
    #: seed for the FIM membership and cut draws
    fim_seed: str = "fim"
    #: seed for the reproducible global shuffle of packed training
    #: sequences (sampling.corpus_shuffle draw over the sequence key);
    #: None disables the shuffle stage. Combine with shuffle_epoch to
    #: re-derive any epoch's order bit-exactly.
    shuffle_seed: str | None = None
    #: epoch folded into the shuffle seed — each epoch an independent
    #: deterministic permutation of the packed sequences
    shuffle_epoch: int = 0


def quality_gate(df: DataFrame, cfg: CorpusConfig) -> DataFrame:
    flags = tf.gopher_flags(F.col(cfg.text_col))
    return df.filter(flags["keep"])


def lm_gate(df: DataFrame, cfg: CorpusConfig) -> DataFrame:
    """Optional fluency gate: drop docs whose self-corpus unigram
    cross-entropy exceeds ``lm_nll_max`` (the avg_nll operators.lm
    computes — gibberish and boilerplate-mismatch score high). No-op when
    the threshold is None; empty docs (NULL score) are dropped when the
    gate is on, matching production LM filters."""
    if cfg.lm_nll_max is None:
        return df
    from airflow_retail_etl_spark.operators import lm

    scores = lm.unigram_score(df, cfg.text_col, cfg.id_col)
    keep = scores.filter(
        F.col("avg_nll").isNotNull() & (F.col("avg_nll") <= cfg.lm_nll_max)
    ).select(F.col("id").alias(cfg.id_col))
    return df.join(keep, cfg.id_col, "left_semi")


def classifier_gate(df: DataFrame, cfg: CorpusConfig) -> DataFrame:
    """Optional model gate: the shipped logistic regression
    (operators/classifier.py) must score ≥ ``classifier_min_score``.
    A pure projection — fuses into the scan with the other gates."""
    if cfg.classifier_min_score is None:
        return df
    from airflow_retail_etl_spark.operators import classifier

    scored = classifier.logistic_score(
        df,
        classifier.default_text_features(F.col(cfg.text_col)),
        classifier.DEFAULT_TEXT_WEIGHTS,
        classifier.DEFAULT_TEXT_BIAS,
        threshold=cfg.classifier_min_score,
    )
    return scored.filter(F.col("keep")).select(*df.columns)


def redact(df: DataFrame, cfg: CorpusConfig) -> DataFrame:
    return df.withColumn(
        cfg.text_col, pii.redact_pii(F.col(cfg.text_col))
    )


def _neardup_clusters(df: DataFrame, cfg: CorpusConfig) -> DataFrame:
    """(node, comp) near-dup cluster assignment for the whole corpus."""
    pairs = dedup.minhash_lsh_pairs(
        df, cfg.text_col, cfg.id_col, min_jaccard=cfg.neardup_jaccard
    )
    return dedup.connected_components(
        pairs, nodes=df.select(F.col(cfg.id_col).alias("node"))
    )


def neardup_resolve(
    df: DataFrame, cfg: CorpusConfig, cc: DataFrame | None = None
) -> DataFrame:
    """MinHash-LSH candidates → verified pairs → components → keep the
    best-quality doc per cluster. Returns the surviving corpus.
    ``cc`` accepts a precomputed cluster assignment so callers that also
    need the clusters (cluster-keyed splits) run components once."""
    if cc is None:
        cc = _neardup_clusters(df, cfg)
    scored = df.select(
        F.col(cfg.id_col).alias("node"),
        tf.quality_score(F.col(cfg.text_col)).alias("__q"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("comp").orderBy(
        F.col("__q").desc(), F.col("node").asc()
    )
    keepers = (
        cc.join(scored, "node")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(F.col("node").alias(cfg.id_col))
    )
    return df.join(keepers, cfg.id_col, "left_semi")


def assign_split(
    df: DataFrame, cfg: CorpusConfig, cc: DataFrame | None = None
) -> DataFrame:
    """Deterministic hash split. With ``split_by_cluster``, the draw key
    is the near-dup cluster id — residual near-dups land in the same
    split by construction. If the caller didn't precompute the cluster
    assignment (``cc``), it is computed here; silently degrading to the
    per-doc hash would reintroduce exactly the train/test leakage the
    flag exists to prevent."""
    if cfg.split_by_cluster and cc is None:
        if not {cfg.id_col, cfg.text_col} <= set(df.columns):
            raise ValueError(
                "split_by_cluster=True needs a precomputed cc= cluster "
                f"assignment or a corpus with {cfg.id_col!r}/"
                f"{cfg.text_col!r} columns to derive one"
            )
        cc = _neardup_clusters(df, cfg)
    if cfg.split_by_cluster and cc is not None:
        keyed = df.join(
            cc.select(
                F.col("node").alias(cfg.id_col),
                F.col("comp").alias("__split_key"),
            ),
            cfg.id_col,
            "left",
        )
        key = F.coalesce(
            F.col("__split_key"), F.col(cfg.id_col)
        ).cast("string")
    else:
        keyed = df
        key = F.col(cfg.id_col).cast("string")
    u = _sample_u(key, "")
    t_train = F.lit(str(threshold_for(cfg.train_frac))).cast("decimal(21,0)")
    t_val = F.lit(
        str(threshold_for(cfg.train_frac + cfg.val_frac))
    ).cast("decimal(21,0)")
    out = keyed.withColumn(
        "split",
        F.when(u < t_train, "train").when(u < t_val, "val").otherwise("test"),
    )
    return out.drop("__split_key")


def soft_neardup_sample(
    df: DataFrame, cfg: CorpusConfig, cc: DataFrame | None = None
) -> DataFrame:
    """Duplicate-aware alternative to :func:`neardup_resolve`: keep each
    doc with probability 1/cluster_size over the SAME near-dup
    components (sampling.inverse_cluster_sample) — one expected survivor
    per family, hash-chosen (no crawl-order or quality-rank bias),
    benign template variation preserved in expectation. The sampler
    itself is a pure projection+filter on the assignment; the clustering
    is the work the hard resolve already pays."""
    from airflow_retail_etl_spark.operators.sampling import (
        inverse_cluster_sample,
    )

    if cc is None:
        cc = _neardup_clusters(df, cfg)
    from pyspark.sql import Window

    w = Window.partitionBy("comp")
    assign = cc.select(
        F.col("node").alias(cfg.id_col),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
    )
    kept = inverse_cluster_sample(
        assign, cfg.id_col, "cluster_size", seed=cfg.soft_dedup_seed
    )
    return df.join(kept.select(cfg.id_col), cfg.id_col, "left_semi")


def fim_stage(df: DataFrame, cfg: CorpusConfig) -> DataFrame:
    """Optional FIM/PSM augmentation of the TRAIN split (rate
    ``fim_rate``): replaces ``text`` with the hash-cut permutation for
    the drawn docs; a pure projection (``keep_cols`` passthrough — no
    join, no shuffle). No-op when ``fim_rate`` is None."""
    if cfg.fim_rate is None:
        return df
    others = [
        c for c in df.columns if c not in (cfg.id_col, cfg.text_col)
    ]
    out = chunking.fim_transform(
        df,
        cfg.text_col,
        cfg.id_col,
        rate=cfg.fim_rate,
        seed=cfg.fim_seed,
        keep_cols=others,
    )
    return out.select(
        cfg.id_col,
        F.col("fim_text").alias(cfg.text_col),
        *others,
        "fim_applied",
    )


def excise_shared_spans(df: DataFrame, cfg: CorpusConfig) -> DataFrame:
    """Optional span-grain dedup stage: cut exact shared substrings
    ≥ ``excise_min_span`` chars out of the LATER document (first
    occurrence kept) — a quoted paragraph is removed, the quoting doc
    survives. No-op when the threshold is None. Text becomes the
    normalized form with spans removed (the span coordinate system);
    other columns pass through."""
    if cfg.excise_min_span is None:
        return df
    spans = dedup.shared_span_pairs(
        df, cfg.text_col, cfg.id_col,
        k=cfg.excise_k, min_len=cfg.excise_min_span,
        max_doc_freq=cfg.excise_max_doc_freq,
        unsafe_large_cap=cfg.excise_unsafe_large_cap,
    )
    cleaned = dedup.remove_spans(df, spans, cfg.text_col, cfg.id_col)
    others = [c for c in df.columns if c != cfg.text_col]
    return df.select(*others).join(
        cleaned.select(
            cfg.id_col, F.col("text_clean").alias(cfg.text_col)
        ),
        cfg.id_col,
    )


def shuffle_packed(packed: DataFrame, cfg: CorpusConfig) -> DataFrame:
    """Optional final stage: epoch-seeded reproducible ordering of the
    packed training sequences.

    Every chunk row gets the sequence's shuffle draw (``shuffle_u`` —
    sampling.shuffle_u over the ``bucket:seq_id`` key with
    ``shuffle_seed``/``shuffle_epoch``): sorting by ``(shuffle_u,
    seq_key, seq_offset)`` yields sequences in a deterministic random
    order, chunks contiguous within each sequence — lay it down with
    ``io.write_sorted`` on exactly those columns so the trainer streams
    the epoch's order straight off range-clustered parquet. A pure
    projection (no shuffle here; the ORDER materializes at write time),
    re-derivable for any epoch on any layout. No-op when
    ``shuffle_seed`` is None.
    """
    if cfg.shuffle_seed is None:
        return packed
    from airflow_retail_etl_spark.operators.sampling import shuffle_u

    seq_key = F.concat_ws(
        ":", F.col("bucket").cast("string"), F.col("seq_id").cast("string")
    )
    return packed.withColumn("seq_key", seq_key).withColumn(
        "shuffle_u",
        shuffle_u(
            F.col("seq_key"), seed=cfg.shuffle_seed, epoch=cfg.shuffle_epoch
        ),
    )


def run_corpus_build(
    docs: DataFrame,
    eval_df: DataFrame,
    cfg: CorpusConfig = CorpusConfig(),
) -> dict[str, DataFrame]:
    """Full build; returns every stage boundary keyed by stage name."""
    gated = quality_gate(docs, cfg)
    fluent = classifier_gate(lm_gate(gated, cfg), cfg)
    clean = redact(fluent, cfg)
    decon = decontam.decontaminate(
        clean, eval_df, cfg.text_col, cfg.id_col, n=cfg.decontam_ngram
    )
    exact = decon.join(
        dedup.exact_dedup(decon, cfg.text_col, cfg.id_col).select(
            F.col("keeper_id").alias(cfg.id_col)
        ),
        cfg.id_col,
        "left_semi",
    )
    cc = (
        _neardup_clusters(exact, cfg)
        if (cfg.split_by_cluster or cfg.soft_dedup)
        else None
    )
    if cfg.soft_dedup:
        resolved = soft_neardup_sample(exact, cfg, cc)
    else:
        resolved = neardup_resolve(exact, cfg, cc)
    resolved = excise_shared_spans(resolved, cfg)
    with_split = assign_split(resolved, cfg, cc)
    train = fim_stage(
        with_split.filter(F.col("split") == "train"), cfg
    )
    chunks = chunking.chunk_documents(
        train,
        cfg.text_col,
        cfg.id_col,
        chunk_size=cfg.chunk_size,
        overlap=cfg.chunk_overlap,
    )
    packed = packing.pack_chunks(
        chunks, max_tokens=cfg.max_tokens, n_buckets=cfg.pack_buckets
    )
    packed = shuffle_packed(packed, cfg)
    return {
        "gated": gated,
        "fluent": fluent,
        "clean": clean,
        "decontaminated": decon,
        "exact_deduped": exact,
        "resolved": resolved,
        "with_split": with_split,
        "train_chunks": chunks,
        "packed": packed,
    }


def funnel_stats(stages: dict[str, DataFrame], cfg: CorpusConfig) -> DataFrame:
    """One-row-per-stage funnel: how many docs each gate let through.

    Counts run as independent tiny aggregates; union them into a single
    report frame (the counts are actions — call once, write once).
    """
    parts = []
    for name in (
        "gated",
        "fluent",
        "clean",
        "decontaminated",
        "exact_deduped",
        "resolved",
    ):
        parts.append(
            stages[name]
            .agg(F.count("*").alias("n_docs"))
            .select(F.lit(name).alias("stage"), "n_docs")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def refresh_delta(
    admitted: DataFrame,
    snapshot: DataFrame,
    cfg: CorpusConfig,
) -> tuple[DataFrame, DataFrame]:
    """Recrawl refresh: (to_process, to_retire) from a fresh snapshot.

    The weekly-recrawl flow a corpus service actually runs, composed
    from the diff + admission machinery: ``profile.snapshot_diff``
    classifies every doc of ``snapshot`` against the currently-admitted
    corpus, and only ADDED ∪ CHANGED docs flow into reprocessing
    (gates + incremental dedup admission — work ∝ the delta, never the
    corpus), while REMOVED ∪ CHANGED ids are the retirement list the
    caller applies to the corpus store and the dedup band index
    (delete-then-readmit gives CHANGED docs clean index rows).
    UNCHANGED docs — the overwhelming mass of a weekly recrawl — cost
    exactly one fingerprint join and nothing else.

    Returns (to_process, to_retire): the new-snapshot rows to run
    through the admission pipeline, and the (id, status) retirement
    verdicts. Composition only — every piece is the already-verified
    operator.
    """
    from airflow_retail_etl_spark.operators.profile import snapshot_diff

    diff = snapshot_diff(
        admitted, snapshot, cfg.id_col, [cfg.text_col]
    )
    to_process = snapshot.join(
        diff.filter(F.col("status").isin("ADDED", "CHANGED")).select(
            F.col("id").alias(cfg.id_col)
        ),
        cfg.id_col,
        "left_semi",
    )
    to_retire = diff.filter(F.col("status").isin("REMOVED", "CHANGED"))
    return to_process, to_retire
