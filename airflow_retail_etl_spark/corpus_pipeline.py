"""End-to-end LLM training-corpus pipeline: raw docs → packed sequences.

The flagship composition of the training-data operators, in the order a
production corpus build runs them (cheapest filters first so expensive
stages see the fewest rows):

1. quality gate     — gopher_flags keep (projection)
1b. LM fluency gate — optional unigram cross-entropy threshold
                      (operators/lm.py; off by default)
2. PII redaction    — regex scrub (projection)
3. decontamination  — drop eval-overlapping docs (broadcast probe)
4. exact dedup      — collapse byte-identical copies FIRST (uniform
                      shuffle; also what keeps LSH buckets small)
5. near-dup resolve — MinHash-LSH candidates → exact-Jaccard verify →
                      connected components → keep best-quality doc
6. chunk + pack     — sliding windows → concat-and-chop addresses
7. split            — deterministic 90/5/5 train/val/test by hash

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


def redact(df: DataFrame, cfg: CorpusConfig) -> DataFrame:
    return df.withColumn(
        cfg.text_col, pii.redact_pii(F.col(cfg.text_col))
    )


def neardup_resolve(df: DataFrame, cfg: CorpusConfig) -> DataFrame:
    """MinHash-LSH candidates → verified pairs → components → keep the
    best-quality doc per cluster. Returns the surviving corpus."""
    pairs = dedup.minhash_lsh_pairs(
        df, cfg.text_col, cfg.id_col, min_jaccard=cfg.neardup_jaccard
    )
    cc = dedup.connected_components(
        pairs, nodes=df.select(F.col(cfg.id_col).alias("node"))
    )
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


def assign_split(df: DataFrame, cfg: CorpusConfig) -> DataFrame:
    u = _sample_u(F.col(cfg.id_col).cast("string"), "")
    t_train = F.lit(str(threshold_for(cfg.train_frac))).cast("decimal(21,0)")
    t_val = F.lit(
        str(threshold_for(cfg.train_frac + cfg.val_frac))
    ).cast("decimal(21,0)")
    return df.withColumn(
        "split",
        F.when(u < t_train, "train").when(u < t_val, "val").otherwise("test"),
    )


def run_corpus_build(
    docs: DataFrame,
    eval_df: DataFrame,
    cfg: CorpusConfig = CorpusConfig(),
) -> dict[str, DataFrame]:
    """Full build; returns every stage boundary keyed by stage name."""
    gated = quality_gate(docs, cfg)
    fluent = lm_gate(gated, cfg)
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
    resolved = neardup_resolve(exact, cfg)
    with_split = assign_split(resolved, cfg)
    chunks = chunking.chunk_documents(
        with_split.filter(F.col("split") == "train"),
        cfg.text_col,
        cfg.id_col,
        chunk_size=cfg.chunk_size,
        overlap=cfg.chunk_overlap,
    )
    packed = packing.pack_chunks(
        chunks, max_tokens=cfg.max_tokens, n_buckets=cfg.pack_buckets
    )
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
