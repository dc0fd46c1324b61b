"""Eval-set decontamination for training corpora.

Before pretraining, any document that shares an n-gram with a benchmark
or held-out eval set must be dropped ("decontamination" — the n-gram
overlap rule popularized by the GPT-3 / PaLM data cards). The shape is
asymmetric: the training corpus is the 100 TB side, the eval set is
thousands of documents — so the plan is

1. shingle the EVAL side and collapse to its distinct n-gram set
   (small: |eval docs| × |grams/doc|, at most a few million strings);
2. shingle the TRAIN side (linear explode, no shuffle — the generate runs
   on the scan partition);
3. broadcast-hash-join train grams against the eval gram set — the train
   corpus is never shuffled, each partition probes the broadcast set;
4. aggregate hits per train doc (one shuffle keyed by doc id), or
   left-anti straight to the kept corpus.

At even larger eval sets, swap step 3's broadcast for a Bloom-filter
prefilter plus a shuffled semi-join; the operator keeps the exact join
because exactness is the point of the gate. No Python in the loop; the
whole pipeline is built-in HOFs + one equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators.dedup import _with_shingles


def eval_ngram_set(
    eval_df: DataFrame, text_col: str, id_col: str, *, n: int = 13
) -> DataFrame:
    """Distinct token n-grams of the eval set: one column ``g``."""
    sh = _with_shingles(eval_df, text_col, id_col, kind="token", n=n)
    return sh.select(F.explode_outer("shingles").alias("g")).distinct()


def contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 13,
) -> DataFrame:
    """Per-train-doc contamination report: (id, n_hit_ngrams).

    ``n_hit_ngrams`` counts the DISTINCT train-doc n-grams that also occur
    anywhere in the eval set (per-doc shingle sets are already distinct,
    so a plain post-join count is a distinct count). Docs with zero hits
    are absent — left-join this frame to flag a full corpus, or use
    :func:`decontaminate` to drop hits directly.

    A document shorter than ``n`` tokens contributes its whole text as a
    single shingle (see text.token_shingles_from), so tiny eval items
    still decontaminate exact copies of themselves.
    """
    ev = F.broadcast(eval_ngram_set(eval_df, text_col, id_col, n=n))
    tr = _with_shingles(train, text_col, id_col, kind="token", n=n)
    grams = tr.select("id", F.explode_outer("shingles").alias("g"))
    return (
        grams.join(ev, "g")
        .groupBy("id")
        .agg(F.count("*").alias("n_hit_ngrams"))
    )


def bloom_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 13,
    n_bits: int = 1 << 26,
    k_hashes: int = 7,
) -> DataFrame:
    """Bloom-gated contamination prefilter: (id, n_bloom_hits) — the
    documented scale path for when the eval gram SET outgrows broadcast
    (module docstring step 3's fallback, now implemented; round 10).

    The eval grams build a deterministic md5-family Bloom filter
    (functions/bloom — n elements compress to ~n_bits bits instead of
    full strings, so a 10⁸-gram eval side still ships to executors),
    and every train gram probes it as a pure projection: the train
    corpus never shuffles, exactly like the broadcast-set join it
    replaces. GUARANTEES: ``n_bloom_hits`` ≥ the exact
    :func:`contamination` count for every doc (Bloom has no false
    negatives — superset-pinned in tests), inflated only by false
    positives at the standard (1-e^{-kn/m})^k rate. Compose as
    ``bloom_contamination(...) → filter(n_bloom_hits > 0) → exact
    contamination on the survivors``: the exact join's input shrinks to
    the flagged sliver, and the gate never un-flags a true hit. Docs with
    zero probing grams are absent (LEFT-join and coalesce to 0).

    Default ``n_bits`` = 2²⁶ (8 MB filter — ~10 bits/element at 6-7M
    eval grams, FP ≈ 1%); size at ~10·|eval grams| bits.
    """
    from airflow_retail_etl_spark.functions import bloom

    filt = bloom.build_bloom(
        eval_ngram_set(eval_df, text_col, id_col, n=n),
        "g",
        n_bits=n_bits,
        k_hashes=k_hashes,
    )
    tr = _with_shingles(train, text_col, id_col, kind="token", n=n)
    grams = tr.select("id", F.explode_outer("shingles").alias("g"))
    probed = bloom.bloom_probe(
        grams, "g", filt, n_bits=n_bits, k_hashes=k_hashes
    )
    return (
        probed.filter(F.col("bloom_hit"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bloom_hits"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 13,
    max_hit_ngrams: int = 0,
) -> DataFrame:
    """Training corpus minus contaminated docs (all original columns).

    Keeps docs with at most ``max_hit_ngrams`` eval-overlapping n-grams
    (default 0: any overlap drops the doc — the conservative standard).
    """
    hits = contamination(train, eval_df, text_col, id_col, n=n)
    drop = hits.filter(F.col("n_hit_ngrams") > max_hit_ngrams)
    return train.join(
        drop.withColumnRenamed("id", id_col).select(id_col),
        id_col,
        "left_anti",
    )


def decontaminate_spans(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 16,
    min_len: int = 40,
    max_doc_freq: int | None = None,
    hash_family: str = "xxhash64",
    unsafe_large_cap: bool = False,
) -> DataFrame:
    """SPAN-GRAIN decontamination: excise every substring ≥ ``min_len``
    chars that a training document shares verbatim with any eval
    document — the document survives minus the leaked passage, instead
    of being dropped whole (``decontaminate``'s n-gram-hit rule).

    The surgical option matters when eval sets quote common sources
    (licenses, famous passages, boilerplate intros): whole-doc dropping
    at n-gram grain can shed large fractions of a corpus for one shared
    paragraph; span excision removes exactly the leaked characters.

    Composition: dedup.shared_span_pairs_cross (train × eval anchor
    join — cost Σ_h df_train·df_eval, linear for a bounded eval set;
    ``max_doc_freq`` caps train-side boilerplate anchors) feeds
    dedup.remove_spans keyed on the TRAIN side. Returns
    (``id_col``, text_clean, n_removed_chars) in shared_span_pairs'
    normalized-text coordinate system (README "coordinate contract").
    """
    from airflow_retail_etl_spark.operators.dedup import (
        remove_spans,
        shared_span_pairs_cross,
    )

    spans = shared_span_pairs_cross(
        train, eval_df, text_col, id_col,
        k=k, min_len=min_len, max_doc_freq=max_doc_freq,
        hash_family=hash_family, unsafe_large_cap=unsafe_large_cap,
    )
    return remove_spans(
        train, spans, text_col, id_col,
        id_span_col="id_a", start_col="start_a",
    )


def contamination_score(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 13,
) -> DataFrame:
    """GRADED contamination: per train doc, what fraction of its
    distinct n-grams occur anywhere in the eval set —
    (id, n_ngrams, n_hit_ngrams, contamination_frac).

    The ranking signal between :func:`decontaminate`'s drop-on-any-hit
    and :func:`decontaminate_spans`' surgical excision: threshold it
    (tolerate incidental single-shingle overlap, drop wholesale
    copies), sort by it for manual audit, or feed it to a selection
    budget. Every train doc appears (zero hits → 0.0; even empty
    text shingles to one whole-text gram, so n_ngrams ≥ 1 — the NULLIF
    guard only matters if shingling semantics ever change). The
    corpus-scale side is shingled ONCE (round-8 advice: the earlier
    totals-plus-contamination() composition exploded the train side
    twice): one explode, one broadcast LEFT join against the distinct
    eval gram set with a hit marker, and one doc-keyed agg counting
    both totals (non-null grams) and hits (matched markers) in the same
    pass; the fraction is one division of exact integers, rounded at
    the report grain.
    """
    tr = _with_shingles(train, text_col, id_col, kind="token", n=n)
    ev = F.broadcast(
        eval_ngram_set(eval_df, text_col, id_col, n=n).withColumn(
            "__hit", F.lit(1)
        )
    )
    grams = tr.select("id", F.explode_outer("shingles").alias("g"))
    return (
        grams.join(ev, "g", "left")
        .groupBy("id")
        .agg(
            # per-doc shingle sets are distinct and the eval side is a
            # distinct set, so the left join never multiplies rows
            F.count("g").cast("int").alias("n_ngrams"),
            F.count("__hit").cast("long").alias("n_hit_ngrams"),
        )
        .withColumn(
            "contamination_frac",
            F.round(
                F.col("n_hit_ngrams")
                / F.nullif(F.col("n_ngrams"), F.lit(0)),
                6,
            ),
        )
    )
