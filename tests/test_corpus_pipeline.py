from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.corpus_pipeline import (
    CorpusConfig,
    funnel_stats,
    run_corpus_build,
)
from airflow_retail_etl_spark.sources.tables import load_table

CFG = CorpusConfig(
    decontam_ngram=3,
    chunk_size=32,
    chunk_overlap=8,
    max_tokens=128,
    pack_buckets=8,
)


@pytest.fixture(scope="module")
def build(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    from airflow_retail_etl_spark.operators.sampling import hash_sample

    eval_df = hash_sample(docs, "doc_id", 0.05, seed="eval")
    train = docs.join(eval_df.select("doc_id"), "doc_id", "left_anti")
    return run_corpus_build(train, eval_df, CFG), train, eval_df


def test_funnel_monotonically_narrows(spark, build):
    stages, train, _ = build
    stats = {r.stage: r.n_docs for r in funnel_stats(stages, CFG).collect()}
    n0 = train.count()
    assert stats["gated"] <= n0
    assert stats["clean"] == stats["gated"]  # redaction drops nothing
    assert stats["decontaminated"] <= stats["clean"]
    assert stats["exact_deduped"] <= stats["decontaminated"]
    assert stats["resolved"] <= stats["exact_deduped"]
    assert stats["resolved"] > 0


def test_no_eval_overlap_survives(spark, build):
    stages, _, eval_df = build
    from airflow_retail_etl_spark.operators.decontam import contamination

    hits = contamination(
        stages["resolved"], eval_df, "text", "doc_id", n=CFG.decontam_ngram
    )
    assert hits.count() == 0


def test_no_exact_duplicates_survive(spark, build):
    stages, _, _ = build
    from airflow_retail_etl_spark.functions.text import fingerprint

    dup_groups = (
        stages["resolved"]
        .select(fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dup_groups.count() == 0


def test_split_and_packing_outputs(spark, build):
    stages, _, _ = build
    splits = {
        r.split for r in stages["with_split"].select("split").distinct().collect()
    }
    assert splits <= {"train", "val", "test"} and "train" in splits
    packed = stages["packed"]
    assert packed.columns == [
        "doc_id", "chunk_id", "bucket", "seq_id", "seq_offset",
        "n_tokens", "spans_boundary",
    ]
    # every train chunk got exactly one packing address
    assert packed.count() == stages["train_chunks"].count()


def test_build_is_deterministic(spark, build):
    stages, train, eval_df = build
    again = run_corpus_build(train.repartition(7), eval_df, CFG)
    a = {tuple(r) for r in stages["resolved"].select("doc_id").collect()}
    b = {tuple(r) for r in again["resolved"].select("doc_id").collect()}
    assert a == b


def test_lm_gate_prunes_high_surprisal_docs(spark):
    """With lm_nll_max set, the fluency gate drops the word-salad tail
    and empty docs; default config keeps the stage a no-op."""
    from dataclasses import replace

    from airflow_retail_etl_spark.corpus_pipeline import (
        CorpusConfig,
        lm_gate,
        quality_gate,
    )

    fluent_text = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "to the green hills beyond the river in the morning light"
    )
    salad = " ".join(f"zq{i}x wv{i*7}b" for i in range(20))
    rows = [(i, fluent_text) for i in range(20)] + [(99, salad)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    cfg_off = CorpusConfig()
    assert lm_gate(docs, cfg_off) is docs  # stage is a strict no-op

    cfg_on = replace(cfg_off, lm_nll_max=4.0)
    kept = {r["doc_id"] for r in lm_gate(docs, cfg_on).collect()}
    assert 99 not in kept          # hapax-salad doc scores way above 4 nats
    assert set(range(20)) <= kept  # repeated fluent docs score low


def test_classifier_gate_and_cluster_split(spark, sf_dir):
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.corpus_pipeline import (
        CorpusConfig,
        run_corpus_build,
    )
    from airflow_retail_etl_spark.operators.sampling import hash_sample
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    eval_df = hash_sample(docs, "doc_id", 0.05)
    cfg = CorpusConfig(
        classifier_min_score=0.5,
        split_by_cluster=True,
        neardup_jaccard=0.8,  # partial dedup: mild near-dups survive
    )
    stages = run_corpus_build(docs, eval_df, cfg)
    # the model gate drops something but not everything
    n_gated, n_fluent = stages["gated"].count(), stages["fluent"].count()
    assert 0 < n_fluent < n_gated
    # split column present and cluster-keyed draw still covers all splits
    splits = {
        r["split"]
        for r in stages["with_split"].select("split").distinct().collect()
    }
    assert "train" in splits
    # determinism: rerunning yields the identical split assignment
    again = run_corpus_build(docs, eval_df, cfg)
    a = {
        (r["doc_id"], r["split"])
        for r in stages["with_split"].select("doc_id", "split").collect()
    }
    b = {
        (r["doc_id"], r["split"])
        for r in again["with_split"].select("doc_id", "split").collect()
    }
    assert a == b


def test_neardup_resolve_precomputed_cc_equivalent(spark, sf_dir):
    from airflow_retail_etl_spark.corpus_pipeline import (
        CorpusConfig,
        _neardup_clusters,
        neardup_resolve,
    )
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    cfg = CorpusConfig()
    direct = {r["doc_id"] for r in neardup_resolve(docs, cfg).collect()}
    cc = _neardup_clusters(docs, cfg)
    reused = {
        r["doc_id"] for r in neardup_resolve(docs, cfg, cc).collect()
    }
    assert direct == reused


def test_excise_stage_cuts_partial_inclusions(spark):
    from airflow_retail_etl_spark.corpus_pipeline import (
        CorpusConfig,
        excise_shared_spans,
    )

    shared = (
        "this exact paragraph appears verbatim inside another document "
        "and is long enough to clear the excision threshold easily"
    )
    docs = spark.createDataFrame(
        [
            (1, f"original source doc. {shared} rest of source."),
            (2, f"aggregator preamble... {shared} aggregator footer."),
            (3, "unrelated document with entirely different content."),
        ],
        "doc_id long, text string",
    )
    cfg = CorpusConfig(excise_min_span=60, excise_k=12)
    out = {r["doc_id"]: r["text"] for r in
           excise_shared_spans(docs, cfg).collect()}
    assert shared in out[1]                  # first occurrence intact
    assert shared not in out[2]              # later doc excised
    assert "aggregator preamble" in out[2]   # surrounding text kept
    assert "aggregator footer" in out[2]
    assert "unrelated document" in out[3]
    # disabled -> byte-identical passthrough
    off = {r["doc_id"]: r["text"] for r in
           excise_shared_spans(docs, CorpusConfig()).collect()}
    assert off[2] == docs.collect()[1]["text"]


def test_shuffle_stage_orders_sequences_reproducibly(spark, sf_dir):
    """With shuffle_seed set, packed rows carry (seq_key, shuffle_u);
    sorting by (shuffle_u, seq_key, seq_offset) keeps every sequence's
    chunks contiguous, the epoch order is layout-invariant, and a
    different epoch yields a different sequence order."""
    import dataclasses

    from airflow_retail_etl_spark.operators.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    eval_df = hash_sample(docs, "doc_id", 0.05, seed="eval")
    train = docs.join(eval_df.select("doc_id"), "doc_id", "left_anti")
    # smaller sequences + more buckets → enough sequences that two epoch
    # permutations can't coincide by chance (2 sequences could)
    cfg = dataclasses.replace(
        CFG, shuffle_seed="s8", shuffle_epoch=1,
        max_tokens=32, pack_buckets=16,
    )
    packed = run_corpus_build(train, eval_df, cfg)["packed"]

    rows = (
        packed.orderBy("shuffle_u", "seq_key", "seq_offset")
        .select("seq_key", "seq_offset")
        .collect()
    )
    # contiguity: each seq_key appears as ONE run in the sorted stream
    seen, prev = set(), None
    order = []
    for r in rows:
        if r.seq_key != prev:
            assert r.seq_key not in seen, f"split run for {r.seq_key}"
            seen.add(r.seq_key)
            order.append(r.seq_key)
            prev = r.seq_key
    assert len(order) > 1

    # layout invariance: rebuilding from a repartitioned input gives the
    # identical epoch order
    again = run_corpus_build(train.repartition(7), eval_df, cfg)["packed"]
    order2 = [
        r.seq_key
        for r in again.select("seq_key", "shuffle_u")
        .distinct()
        .orderBy("shuffle_u", "seq_key")
        .collect()
    ]
    assert order == order2

    # a different epoch is a different permutation of the same sequences
    cfg3 = dataclasses.replace(cfg, shuffle_epoch=2)
    third = run_corpus_build(train, eval_df, cfg3)["packed"]
    order3 = [
        r.seq_key
        for r in third.select("seq_key", "shuffle_u")
        .distinct()
        .orderBy("shuffle_u", "seq_key")
        .collect()
    ]
    assert sorted(order3) == sorted(order)
    assert order3 != order


def test_refresh_delta_routes_only_the_delta(spark):
    """Recrawl refresh invariants: UNCHANGED docs never reprocess,
    ADDED and CHANGED flow to processing, REMOVED and CHANGED retire,
    and the two outputs never disagree about a CHANGED doc."""
    from airflow_retail_etl_spark.corpus_pipeline import (
        CorpusConfig,
        refresh_delta,
    )

    cfg = CorpusConfig()
    admitted = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo"), (3, "charlie")], ["doc_id", "text"]
    )
    snapshot = spark.createDataFrame(
        [(1, "alpha"), (2, "bravo-v2"), (4, "delta")], ["doc_id", "text"]
    )
    to_process, to_retire = refresh_delta(admitted, snapshot, cfg)
    proc = {r.doc_id for r in to_process.collect()}
    retire = {(r.id, r.status) for r in to_retire.collect()}
    assert proc == {2, 4}  # CHANGED + ADDED; UNCHANGED 1 untouched
    assert retire == {(2, "CHANGED"), (3, "REMOVED")}
    # processed CHANGED rows carry the NEW text
    texts = {r.doc_id: r.text for r in to_process.collect()}
    assert texts[2] == "bravo-v2"


def test_soft_dedup_mode_keeps_one_expected_survivor_per_family(spark, sf_dir):
    """soft_dedup=True swaps the hard keep-best resolve for the
    1/cluster_size draw over the SAME components: survivors are a subset
    of the exact-deduped corpus, singleton clusters always survive, and
    the draw is deterministic across reruns."""
    from airflow_retail_etl_spark.corpus_pipeline import (
        _neardup_clusters,
        soft_neardup_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    cfg = CorpusConfig(
        decontam_ngram=3, chunk_size=32, chunk_overlap=8,
        max_tokens=128, pack_buckets=8, soft_dedup=True,
    )
    cc = _neardup_clusters(docs, cfg)
    soft = soft_neardup_sample(docs, cfg, cc)
    ids = {r.doc_id for r in soft.select("doc_id").collect()}
    ids2 = {r.doc_id for r in soft_neardup_sample(docs, cfg, cc)
            .select("doc_id").collect()}
    assert ids == ids2  # deterministic
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert ids <= all_ids
    # singleton clusters (keep prob 1) must all survive
    sizes = (
        cc.groupBy("comp").count().filter(F.col("count") == 1)
        .join(cc, "comp").select(F.col("node").alias("doc_id"))
    )
    singles = {r.doc_id for r in sizes.collect()}
    assert singles <= ids
    # and the full build runs end-to-end in soft mode
    from airflow_retail_etl_spark.operators.sampling import hash_sample

    eval_df = hash_sample(docs, "doc_id", 0.05, seed="eval")
    stages = run_corpus_build(
        docs.join(eval_df.select("doc_id"), "doc_id", "left_anti"),
        eval_df, cfg,
    )
    assert stages["packed"].count() > 0


def test_fim_stage_permutes_only_the_train_split(spark, sf_dir):
    """fim_rate wires chunking.fim_transform into the TRAIN branch: the
    drawn docs' chunks carry the sentinels, pass-through docs chunk
    identically to the fim-less build, and the permuted text reaches
    chunking verbatim (normalize fixed point)."""
    from airflow_retail_etl_spark.operators.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    eval_df = hash_sample(docs, "doc_id", 0.05, seed="eval")
    train_in = docs.join(eval_df.select("doc_id"), "doc_id", "left_anti")
    cfg = CorpusConfig(
        decontam_ngram=3, chunk_size=32, chunk_overlap=8,
        max_tokens=128, pack_buckets=8, fim_rate=1.0,
    )
    stages = run_corpus_build(train_in, eval_df, cfg)
    chunks = stages["train_chunks"]
    # every sufficiently-long surviving train doc was drawn at rate 1.0:
    # its first chunk starts with the <pre> sentinel
    firsts = chunks.filter(
        (F.col("chunk_id") == 0) & (F.col("n_chunk_tokens") > 0)
    )
    with_sentinel = firsts.filter(
        F.col("chunk_text").startswith("<pre>")
    ).count()
    assert with_sentinel > 0
    # rate None reproduces the plain build bit-for-bit
    cfg0 = CorpusConfig(
        decontam_ngram=3, chunk_size=32, chunk_overlap=8,
        max_tokens=128, pack_buckets=8, fim_rate=None,
    )
    plain = run_corpus_build(train_in, eval_df, cfg0)["train_chunks"]
    assert plain.filter(F.col("chunk_text").contains("<pre>")).count() == 0
