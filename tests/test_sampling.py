from __future__ import annotations

import pytest

from airflow_retail_etl_spark.operators import sampling
from airflow_retail_etl_spark.operators.sampling import (
    hash_sample,
    sample_exact_k,
    stratified_sample,
    threshold_for,
)


@pytest.fixture(scope="module")
def rows_df(spark):
    data = [
        (i, ["view", "cart", "purchase"][i % 3], f"u{i % 7}") for i in range(300)
    ]
    return spark.createDataFrame(data, ["event_id", "event_type", "user_id"])


def test_hash_sample_deterministic_and_layout_independent(spark, rows_df):
    a = {r.event_id for r in hash_sample(rows_df, "event_id", 0.3).collect()}
    b = {
        r.event_id
        for r in hash_sample(rows_df.repartition(13), "event_id", 0.3).collect()
    }
    assert a == b and 0 < len(a) < 300


def test_hash_sample_fraction_roughly_respected(spark, rows_df):
    n = hash_sample(rows_df, "event_id", 0.5).count()
    assert 100 <= n <= 200  # 300 draws at p=0.5; generous 4-sigma-ish band


def test_hash_sample_consistent_across_tables(spark, rows_df):
    other = rows_df.select("user_id").distinct()
    sampled_users = {
        r.user_id for r in hash_sample(other, "user_id", 0.5).collect()
    }
    fact_users = {
        r.user_id for r in hash_sample(rows_df, "user_id", 0.5).collect()
    }
    # sampling the SAME key at the same fraction aligns across tables
    assert fact_users == {u for u in sampled_users if u in fact_users}
    assert {r.user_id for r in rows_df.collect()} & sampled_users == fact_users


def test_hash_sample_seed_changes_membership(spark, rows_df):
    a = {r.event_id for r in hash_sample(rows_df, "event_id", 0.5).collect()}
    b = {
        r.event_id
        for r in hash_sample(rows_df, "event_id", 0.5, seed="s2").collect()
    }
    assert a != b


def test_stratified_sample_respects_per_stratum_fractions(spark, rows_df):
    out = stratified_sample(
        rows_df,
        "event_type",
        {"purchase": 1.0, "view": 0.0},
        "event_id",
        default_fraction=0.5,
    )
    by_type = {
        r.event_type: r.n
        for r in out.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    assert by_type.get("purchase") == 100  # keep all
    assert "view" not in by_type  # drop all
    assert 0 < by_type.get("cart", 0) < 100  # default fraction applies


def test_sample_exact_k_sizes_and_determinism(spark, rows_df):
    out = sample_exact_k(rows_df, ["event_type"], 10, "event_id")
    sizes = {r.event_type: r.n for r in out.groupBy("event_type").count().withColumnRenamed("count", "n").collect()}
    assert sizes == {"view": 10, "cart": 10, "purchase": 10}
    again = sample_exact_k(rows_df.repartition(7), ["event_type"], 10, "event_id")
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in again.collect()}


def test_sample_exact_k_small_stratum_kept_whole(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], ["k", "s"])
    out = sample_exact_k(df, ["s"], 5, "k")
    assert out.count() == 3


def test_threshold_for_bounds():
    assert threshold_for(0.0) == 0
    assert threshold_for(1.0) == 2**64
    with pytest.raises(ValueError):
        threshold_for(1.5)


def test_weighted_sample_k_exact_size_and_determinism(spark, sf_dir):
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sampling.weighted_sample_k(docs, "n_chars", 25, "doc_id")
    b = sampling.weighted_sample_k(docs.repartition(13), "n_chars", 25, "doc_id")
    ra = sorted(r["doc_id"] for r in a.collect())
    rb = sorted(r["doc_id"] for r in b.collect())
    assert ra == rb and len(ra) == 25


def test_weighted_sample_k_respects_weights(spark):
    # 1000x-weighted rows should dominate the draw
    rows = [(i, 1000.0 if i < 30 else 1.0) for i in range(300)]
    df = spark.createDataFrame(rows, ["rid", "w"])
    got = [r["rid"] for r in
           sampling.weighted_sample_k(df, "w", 20, "rid").collect()]
    heavy = sum(1 for r in got if r < 30)
    assert heavy >= 15  # ~uniform would give ~2 of 20


def test_weighted_sample_k_excludes_nonpositive_weights(spark):
    rows = [(1, 0.0), (2, -3.0), (3, None), (4, 5.0), (5, 2.0)]
    df = spark.createDataFrame(rows, ["rid", "w"])
    got = {r["rid"] for r in
           sampling.weighted_sample_k(df, "w", 10, "rid").collect()}
    assert got == {4, 5}


def test_balanced_sample_equalizes_skewed_strata(spark):
    from airflow_retail_etl_spark.operators.sampling import balanced_sample

    rows = (
        [(i, "big") for i in range(100, 120)]
        + [(i, "mid") for i in range(200, 207)]
        + [(i, "small") for i in range(300, 303)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = balanced_sample(df, "source", "doc_id")
    counts = {
        r["source"]: r["count"]
        for r in out.groupBy("source").count().collect()
    }
    assert counts == {"big": 3, "mid": 3, "small": 3}
    # deterministic under layout: identical membership at any partitioning
    a = {r["doc_id"] for r in out.collect()}
    b = {
        r["doc_id"]
        for r in balanced_sample(
            df.repartition(13), "source", "doc_id"
        ).collect()
    }
    assert a == b
    # a different seed draws a different (but still balanced) sample
    c = {
        r["doc_id"]
        for r in balanced_sample(
            df, "source", "doc_id", seed="v2"
        ).collect()
    }
    assert len(c) == 9


def test_corpus_shuffle_layout_invariant_and_total(spark, sf_dir):
    """The shuffled order is a pure function of (seed, epoch, key):
    re-running on a differently-partitioned input yields the IDENTICAL
    position for every row, and positions are exactly 1..n."""
    from airflow_retail_etl_spark.operators.sampling import corpus_shuffle
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = corpus_shuffle(docs, "doc_id", seed="s", epoch=1)
    b = corpus_shuffle(
        docs.repartition(13), "doc_id", seed="s", epoch=1
    )
    ra = {r["doc_id"]: r["position"] for r in a.collect()}
    rb = {r["doc_id"]: r["position"] for r in b.collect()}
    assert ra == rb
    n = docs.count()
    assert sorted(ra.values()) == list(range(1, n + 1))


def test_corpus_shuffle_epochs_are_independent_permutations(spark, sf_dir):
    """Different epochs (or seeds) produce different permutations of the
    SAME row set — and the same epoch reproduces itself."""
    from airflow_retail_etl_spark.operators.sampling import corpus_shuffle
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    e1 = {r["doc_id"]: r["position"]
          for r in corpus_shuffle(docs, "doc_id", epoch=1).collect()}
    e2 = {r["doc_id"]: r["position"]
          for r in corpus_shuffle(docs, "doc_id", epoch=2).collect()}
    e1_again = {r["doc_id"]: r["position"]
                for r in corpus_shuffle(docs, "doc_id", epoch=1).collect()}
    assert e1 == e1_again
    assert set(e1) == set(e2)
    # a real permutation change, not a rotation: many rows move
    moved = sum(1 for k in e1 if e1[k] != e2[k])
    assert moved > len(e1) * 0.9


def test_epoch_slices_disjoint_cover_and_pure_filter(spark, sf_dir):
    """Slices partition the corpus: disjoint, union = corpus, and the
    slice operator adds NO exchange (pure predicate on the scan)."""
    from airflow_retail_etl_spark.operators.sampling import epoch_slice
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_slices = 4
    ids = [
        {r["doc_id"] for r in
         epoch_slice(docs, "doc_id", n_slices, i, epoch=3)
         .select("doc_id").collect()}
        for i in range(n_slices)
    ]
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set().union(*ids) == all_ids
    assert sum(len(s) for s in ids) == len(all_ids)  # disjoint
    # pure filter: no Exchange in the slice plan
    plan = (
        epoch_slice(docs, "doc_id", n_slices, 0, epoch=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan[:1500]


def test_epoch_slice_validates_index(spark, sf_dir):
    import pytest

    from airflow_retail_etl_spark.operators.sampling import epoch_slice
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        epoch_slice(docs, "doc_id", 4, 4)


def test_curriculum_order_bands_and_within_band_shuffle(spark, sf_dir):
    """Bands are equal-size (±1 row), monotone in difficulty (every doc
    in band b has difficulty <= every doc in band b+1 up to ties),
    positions are 1..n grouped by band, and the within-band order is
    layout-invariant and epoch-dependent."""
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.functions import text as tf
    from airflow_retail_etl_spark.operators.sampling import curriculum_order
    from airflow_retail_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    diff = tf.token_count(F.col("text"))
    out = curriculum_order(docs, diff, "doc_id", n_bands=4, epoch=1)
    rows = out.select(
        "doc_id", "band", "position", diff.alias("d")
    ).collect()
    n = len(rows)
    sizes = {}
    for r in rows:
        sizes[r.band] = sizes.get(r.band, 0) + 1
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sorted(r.position for r in rows) == list(range(1, n + 1))
    # band boundaries respect difficulty (ties may straddle)
    for b in range(3):
        hi = max(r.d for r in rows if r.band == b)
        lo = min(r.d for r in rows if r.band == b + 1)
        assert hi <= lo
    # positions are grouped by band: all of band b before band b+1
    by_pos = sorted(rows, key=lambda r: r.position)
    assert [r.band for r in by_pos] == sorted(r.band for r in rows)
    # layout invariance
    again = curriculum_order(
        docs.repartition(13), diff, "doc_id", n_bands=4, epoch=1
    ).select("doc_id", "position").collect()
    assert {r.doc_id: r.position for r in again} == {
        r.doc_id: r.position for r in rows
    }
    # a different epoch re-shuffles within bands but keeps band shape
    e2 = curriculum_order(docs, diff, "doc_id", n_bands=4, epoch=2)
    rows2 = e2.select("doc_id", "band", "position").collect()
    assert {r.doc_id: r.band for r in rows2} == {
        r.doc_id: r.band for r in rows
    }
    assert {r.doc_id: r.position for r in rows2} != {
        r.doc_id: r.position for r in rows
    }


def test_hash_split_boundaries_and_determinism(spark):
    import pytest
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.operators.sampling import hash_split

    df = spark.range(2000).select(F.col("id").alias("k"))
    out = hash_split(
        df, "k", [("train", 0.9), ("val", 0.95)], default="test"
    )
    frac = {
        r.split: r.c
        for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    assert set(frac) == {"train", "val", "test"}
    assert 0.85 < frac["train"] / 2000 < 0.95
    # layout-invariant membership
    again = hash_split(
        df.repartition(7), "k", [("train", 0.9), ("val", 0.95)],
        default="test",
    )
    assert {(r.k, r.split) for r in again.collect()} == {
        (r.k, r.split) for r in out.collect()
    }
    with pytest.raises(ValueError):
        hash_split(df, "k", [("a", 0.9), ("b", 0.5)], default="c")


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    """The reason the split keys on cluster_id: every near-dup cluster
    must land whole in ONE split, and on this corpus a doc_id-keyed
    split demonstrably WOULD straddle at least one multi-doc cluster."""
    import __spark_entry__ as entry

    out = entry.q_leakage_safe_split(spark, sf_dir).collect()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    multi = [
        c for c in by_cluster
        if sum(1 for r in out if r.cluster_id == c) > 1
    ]
    assert multi, "corpus has no multi-doc clusters; test is vacuous"
    # counterfactual: the doc-keyed draw splits at least one cluster
    from airflow_retail_etl_spark.operators.sampling import hash_split

    doc_keyed = {
        r.doc_id: r.split
        for r in hash_split(
            spark.createDataFrame(
                [(r.doc_id, r.cluster_id) for r in out],
                ["doc_id", "cluster_id"],
            ),
            "doc_id",
            [("train", 0.9), ("val", 0.95)],
            default="test",
        ).collect()
    }
    cluster_members: dict = {}
    for r in out:
        cluster_members.setdefault(r.cluster_id, []).append(r.doc_id)
    straddled = [
        c
        for c, ms in cluster_members.items()
        if len(ms) > 1 and len({doc_keyed[m] for m in ms}) > 1
    ]
    assert straddled, (
        "doc-keyed split did not straddle any cluster here — pick a "
        "corpus/seed where the leak is observable"
    )


def test_hash_split_rejects_tied_boundaries(spark):
    # a tied boundary makes the later label's interval empty — the split
    # silently loses a class (round-11 advice); require STRICT ascent
    df = spark.createDataFrame([(i,) for i in range(10)], ["k"])
    with pytest.raises(ValueError, match="STRICTLY ascending"):
        sampling.hash_split(
            df, "k", [("a", 0.5), ("b", 0.5)], default="c"
        )
    with pytest.raises(ValueError, match="STRICTLY ascending"):
        sampling.hash_split(
            df, "k", [("a", 0.6), ("b", 0.4)], default="c"
        )
    # strictly ascending still fine
    out = sampling.hash_split(
        df, "k", [("a", 0.4), ("b", 0.8)], default="c"
    )
    assert set(out.columns) == {"k", "split"}


# ---------------------------------------------------------------------------
# inverse_cluster_sample (duplicate-aware soft dedup)
# ---------------------------------------------------------------------------


def test_inverse_cluster_sample_singletons_always_survive(spark):
    """size=1 means keep-probability 1: u·1 < 2^64 for every u."""
    assign = spark.createDataFrame(
        [(i, i, 1) for i in range(50)],
        "doc_id long, cluster_id long, cluster_size long",
    )
    got = sampling.inverse_cluster_sample(assign, seed="soft-dedup")
    assert got.count() == 50


def test_inverse_cluster_sample_matches_integer_threshold(spark):
    """Membership equals the exact u·size < 2^64 test computed in python
    from the same seeded md5 draw — no FP involved."""
    import hashlib

    rows = [(i, i % 7, (i % 7) + 1) for i in range(200)]
    assign = spark.createDataFrame(
        rows, "doc_id long, cluster_id long, cluster_size long"
    )
    got = {
        r["doc_id"]
        for r in sampling.inverse_cluster_sample(
            assign, seed="soft-dedup"
        ).collect()
    }
    expect = set()
    for i, _c, size in rows:
        u = int(
            hashlib.md5(f"soft-dedup\x1f{i}".encode()).hexdigest()[:16], 16
        )
        if u * size < 2**64:
            expect.add(i)
    assert got == expect
    # and the expectation argument holds exactly: E[survivors per
    # cluster] = size · 1/size = 1 -> overall E = n_clusters; just check
    # the draw is neither empty nor full for the multi-doc clusters
    assert 0 < len(got) < 200


def test_hash_sample_biased_equals_decimal_threshold(spark, rows_df):
    """The biased-long threshold compare (round 15) selects EXACTLY the
    rows the DECIMAL form selects — the filter-set equality the
    _sample_u_biased docstring cites (round-15 advice asked for this
    test to exist here, not only at the xhash layer)."""
    from pyspark.sql import functions as F

    for frac in (0.0, 0.3, 0.5, 1.0):
        got = {
            r.event_id
            for r in hash_sample(
                rows_df, "event_id", frac, seed="fs"
            ).collect()
        }
        u_dec = sampling._sample_u(
            F.col("event_id").cast("string"), "fs"
        )
        thr = threshold_for(frac)
        dec = {
            r.event_id
            for r in rows_df.filter(
                u_dec
                < F.lit(str(thr)).cast("decimal(21,0)")
            ).collect()
        }
        assert got == dec, frac


def test_inverse_cluster_sample_branches_agree_past_2_31(spark):
    """Cluster sizes above 2^31 take the DECIMAL fallback branch; sizes
    below take the LONG branch. Both must match the exact integer test
    computed in python (and a size straddling the boundary twice —
    2^31 long, 2^31+1 decimal — pins the seam)."""
    import hashlib

    big = 1 << 31
    rows = [(i, 0, s) for i, s in enumerate(
        [1, 3, big - 1, big, big + 1, big * 1000, 10**15]
    )]
    assign = spark.createDataFrame(
        rows, "doc_id long, cluster_id long, cluster_size long"
    )
    got = {
        r["doc_id"]
        for r in sampling.inverse_cluster_sample(
            assign, seed="seam"
        ).collect()
    }
    expect = set()
    for i, _c, size in rows:
        u = int(
            hashlib.md5(f"seam\x1f{i}".encode()).hexdigest()[:16], 16
        )
        if u * size < 2**64:
            expect.add(i)
    assert got == expect


def test_sample_state_biased_matches_decimal_form(spark, rows_df):
    """Round 16: sample_state carries h as the biased long. The kept
    (v) sets, ranks, and the PUBLISHED threshold/estimate must equal
    the old DECIMAL form exactly — reimplemented inline."""
    from pyspark.sql import functions as F

    k = 4  # rows_df has 7 distinct user_ids > k: threshold is REAL
    got = sampling.sample_read(
        sampling.sample_state(rows_df, (), "user_id", k=k, seed="st"),
        (),
        k=k,
    ).collect()
    # old DECIMAL form: distinct values, decimal draw, bottom-k
    dec_rows = (
        rows_df.select(F.col("user_id").cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .withColumn("h", sampling._sample_u(F.col("v"), "st"))
        .orderBy(F.col("h").asc(), F.col("v").asc())
        .limit(k)
        .collect()
    )
    assert [r.v for r in got] == [r.v for r in dec_rows]
    n_kept = len(dec_rows)
    thr = int(dec_rows[-1].h) if n_kept >= k else None
    for r in got:
        assert r.n_kept == n_kept
        if thr is None:
            assert r.threshold is None
        else:
            assert int(r.threshold) == thr


def test_inverse_cluster_sample_is_a_pure_filter(spark):
    """Scale posture: a projection+filter on the assignment — the plan
    must carry no exchange and no python stage."""
    assign = spark.createDataFrame(
        [(i, 0, 10) for i in range(20)],
        "doc_id long, cluster_id long, cluster_size long",
    )
    plan = (
        sampling.inverse_cluster_sample(assign, seed="s")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
