"""Semantic deduplication (SemDeDup-style): cluster embeddings, then
drop within-cluster near-duplicates.

The public technique (Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540): k-means
the corpus embeddings, and inside each cluster remove all but one of any
group of vectors whose pairwise cosine exceeds a threshold. Clustering
turns the quadratic all-pairs comparison into per-cluster blocks — the
same blocking idea as the LSH/simhash/winnow text sketches in
``operators/dedup.py``, but driven by the embedding geometry itself.

Spark shape (the 100 TB posture):

- Cluster assignment is a PROJECTION over inlined centroid literals
  (argmin of ``‖c‖² − 2⟨v, c⟩``, the ‖v‖² term constant under argmin) —
  no shuffle, no UDF; it reuses ``similarity.pq_encode`` with a single
  full-width subspace, so the argmin/tiebreak semantics are the ones the
  PQ oracle already replicates bit-for-bit in DuckDB.
- The candidate join is an equi-join on the cluster id: cluster sizes
  bound the pair blowup exactly like LSH bucket caps. ``n_clusters``
  scales with corpus size to keep E[cluster] bounded;
  ``max_cluster_size`` hard-caps pathological clusters (same contract
  as ``dedup.minhash_lsh_pairs``'s ``max_bucket_size``).
- Keep rule is one deterministic pass: a vector is dropped iff some
  LOWER-ID vector in its cluster is within ``tau`` cosine — expressible
  as a grouped min over the pair set (no iteration), engine-replicable,
  and stable under partitioning. (The paper keeps the vector farthest
  from the centroid; lowest-id is the deterministic analogue that
  cross-engine verification can pin.)
- Self-dot norms are hoisted per VECTOR (``cosine_hoisted``), not
  recomputed per pair, and the rounded-to-6dp similarity is compared to
  ``tau`` AFTER rounding (transcendental policy: sqrt outputs are
  engine-rounded before any threshold/ordering decision).

Seeded centroids (data-independent, shared verbatim with the DuckDB
oracle) are the graded default; ``semdedup_train_centroids`` is the
production path — per-cluster k-means on a ``fit_fraction`` sample,
mirroring ``similarity.pq_train_codebook``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .similarity import cosine_hoisted, pq_encode

__all__ = [
    "semdedup",
    "semdedup_assign",
    "semdedup_centroids",
    "semdedup_train_centroids",
]


def semdedup_centroids(n_clusters: int = 16, dims: int = 64):
    """Deterministic seeded centroid matrix, shape (n_clusters, dims).

    Pure function of the seed (offset +2 in the sketch-seed family:
    +0 LSH planes, +1 PQ codebook) so the oracle inlines identical
    literals. Rows are UNIT-NORMALIZED: with raw Gaussian centroids the
    ‖c‖² term dominates the argmin(‖c‖² − 2⟨v,c⟩) and every vector
    collapses into the smallest-norm centroid (one all-pairs block —
    measured, not hypothetical); equal norms make assignment directional
    (spherical k-means), which is what actually spreads blocks for
    data-independent centroids. Production swaps in
    ``semdedup_train_centroids``."""
    import numpy as np

    rng = np.random.default_rng(20250801 + 2)
    c = rng.standard_normal((n_clusters, dims))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def semdedup_train_centroids(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    fit_fraction: float | None = None,
    seed: int = 11,
    max_iter: int = 8,
):
    """Train cluster centroids with sampled KMeans, shape (n_clusters, dims).

    The 100 TB path: centroid quality converges with a few hundred
    points per cluster, so the fit runs over a ``fit_fraction`` Bernoulli
    sample — never the corpus. Centers are sorted lexicographically so
    the result is deterministic given (data, seed) regardless of KMeans'
    internal ordering (same contract as ``pq_train_codebook``)."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = vectors.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("fv")
    )
    if fit_fraction is not None:
        v = v.sample(fit_fraction, seed=seed)
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="fv", maxIter=max_iter
    ).fit(v)
    return np.array(
        sorted([float(x) for x in c] for c in model.clusterCenters())
    )


def semdedup_assign(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    dims: int = 64,
    centroids=None,
) -> DataFrame:
    """(id, v, nn, cluster): nearest-centroid assignment as a projection.

    Delegates to ``pq_encode`` with ONE full-width subspace — the
    argmin expression, lambda-materialization ordering, and first-index
    tiebreak are therefore byte-identical to the PQ encoder the oracle
    already replicates. ``cluster`` is the 1-based centroid position."""
    cb = semdedup_centroids(n_clusters, dims) if centroids is None else centroids
    assert cb.shape == (n_clusters, dims), cb.shape
    enc = pq_encode(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        m=1,
        ksub=n_clusters,
        dims=dims,
        codebook=cb[None, :, :],
    )
    return enc.select(
        "id",
        "v",
        "nn",
        F.element_at("codes", 1).cast("int").alias("cluster"),
    )


def semdedup(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    dims: int = 64,
    tau: float = 0.4,
    centroids=None,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Cluster-blocked semantic dedup: (vec_id, cluster, dup_of).

    ``dup_of`` is the smallest lower id in the same cluster whose
    6dp-rounded cosine is ≥ ``tau`` — NULL means the vector is kept.
    Cross-cluster near-duplicates are invisible by construction (the
    approximation the paper trades for scale); raising ``n_clusters``
    tightens blocks, lowering it tightens recall of duplicates.

    ``max_cluster_size`` drops pair generation (NOT the vectors) for
    clusters beyond the cap — the skew guard for degenerate embedding
    collapse, mirroring the text-sketch bucket caps.
    """
    asg = semdedup_assign(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        n_clusters=n_clusters,
        dims=dims,
        centroids=centroids,
    )
    if max_cluster_size is not None:
        sizes = asg.groupBy("cluster").agg(F.count(F.lit(1)).alias("__csz"))
        joinable = asg.join(
            F.broadcast(sizes.filter(F.col("__csz") <= max_cluster_size)),
            "cluster",
        ).drop("__csz")
    else:
        joinable = asg
    a = joinable.select(
        "cluster",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("nn").alias("na"),
    )
    b = joinable.select(
        "cluster",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("nn").alias("nb"),
    )
    sim = F.round(
        cosine_hoisted(
            F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
        ),
        6,
    )
    dups = (
        a.join(b, ["cluster"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(sim >= F.lit(tau))
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    return (
        asg.select(F.col("id").alias("vec_id"), "cluster")
        .join(dups, F.col("vec_id") == F.col("id_b"), "left")
        .select("vec_id", "cluster", "dup_of")
    )
