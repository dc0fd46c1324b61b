"""Vector similarity search over embedding columns (SURVEY §7.4).

- cosine / dot products: built-in higher-order functions over
  array<double> — sequential left-fold, deterministic, JVM-side.
- brute-force top-k: broadcast the (small) query set against the corpus;
  per-query ranking via window row_number. Exact baseline.
- LSH ANN: random-hyperplane signatures (deterministic, hash-derived
  planes), bucket join, verify-with-exact-cosine. The scale path: candidate
  generation is linear, comparisons happen only inside buckets.
- cosine near-dup pairs: block by LSH signature for scale, or brute force
  for the exact oracle.

Vectors are cast float→double before any arithmetic (exact), so results are
engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions.columns import pub_round
from airflow_retail_etl_spark.functions.partitioning import _spread_id


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a sequential left fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """dot/(sqrt(|a|²·|b|²)) — single sqrt of the product, matching the
    oracle formulation exactly."""
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))


def cosine_hoisted(a: Column, b: Column, aa: Column, bb: Column) -> Column:
    """cosine() with the self-dots precomputed per VECTOR instead of per
    PAIR. ``aa``/``bb`` must be ``dot(v, v)`` of the respective side —
    then dot(a,b)/sqrt(aa·bb) is the bit-identical float expression with
    one 64-element fold per pair instead of three. On an n×m candidate
    set this is the difference between (n+m) and 2·n·m self-dot folds."""
    return dot(a, b) / F.sqrt(aa * bb)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` (small — broadcast) × ``vectors`` (corpus) → per-query
    window top-k. Self-matches (same id) are excluded. Output:
    (query_id, neighbor_id, rank, sim) with a deterministic id tiebreak.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qq", dot(F.col("qv"), F.col("qv")))
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cc", dot(F.col("cv"), F.col("cv")))
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        cosine_hoisted(
            F.col("qv"), F.col("cv"), F.col("qq"), F.col("cc")
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            pub_round(F.col("sim"), 6).alias("sim"),
        )
    )


def _plane_matrix(tables: int, planes: int, dims: int):
    """Deterministic hyperplane matrix (dims × tables·planes).

    Seeded PCG64 — no RNG state travels with the job; every executor and
    every retry derives the identical planes. These signatures never feed a
    cross-engine oracle (candidate generation only), so Python-side
    derivation is fine.
    """
    import numpy as np

    rng = np.random.default_rng(20250801)
    return rng.standard_normal((dims, tables * planes))


def _bucket_signatures_udf(tables: int, planes: int, dims: int):
    """Arrow-batched signature computation: one matmul per batch.

    This is the one place in the engine where built-in expressions can't
    express the math efficiently — 96 hyperplane projections per vector as
    HOF expressions build a ~30k-node plan that Catalyst analyzes slowly
    and evaluates interpreted. A vectorized pandas_udf does
    (batch × dims) @ (dims × tables·planes) in one BLAS call and packs sign
    bits per table. Returns array<bigint> of length ``tables``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    weights = _plane_matrix(tables, planes, dims)
    bit_weights = 1 << np.arange(planes, dtype=np.int64)

    # no type hints: `from __future__ import annotations` stringifies them
    # and pyspark's hint resolver can't see the local pandas import
    @pandas_udf("array<bigint>")
    def buckets(emb):
        mat = np.vstack(emb.to_numpy()).astype(np.float64)  # (n, dims)
        proj = mat @ weights  # (n, tables*planes)
        bits = (proj >= 0).astype(np.int64).reshape(-1, tables, planes)
        packed = bits @ bit_weights  # (n, tables)
        return pd.Series(list(packed))

    return buckets


def _with_buckets(
    df: DataFrame, vec_name: str, *, tables: int, planes: int, dims: int
) -> DataFrame:
    """Explode each vector into its (table, bucket) memberships.

    posexplode_outer gives (table index, bucket) directly; _outer avoids
    Catalyst inferring a size()>0 filter that would re-run the UDF below
    the shuffle boundary (see operators/dedup.py for the pathology).
    """
    udf = _bucket_signatures_udf(tables, planes, dims)
    with_sig = df.withColumn("__buckets", udf(F.col(vec_name)))
    return with_sig.select(
        *df.columns,
        F.posexplode_outer("__buckets").alias("table", "bucket"),
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 4,
    tables: int = 24,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    L independent tables of p planes each: a candidate is any vector sharing
    a bucket with the query in ≥1 table, so recall for a pair with per-plane
    collision prob q is 1-(1-q^p)^L. Defaults (p=4, L=24) measure ≥0.94
    recall even on uniformly random vectors (LSH's worst case — test-pinned
    at a 0.8 floor); raise ``planes`` as corpus density grows to
    keep buckets small (bucket count is 2^p per table). Candidates are
    scored with exact cosine, so returned sims are exact; only recall is
    approximate.
    """
    # self-dots hoisted BEFORE the table explode: one fold per vector, not
    # one per (vector × table × candidate) row downstream
    c = _with_buckets(
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cv"),
        ).withColumn("cc", dot(F.col("cv"), F.col("cv"))),
        "cv",
        tables=tables,
        planes=planes,
        dims=dims,
    )
    q = _with_buckets(
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("qv"),
        ).withColumn("qq", dot(F.col("qv"), F.col("qv"))),
        "qv",
        tables=tables,
        planes=planes,
        dims=dims,
    )
    pairs = c.join(
        F.broadcast(q), on=["table", "bucket"], how="inner"
    ).filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        cosine_hoisted(
            F.col("qv"), F.col("cv"), F.col("qq"), F.col("cc")
        ).alias("sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            pub_round(F.col("sim"), 6).alias("sim"),
        )
    )


def lsh_neardup_pairs(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_sim: float = 0.8,
    planes: int = 8,
    tables: int = 12,
    dims: int = 64,
) -> DataFrame:
    """Embedding near-dup pairs at scale: LSH block → exact-cosine verify.

    Pairs are compared only when they share a bucket in ≥1 of the L tables.
    For genuinely near-duplicate vectors (cosine ≥ 0.8 ⇒ angle ≤ 37° ⇒
    per-plane agreement q ≥ 0.8) recall is 1-(1-q^p)^L ≈ 0.94+ at the
    defaults, while unrelated vectors rarely collide across p=8 planes.
    Every candidate is verified with exact cosine, so precision is exact.
    """
    base = vectors.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nn", dot(F.col("v"), F.col("v")))
    banded = _with_buckets(
        base, "v", tables=tables, planes=planes, dims=dims
    ).select("id", "table", "bucket")
    # candidate generation on KEYS ONLY: the (table,bucket) self-join and
    # the pair dedup shuffle ~24 bytes/row instead of 2×512B vector
    # payloads × collision multiplicity; vectors re-attach to the (much
    # smaller) deduped candidate set via two id-equi joins — the same
    # verify shape as dedup.minhash_lsh_pairs.
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    verified = candidates.join(
        base.withColumnsRenamed({"id": "id_a", "v": "va", "nn": "na"}), "id_a"
    ).join(
        base.withColumnsRenamed({"id": "id_b", "v": "vb", "nn": "nb"}), "id_b"
    )
    return (
        verified.select(
            "id_a",
            "id_b",
            cosine_hoisted(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            ).alias("sim"),
        )
        .filter(F.col("sim") >= min_sim)
        .select("id_a", "id_b", pub_round(F.col("sim"), 6).alias("sim"))
    )


def _ivf_corpus(vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(neighbor_id, cv, cc, fv): the corpus projection every IVF variant
    starts from — double-cast vector, hoisted self-dot, ML vector form."""
    from pyspark.ml.functions import array_to_vector

    return (
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cv"),
        )
        .withColumn("cc", dot(F.col("cv"), F.col("cv")))
        .withColumn("fv", array_to_vector(F.col("cv")))
    )


def _fit_sample(df: DataFrame, key: Column, fraction: float, seed: int) -> DataFrame:
    """Layout-independent fit sample: keep iff md5-u64(seed, key) < f·2^64.

    ``DataFrame.sample(fraction, seed)`` is seed-deterministic only FOR A
    FIXED PARTITION LAYOUT — in a shared session, AQE history / shuffle
    conf / cache residue perturb the layout, the Bernoulli draw, and
    therefore the trained codebook and its recall (round-10 in-suite
    flake: recall 0.78 in-suite vs 0.94 isolated for the identical call).
    A content-hash threshold draw (the ``operators.sampling`` machinery)
    makes the fit set a pure per-row predicate of the DATA: membership
    survives any repartitioning, caching, or session state by
    construction, so in-suite and isolated fits are identical.
    """
    from airflow_retail_etl_spark.operators.sampling import (
        _sample_u,
        threshold_for,
    )

    thr = F.lit(str(threshold_for(fraction))).cast("decimal(21,0)")
    return df.filter(_sample_u(key, str(seed)) < thr)


def _lloyd_numpy(x, k: int, *, seed: int, max_iter: int):
    """Plain Lloyd iterations on an in-memory sample: seeded distinct-row
    init, argmin assignment (first-index tiebreak), mean update, empty
    clusters keep their previous center. Lexicographically sorted on
    return."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n = len(x)
    if n == 0:
        raise ValueError("empty training sample for semdedup centroids")
    init_idx = rng.choice(n, size=min(k, n), replace=False)
    c = x[np.sort(init_idx)].astype(float).copy()
    if len(c) < k:  # fewer sample rows than clusters: pad by repetition
        c = np.vstack([c, c[rng.integers(0, len(c), k - len(c))]])
    for _ in range(max_iter):
        # ‖x−c‖² = ‖x‖² − 2x·cᵀ + ‖c‖²; the ‖x‖² term is argmin-constant
        d = -2.0 * (x @ c.T) + (c * c).sum(axis=1)[None, :]
        a = d.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                c[j] = x[m].mean(axis=0)
    return np.array(sorted([float(v) for v in row] for row in c))


#: cluster count above which assignment switches from the inlined-literal
#: Catalyst argmin (oracle-replicable, plan size O(k·dims)) to the
#: Arrow-batched matmul projection (plan size O(1)). The registry/oracle
#: form (16 seeded centroids) stays well under it.
_LITERAL_ASSIGN_MAX_K = 32


def _nearest_centroid_udf(cb, *, base: int = 0):
    """Arrow-batched BLAS argmin assignment over a centroid matrix —
    O(1) plan size, no shuffle (the semdedup matmul strategy, shared by
    the IVF coarse quantizer). Returns a pandas_udf mapping an
    array<double> column to the ``base``-indexed nearest-centroid id
    (first-index tiebreak)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c = np.ascontiguousarray(cb, dtype=float)
    c2 = (c * c).sum(axis=1)

    @pandas_udf("int")
    def _nearest(vs):
        import numpy as _np
        import pandas as _pd

        x = _np.array(vs.tolist(), dtype=float)
        if x.size == 0:
            return _pd.Series([], dtype="int32")
        d = -2.0 * (x @ c.T) + c2[None, :]
        return _pd.Series(d.argmin(axis=1) + base, dtype="int32")

    return _nearest


def _fit_coarse_cells(
    v: DataFrame,
    *,
    n_cells: int,
    seed: int,
    fit_fraction: float | None,
    init_mode: str,
    max_iter: int,
    max_driver_rows: int = 500_000,
):
    """Fit the coarse quantizer and assign cells.

    Returns (assigned, centers_df): ``assigned`` is ``v`` with a ``cell``
    column (fv dropped), ``centers_df`` a tiny (cell, centroid) literal
    table for query-side probing. Shared by ivf_topk and ivf_pq_topk.

    When the (sampled) training set fits ``max_driver_rows``, the Lloyd
    iterations run driver-side in numpy and assignment is the Arrow
    matmul projection — the semdedup round-9 medicine applied to the
    coarse quantizer (Spark ML's estimator + transform cost seconds of
    JVM orchestration per ∝-corpus fit and was most of ann_ivf's sf1
    decade step). Cell geometry gates candidate generation only — the
    rescore is exact and the integrity oracle (probe-all ≡ brute force)
    is fit-independent. Spark ML remains the above-bound fallback.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans

    fit_input = (
        v
        if fit_fraction is None
        else _fit_sample(
            v, F.col("neighbor_id").cast("string"), fit_fraction, seed
        )
    )
    rows = fit_input.select("cv").limit(max_driver_rows + 1).collect()
    if len(rows) <= max_driver_rows:
        x = np.array([r["cv"] for r in rows])
        x = x[np.lexsort(x.T[::-1])]  # layout-independent row order
        cb = _lloyd_numpy(x, n_cells, seed=seed, max_iter=max_iter)
        assigned = v.withColumn(
            "cell", _nearest_centroid_udf(cb)(F.col("cv"))
        ).drop("fv")
        centers = [(i, [float(c) for c in row]) for i, row in enumerate(cb)]
        centers_df = v.sparkSession.createDataFrame(
            centers, ["cell", "centroid"]
        )
        return assigned, centers_df
    # cache the slim training projection: Lloyd's re-reads its input every
    # iteration, and uncached that means maxIter parquet scans + vector
    # conversions. The training set is the SAMPLE (small by design at
    # scale), so memory-only caching is safe; released right after fit.
    fit_df = fit_input.select("fv").cache()
    try:
        model = KMeans(
            k=n_cells,
            seed=seed,
            featuresCol="fv",
            predictionCol="cell",
            initMode=init_mode,
            maxIter=max_iter,
        ).fit(fit_df)
    finally:
        fit_df.unpersist()
    assigned = model.transform(v).drop("fv")

    # centroids as a tiny literal table: (cell, centroid array)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centers_df = v.sparkSession.createDataFrame(centers, ["cell", "centroid"])
    return assigned, centers_df


def _probe_cells(q: DataFrame, centers_df: DataFrame, n_probe: int) -> DataFrame:
    """Attach each query's ``n_probe`` nearest cells (by centroid dot
    affinity, deterministic cell tiebreak). ``q`` needs query_id + qv;
    every other query column rides through."""
    qc = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn("aff", dot(F.col("qv"), F.col("centroid")))
        .drop("centroid")
    )
    w_cells = Window.partitionBy("query_id").orderBy(
        F.col("aff").desc(), F.col("cell").asc()
    )
    return (
        qc.withColumn("cr", F.row_number().over(w_cells))
        .filter(F.col("cr") <= n_probe)
        .drop("cr", "aff")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    fit_fraction: float | None = None,
    init_mode: str = "random",
    max_iter: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: KMeans coarse quantizer + cell probing.

    The corpus is partitioned into ``n_cells`` Voronoi cells (Spark ML
    KMeans, fixed seed → deterministic given the data); each query probes
    its ``n_probe`` nearest cells and scores only those members with exact
    cosine. Versus LSH: better candidate quality on clustered data (cells
    adapt to the distribution), at the cost of a training pass.

    ``fit_fraction`` trains the quantizer on a seeded content-hash sample
    of the corpus (layout-independent — see ``_fit_sample``) — THE 100 TB
    path: centroid quality converges with a few
    hundred points per cell, so training on ~10⁻⁵ of a huge corpus is
    statistically equivalent and removes the only full-data iterative pass.
    Assignment is unchanged either way: one broadcast of the centroid
    matrix, no shuffle of the corpus. None fits on everything (small-data
    default).

    ``init_mode="random"`` + a small ``max_iter`` because a COARSE
    quantizer doesn't need converged Lloyd's: cells only gate candidate
    generation, rescoring is exact. k-means|| init alone costs ~5 extra
    Spark jobs; random init + 4 iterations measures recall identical to
    8 (0.97 at n_probe=12 on the test corpus) at ~40% of the training
    time, and 3 already loses recall. Probe-all correctness is
    independent of centroid quality entirely (tests/test_similarity.py).
    """
    v = _ivf_corpus(vectors, id_col, vec_col)
    assigned, centers_df = _fit_coarse_cells(
        v,
        n_cells=n_cells,
        seed=seed,
        fit_fraction=fit_fraction,
        init_mode=init_mode,
        max_iter=max_iter,
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qq", dot(F.col("qv"), F.col("qv")))
    probed = _probe_cells(q, centers_df, n_probe).select(
        "query_id", "qv", "qq", "cell"
    )

    pairs = assigned.join(F.broadcast(probed), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_hoisted(
            F.col("qv"), F.col("cv"), F.col("qq"), F.col("cc")
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            pub_round(F.col("sim"), 6).alias("sim"),
        )
    )


def cosine_neardup_pairs(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_sim: float | None = None,
    top_pairs: int | None = None,
) -> DataFrame:
    """All-pairs cosine near-duplicates (brute force — the exact verifier).

    For 100 TB use minhash/LSH-bucketed variants; this exact form feeds the
    oracle and small-corpus verification. Returns (id_a, id_b, sim), either
    thresholded or the deterministic top-N most-similar pairs.
    """
    # spread BEFORE the self-join: with a single-file (single row group)
    # source the nested-loop pair scan otherwise runs on ONE partition —
    # all n²/2 dot folds on one core (the AQE/input-split face of the
    # spread trap, functions/partitioning.py)
    v = _spread_id(
        vectors.select(
            F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
        )
    ).withColumn("nn", dot(F.col("v"), F.col("v")))
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cosine_hoisted(
            F.col("a.v"), F.col("b.v"), F.col("a.nn"), F.col("b.nn")
        ).alias("sim"),
    )
    if min_sim is not None:
        pairs = pairs.filter(F.col("sim") >= min_sim)
    if top_pairs is not None:
        pairs = pairs.orderBy(
            F.col("sim").desc(), F.col("id_a").asc(), F.col("id_b").asc()
        ).limit(top_pairs)
    return pairs.select(
        "id_a", "id_b", pub_round(F.col("sim"), 6).alias("sim")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN scan + exact rescore
# ---------------------------------------------------------------------------


def _pq_codebook(m: int, ksub: int, dsub: int):
    """Deterministic seeded PQ codebook, shape (m, ksub, dsub).

    Data-independent by design (same rationale as _plane_matrix): the
    codebook is a pure function of the seed, so the DuckDB oracle inlines
    the identical centroids as literals and replicates ENCODING and ADC
    bit-for-bit. ``pq_train_codebook`` is the production alternative
    (per-subspace k-means on a corpus sample); it swaps the literals,
    not the plan.
    """
    import numpy as np

    rng = np.random.default_rng(20250801 + 1)
    return rng.standard_normal((m, ksub, dsub))


def pq_train_codebook(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    fit_fraction: float | None = None,
    seed: int = 7,
    init_mode: str = "random",
    max_iter: int = 8,
    max_driver_rows: int = 500_000,
):
    """Train a PQ codebook: per-subspace k-means, shape (m, ksub, dsub).

    The production path the seeded codebook stands in for: each of the
    ``m`` subspaces gets its own ``ksub``-center KMeans fit (Spark ML),
    so centroids adapt to the data distribution and ADC distances
    actually discriminate — a random codebook's recall is whatever
    chance gives. ``fit_fraction`` mirrors ivf_topk's sampled fit (THE
    100 TB path: codebook quality converges with a few hundred points
    per centroid, so the m training passes run over a ~10⁻⁵ sample, and
    the sample is cached once for all m fits — never the corpus).

    Deterministic given (data, seed) on the driver path: the fit sample
    is a content-hash draw on ``id_col`` (``_fit_sample`` — membership is
    layout-independent by construction), and when it fits
    ``max_driver_rows`` the per-subspace Lloyd iterations run driver-side
    in numpy over lexicographically-sorted rows (``_lloyd_numpy``, the
    ``_fit_coarse_cells`` / ``semdedup_train_centroids`` strategy): one
    Spark job total instead of m Spark ML estimator fits, and — unlike
    Spark ML KMeans, whose random init draws depend on the partition
    layout — bit-identical codebooks under any repartitioning (pinned in
    tests). Above the bound, Spark ML per subspace is the genuinely
    distributed fallback (deterministic only per-layout there; at that
    scale you persist the codebook as an artifact anyway).

    Centers are sorted lexicographically before assembly on both paths.
    Feed the result to pq_encode / pq_topk / ivf_pq_topk via their
    ``codebook`` argument. The seeded default stays for the cross-engine
    oracle (a trained codebook is data-dependent, so DuckDB could only
    replicate it by re-fitting).
    """
    import numpy as np

    dsub = dims // m
    # layout-independent hash draw on the id (see _fit_sample) BEFORE the
    # id is projected away — the trained codebook must be a pure function
    # of (data, seed), not of the session's partition layout
    if fit_fraction is not None:
        vectors = _fit_sample(
            vectors, F.col(id_col).cast("string"), fit_fraction, seed
        )
    v = vectors.select(as_double(F.col(vec_col)).alias("v"))
    rows = v.limit(max_driver_rows + 1).collect()
    if len(rows) <= max_driver_rows:
        x = np.array([r["v"] for r in rows])
        x = x[np.lexsort(x.T[::-1])]  # layout-independent row order
        cb = np.empty((m, ksub, dsub))
        for s in range(m):
            cb[s] = _lloyd_numpy(
                np.ascontiguousarray(x[:, s * dsub : (s + 1) * dsub]),
                ksub,
                seed=seed + s,
                max_iter=max_iter,
            )
        return cb

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = v.cache()  # one sample materialization shared by all m fits
    try:
        cb = np.empty((m, ksub, dsub))
        for s in range(m):
            sub = v.select(
                array_to_vector(F.slice("v", s * dsub + 1, dsub)).alias("fv")
            )
            model = KMeans(
                k=ksub,
                seed=seed + s,
                featuresCol="fv",
                initMode=init_mode,
                maxIter=max_iter,
            ).fit(sub)
            cb[s] = np.array(
                sorted([float(x) for x in c] for c in model.clusterCenters())
            )
    finally:
        v.unpersist()
    return cb


def _pq_literals(m: int, ksub: int, dsub: int, codebook=None):
    """(centroids, c2) as Column literals shared verbatim with the oracle.

    c2 (squared centroid norms) is NOT recomputed per engine — it is a
    numpy-computed constant injected into both plans, so argmin inputs
    are identical doubles everywhere. ``codebook`` overrides the seeded
    default (pq_train_codebook output); shape must be (m, ksub, dsub).
    """
    import numpy as np

    cb = _pq_codebook(m, ksub, dsub) if codebook is None else codebook
    assert cb.shape == (m, ksub, dsub), cb.shape
    # ONE F.expr string parse instead of m·ksub·dsub F.lit Column objects:
    # the py4j/Connect expression-tree construction is O(literal count)
    # Python round-trips and measured ~5 s at 160×64 doubles (the semdedup
    # ∝-corpus probe regime) vs ~0.1 s for the parser. repr(float) is the
    # shortest round-trip form and Java's parseDouble is correctly
    # rounded, so the parsed doubles are bit-identical to the F.lit path
    # (pinned in tests); the 'D' suffix forces DOUBLE (plain decimal
    # literals parse as DECIMAL in Spark SQL).
    cent = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(x)!r}D" for x in cb[s, j]) + ")"
            for s in range(m)
            for j in range(ksub)
        )
        + ")"
    )
    c2 = F.expr(
        "array("
        + ",".join(
            f"{float(np.dot(cb[s, j], cb[s, j]))!r}D"
            for s in range(m)
            for j in range(ksub)
        )
        + ")"
    )
    return cent, c2


def pq_encode(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    codebook=None,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each vector as ``m`` sub-codes: (id, v, nn, codes[, keep…]).

    code[s] = argmin_j ‖v_s − c_sj‖² computed as c2 − 2·⟨v_s, c_sj⟩ (the
    ‖v_s‖² term is constant under the argmin), entirely with built-in
    HOFs over inlined centroid literals — engine-replicable, first-index
    tiebreak (array_position ≡ list_position). The distance table is
    materialized behind an exchange before the argmin projection (the
    Catalyst lambda re-evaluation trap — see operators/dedup.py).

    Codes are 1-based centroid positions; 100 TB storage cost is
    m·log₂(ksub) bits per vector (here 8 nibbles) vs dims·8 B raw.
    ``codebook`` swaps the seeded literals for a trained one
    (pq_train_codebook); ``keep`` carries extra input columns through
    (ivf_pq_topk rides its cell assignment along this way).
    """
    dsub = dims // m
    cent, c2 = _pq_literals(m, ksub, dsub, codebook)
    base = vectors.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
        *keep,
    ).withColumn("nn", dot(F.col("v"), F.col("v"))).transform(_spread_id)
    dists = base.select(
        "id",
        "v",
        "nn",
        *keep,
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(ksub - 1)),
                lambda j: F.element_at(c2, s * ksub + j + 1)
                - 2.0
                * dot(
                    F.slice(F.col("v"), s * dsub + 1, dsub),
                    F.element_at(cent, s * ksub + j + 1),
                ),
            ),
        ).alias("ds"),
    ).transform(_spread_id)
    return dists.select(
        "id",
        "v",
        "nn",
        *keep,
        F.transform(
            F.col("ds"), lambda d: F.array_position(d, F.array_min(d))
        ).alias("codes"),
    )


def _pq_query_side(
    queries: DataFrame, id_col: str, vec_col: str, cent: Column,
    m: int, ksub: int, dsub: int,
) -> DataFrame:
    """(query_id, qv, qq, lut): per-query LUT of ⟨q_s, c_sj⟩ partial dots
    (m·ksub doubles) — the asymmetric-distance table every ADC scan
    variant broadcasts. Shared by pq_topk and ivf_pq_topk so the two
    can never drift expression-wise."""
    return queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qq", dot(F.col("qv"), F.col("qv"))).withColumn(
        "lut",
        F.transform(
            F.sequence(F.lit(0), F.lit(m * ksub - 1)),
            lambda i: dot(
                F.slice(
                    F.col("qv"),
                    (i / ksub).cast("int") * dsub + 1,
                    dsub,
                ),
                F.element_at(cent, i + 1),
            ),
        ),
    )


def _adc_col(m: int, ksub: int) -> Column:
    """Approximate cosine from the broadcast LUT: m table lookups on the
    row's codes, normalized by the hoisted self-dots, 6dp-rounded BEFORE
    shortlist ranking for engine-stable order. Expects columns
    lut/codes/qq/cc in scope."""
    return F.round(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, s: acc
            + F.element_at(
                F.col("lut"),
                # array_position yields LONG; element_at wants INT
                (s * ksub + F.element_at(F.col("codes"), s + 1)).cast("int"),
            ),
        )
        / F.sqrt(F.col("qq") * F.col("cc")),
        6,
    )


def _pq_shortlist_rescore(
    adc: DataFrame,
    enc: DataFrame,
    q: DataFrame,
    *,
    k: int,
    shortlist: int,
    join_on: tuple[str, ...] = ("neighbor_id",),
) -> DataFrame:
    """Top-``shortlist`` by ADC per query → exact-cosine rescore → top-k.

    The scan output shuffles (query_id, neighbor_id, adc) keys only;
    vectors re-attach to the (tiny) shortlist via the enc join.
    ``join_on`` lets a partition-pruned caller (the persisted index) join
    on (cell, neighbor_id) so the rescore scan prunes to probed cells."""
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        adc.withColumn("sr", F.row_number().over(w_short))
        .filter(F.col("sr") <= shortlist)
        .select("query_id", *join_on)
    )
    rescored = (
        cand.join(enc.select(*join_on, "cv", "cc"), list(join_on))
        .join(F.broadcast(q.select("query_id", "qv", "qq")), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_hoisted(
                F.col("qv"), F.col("cv"), F.col("qq"), F.col("cc")
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            pub_round(F.col("sim"), 6).alias("sim"),
        )
    )


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    shortlist: int = 50,
    codebook=None,
) -> DataFrame:
    """PQ ANN: asymmetric-distance scan over codes + exact rescore.

    Each query precomputes a LUT of ⟨q_s, c_sj⟩ partial dots (m·ksub
    doubles, broadcast); scanning a corpus vector is then m table lookups
    on its codes instead of a dims-wide dot — the compressed-domain scan
    that makes exhaustive ANN affordable when vectors no longer fit
    (codes are ~1/64th the bytes). The ADC shortlist (top ``shortlist``
    per query by approximate cosine, rounded to 6dp before ranking for
    engine-stable order) is re-scored with exact cosine, so returned sims
    are exact; only recall is approximate. ``shortlist`` ≥ corpus size
    degenerates to brute force exactly (integrity mode, tested).

    The scan here is EXHAUSTIVE (every code row × every query) — the
    right tool only while the code table is scannable per query. The
    100 TB form is ivf_pq_topk, which gates this same scan by IVF cell
    so each query touches n_probe/n_cells of the corpus. ``codebook``
    swaps the seeded literals for a trained one (pq_train_codebook).
    """
    dsub = dims // m
    cent, _ = _pq_literals(m, ksub, dsub, codebook)
    enc = pq_encode(
        vectors, id_col=id_col, vec_col=vec_col, m=m, ksub=ksub, dims=dims,
        codebook=codebook,
    ).withColumnsRenamed({"id": "neighbor_id", "v": "cv", "nn": "cc"})
    q = _pq_query_side(queries, id_col, vec_col, cent, m, ksub, dsub)
    adc = (
        enc.select("neighbor_id", "cc", "codes")
        .crossJoin(F.broadcast(q.select("query_id", "qq", "lut")))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _adc_col(m, ksub).alias("adc"))
    )
    return _pq_shortlist_rescore(adc, enc, q, k=k, shortlist=shortlist)


def ivf_pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
    shortlist: int = 50,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    fit_fraction: float | None = None,
    init_mode: str = "random",
    max_iter: int = 4,
    codebook=None,
) -> DataFrame:
    """IVF-PQ ANN: coarse cells gate a compressed-domain ADC scan.

    The 100 TB composition pq_topk's docstring promises: the corpus is
    cell-assigned by the sampled-fit coarse quantizer (exactly
    ivf_topk's machinery), PQ codes ride the assignment, and each
    query's LUT scans ONLY its ``n_probe`` probed cells — per-query scan
    cost drops from |corpus| code rows to ~|corpus|·n_probe/n_cells,
    and the scanned rows are m-byte codes, not dims·8 B vectors. The
    ADC shortlist is exact-rescored as in pq_topk, so returned sims are
    exact; recall is governed by (n_probe, shortlist, codebook quality).

    Integrity mode: with ``n_probe = n_cells`` every (query, vector)
    pair is ADC-scored exactly once — the cell join partitions the same
    pair set pq_topk's exhaustive crossJoin enumerates — so the result
    must equal pq_topk with identical parameters regardless of how
    KMeans carved the cells (the oracle-graded form; cells can then
    only lose or duplicate pairs, which the equality would expose).

    ``codebook``: pq_train_codebook output for data-adapted codes; the
    seeded default keeps the DuckDB oracle replicable. Raw vectors (not
    cell residuals) are encoded so codes are cell-independent — one
    codebook serves all cells and integrity mode stays exactly
    comparable; residual encoding would buy finer quantization at the
    cost of coupling codes to the quantizer.
    """
    dsub = dims // m
    cent, _ = _pq_literals(m, ksub, dsub, codebook)

    assigned, centers_df = _fit_coarse_cells(
        _ivf_corpus(vectors, id_col, vec_col),
        n_cells=n_cells,
        seed=seed,
        fit_fraction=fit_fraction,
        init_mode=init_mode,
        max_iter=max_iter,
    )
    # PQ codes ride the cell assignment (keep=): at scale this is the
    # "encode per cell" layout — codes land partitioned by cell, so the
    # probed-cell join prunes the scan to n_probe/n_cells of the table
    enc = pq_encode(
        assigned,
        id_col="neighbor_id",
        vec_col="cv",
        m=m,
        ksub=ksub,
        dims=dims,
        codebook=codebook,
        keep=("cell",),
    ).withColumnsRenamed({"id": "neighbor_id", "v": "cv", "nn": "cc"})

    q = _pq_query_side(queries, id_col, vec_col, cent, m, ksub, dsub)
    probed = _probe_cells(q, centers_df, n_probe).select(
        "query_id", "qq", "lut", "cell"
    )
    adc = (
        enc.select("neighbor_id", "cc", "codes", "cell")
        .join(F.broadcast(probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", _adc_col(m, ksub).alias("adc"))
    )
    return _pq_shortlist_rescore(adc, enc, q, k=k, shortlist=shortlist)


def hard_negative_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 10,
) -> DataFrame:
    """Contrastive hard-negative mining: for each query, the k most
    similar corpus vectors carrying a DIFFERENT label.

    The standard batch-mining step for embedding/reranker training —
    negatives that are semantically close but wrong teach the margin.
    Same plan shape as brute_force_topk (broadcast queries, corpus never
    shuffles, one per-query top-k window); the label-mismatch predicate
    rides the join condition, so the pruning happens before any scoring
    rows materialize. NULL-labeled rows never match (ANSI NULL
    comparison), on either side — unlabeled data can't be asserted
    "different".

    At 100 TB: compose with the ANN shortlists (lsh/ivf/pq) exactly like
    exact kNN — mine negatives from the candidate set, not the corpus;
    this exhaustive form is the verifier/oracle baseline.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("q_label"),
        as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qq", dot(F.col("qv"), F.col("qv")))
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("n_label"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cc", dot(F.col("cv"), F.col("cv")))
    pairs = c.join(
        F.broadcast(q), F.col("n_label") != F.col("q_label")
    ).select(
        "query_id",
        "neighbor_id",
        F.col("n_label").alias("neg_label"),
        cosine_hoisted(
            F.col("qv"), F.col("cv"), F.col("qq"), F.col("cc")
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "neg_label",
            "rank",
            pub_round(F.col("sim"), 6).alias("sim"),
        )
    )


def embedding_dim_stats(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension health audit of an embedding column — the check a
    vector pipeline runs BEFORE trusting ANN/PQ over it: dead dimensions
    (zero variance), scale drift between dims (PQ subspaces assume
    comparable scales), and outlier ranges.

    (dim, n, mean, variance, min_val, max_val), exact and
    partition-invariant: each component is rounded to 6 dp and cast to
    DECIMAL, so the Σx and Σx² accumulations are EXACT integer-scaled
    sums (no FP order dependence — the money_sum policy applied to
    vector components); mean and the population variance
    (Σx² − (Σx)²/n)/n are single divisions at the end, rounded 6 dp.
    min/max compare raw doubles (order-free). One posexplode + one
    dim-keyed aggregation — shuffle rows = n·dims keys only.

    The operand type MUST stay DECIMAL(18,6): x·x is then DECIMAL(37,12)
    — exact. At DECIMAL(24,6) the product precision (49) overflows 38
    and Spark SILENTLY reduces the scale back to 6, rounding every
    per-row square (the decimal-MULTIPLY face of the round-13 division
    trap; found round 15 when a 6dp-rounded sum landed one rounding
    boundary away from DuckDB's exact sum at sf0.001).
    """
    base = (
        vectors.select(
            F.col(id_col).alias("id"),
            as_double(F.col(vec_col)).alias("__v"),
        )
        .select(
            "id",
            "__v",
            F.posexplode(F.col("__v")).alias("dim", "x_raw"),
        )
        .select(
            "dim",
            F.col("x_raw"),
            F.round("x_raw", 6).cast("decimal(18,6)").alias("x"),
        )
    )
    n = F.count(F.lit(1)).cast("decimal(20,0)")
    sx = F.sum("x")
    sxx = F.sum(F.col("x") * F.col("x"))
    return (
        base.groupBy("dim")
        .agg(
            n.alias("n"),
            sx.alias("sx"),
            sxx.alias("sxx"),
            F.min("x_raw").alias("min_val"),
            F.max("x_raw").alias("max_val"),
        )
        .select(
            "dim",
            F.col("n").cast("long").alias("n"),
            # final arithmetic in DOUBLE off the exact decimal sums:
            # decimal division scale rules differ across engines, IEEE
            # double ops on identical exact inputs do not
            pub_round(
                F.col("sx").cast("double") / F.col("n").cast("double"), 6
            ).alias("mean"),
            pub_round(
                (
                    F.col("sxx").cast("double")
                    - F.col("sx").cast("double")
                    * F.col("sx").cast("double")
                    / F.col("n").cast("double")
                )
                / F.col("n").cast("double"),
                6,
            ).alias("variance"),
            "min_val",
            "max_val",
        )
        .orderBy("dim")
    )


def _dim_sums(vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Exact per-dimension component sums (dim, n, sx DECIMAL) — the
    shared sufficient statistic the Gram faces join for covariance.
    Same 6dp-round → DECIMAL accumulation as embedding_dim_stats."""
    return (
        vectors.select(as_double(F.col(vec_col)).alias("__v"))
        .select(F.posexplode("__v").alias("dim", "x_raw"))
        .select(
            "dim",
            F.round("x_raw", 6).cast("decimal(18,6)").alias("x"),
        )
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("sx"),
        )
    )


#: component scaling for the Gram faces: 6dp-rounded components become
#: exact 10⁶-scaled integers, so products are exact 10¹²-scaled longs
#: and sums accumulate losslessly in decimal(38,0) — never decimal
#: DIVISION (Spark reduces an over-precision division's scale to 6,
#: which silently rounds; measured 4e-6 drift building this operator)
_GRAM_SCALE = 10**6


def _scaled_component_expr(vec_col: str):
    """array<long>: each component 6dp-rounded (Spark HALF_UP — shared
    with every DECIMAL face) and scaled by 10⁶ — exact."""
    return F.transform(
        as_double(F.col(vec_col)),
        lambda v: (
            F.round(v, 6).cast("decimal(18,6)")
            * F.lit(_GRAM_SCALE).cast("decimal(7,0)")
        ).cast("long"),
    )


def _gram_publish(
    grams: DataFrame, dim_sums: DataFrame
) -> DataFrame:
    """Shared publication tail of both Gram faces: join the per-dim
    sums and derive sum_xy and covariance off EXACT inputs (``grams``
    is (i, j, n, s_scaled) with s_scaled the exact decimal(38,0) sum of
    10¹²-scaled products). sum_xy is the scaled sum cast to double and
    divided once by 10¹² (two correctly-rounded IEEE ops — engine-
    equal); cov is ONE fixed-order expression, 6dp (the
    embedding_dim_stats policy). Both publications go through ``+ 0.0``
    (``pub_round``) so a value that rounds to zero from below publishes
    ``+0.0`` byte-identically to the oracle's ``ROUND(x, 6) + 0``
    (round-14 driver hash failure: one ``-0.0`` cov)."""
    si = dim_sums.select(
        F.col("dim").alias("i"), F.col("sx").alias("__sxi")
    )
    sj = dim_sums.select(
        F.col("dim").alias("j"), F.col("sx").alias("__sxj")
    )
    nd = F.col("n").cast("double")
    sxy = F.col("s_scaled").cast("double") / F.lit(float(10**12))
    cov = (
        nd * sxy
        - F.col("__sxi").cast("double") * F.col("__sxj").cast("double")
    ) / (nd * nd)
    return (
        grams.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i",
            "j",
            "n",
            (sxy + F.lit(0.0)).alias("sum_xy"),
            pub_round(cov, 6).alias("cov"),
        )
        .orderBy("i", "j")
    )


def embedding_gram(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Upper-triangular Gram + covariance matrix of an embedding column
    — the sufficient statistic for whitening/PCA of an embedding space
    (what a pipeline computes BEFORE deciding the space is healthy
    enough to index: correlated dimensions break PQ subspace
    independence, and `whiten_transform` consumes exactly this output).

    One row per dimension pair i ≤ j: (i, j, n, sum_xy, cov).
    Exact and partition-invariant: components round to 6 dp → DECIMAL,
    so Σxᵢxⱼ accumulates as exact integer-scaled sums (the money_sum
    policy applied to component products — scale 12 holds every product
    of two 6dp components exactly); covariance is one fixed-order
    double expression off the exact sums, rounded 6 dp. This is the
    ORACLE face: it materializes all n·d(d+1)/2 pair terms through a
    per-row self-join, deliberately data-sized so DuckDB can replay it
    bit-for-bit. The scale path with identical output is
    :func:`embedding_gram_matmul` (equality test-pinned).
    """
    ex = (
        vectors.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            _scaled_component_expr(vec_col).alias("__xs"),
        )
        .select("id", F.posexplode("__xs").alias("i", "xl"))
    )
    pairs = ex.alias("a").join(
        ex.alias("b"),
        (F.col("a.id") == F.col("b.id"))
        & (F.col("a.i") <= F.col("b.i")),
    )
    grams = pairs.groupBy(
        F.col("a.i").alias("i"), F.col("b.i").alias("j")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (F.col("a.xl") * F.col("b.xl")).cast("decimal(38,0)")
        ).alias("s_scaled"),
    )
    return _gram_publish(grams, _dim_sums(vectors, id_col, vec_col))


def embedding_gram_matmul(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Production Gram — identical output to :func:`embedding_gram`
    without materializing pair terms: each Arrow batch contributes one
    integer XᵀX partial (numpy int64 matmul over 10⁶-scaled components
    — the blessed vector-matmul Python case, like semdedup assignment),
    and Spark DECIMAL-sums the d(d+1)/2 partials. Every partial is
    EXACT: the 6dp round + 10⁶ scaling happens JVM-SIDE in DECIMAL
    (Spark's HALF_UP — numpy's half-even rounding of binary doubles
    would diverge at half-way points), scaled components are ≤10⁶ in
    magnitude, products ≤10¹², and an Arrow batch (≤10k rows by
    default) bounds a partial at 10¹⁶ ≪ 2⁶³, so the fold is
    bit-identical to the oracle face's DECIMAL sums (test-pinned).
    Shuffle traffic is batches·d(d+1)/2 partial rows — corpus-size-
    independent per batch; at 100 TB this is the form that runs (the
    pair face is the verifier)."""
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("n_part", T.LongType()),
            T.StructField("sxy_part", T.LongType()),
        ]
    )

    def _partials(batches):
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            xi = np.stack(pdf["__xs"].to_numpy()).astype(np.int64)
            # the docstring's exactness bound is an ASSUMPTION about the
            # input (|component| ≤ 1 → scaled ≤ 1e6) and the Arrow batch
            # size — check it, or the int64 matmul wraps SILENTLY and
            # diverges from the DECIMAL oracle face (which would raise
            # under ANSI): max|x|² · rows must stay below 2⁶²
            amax = int(np.abs(xi).max(initial=0))
            if amax and amax * amax > (2**62) // len(xi):
                raise ValueError(
                    "embedding_gram_matmul int64 partial would overflow: "
                    f"max |scaled component| {amax} over an Arrow batch of "
                    f"{len(xi)} rows exceeds the exactness bound "
                    "(|component| <= 1e6 scaled and <=10k-row batches). "
                    "Normalize the embeddings or lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch, or use "
                    "the pair-join face embedding_gram (exact DECIMAL)."
                )
            g = xi.T @ xi  # exact int64 partial (bound checked above)
            i_idx, j_idx = np.triu_indices(g.shape[0])
            yield pd.DataFrame(
                {
                    "i": i_idx.astype("int32"),
                    "j": j_idx.astype("int32"),
                    "n_part": np.int64(len(xi)),
                    "sxy_part": g[i_idx, j_idx],
                }
            )

    partials = (
        vectors.filter(F.col(vec_col).isNotNull())
        .select(_scaled_component_expr(vec_col).alias("__xs"))
        .mapInPandas(_partials, out_schema)
    )
    grams = partials.groupBy("i", "j").agg(
        F.sum("n_part").cast("long").alias("n"),
        # fold exact int64 partials losslessly in decimal(38,0)
        F.sum(F.col("sxy_part").cast("decimal(38,0)")).alias(
            "s_scaled"
        ),
    )
    return _gram_publish(grams, _dim_sums(vectors, id_col, vec_col))


def whiten_transform(
    vectors: DataFrame,
    gram: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-6,
) -> DataFrame:
    """ZCA-whiten an embedding column from :func:`embedding_gram`
    output: assemble the d×d covariance on the driver (d(d+1)/2 rows —
    a bounded driver read of the ann_index codebook class, never data),
    eigendecompose in numpy, and project every vector through the
    broadcast W = U·diag(1/√(λ+eps))·Uᵀ with the Arrow matmul (the
    blessed vector case). Output replaces ``vec_col`` with the whitened
    array<double>. NOT an oracle face — eigendecomposition is iterative
    LAPACK, so the guarantee is the test-pinned property (covariance of
    the output ≈ identity), not cross-engine equality. Means come from
    the same exact dim sums the Gram faces share."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    rows = gram.select("i", "j", "n", "cov").collect()
    if not rows:
        raise ValueError(
            "whiten_transform: gram input is empty — pass the full "
            "output of embedding_gram/embedding_gram_matmul (d(d+1)/2 "
            "upper-triangle rows), not a filtered or failed frame"
        )
    d = max(r["j"] for r in rows) + 1
    if len(rows) != d * (d + 1) // 2:
        raise ValueError(
            f"whiten_transform: gram input has {len(rows)} rows but "
            f"dimension {d} implies {d * (d + 1) // 2} upper-triangle "
            "entries — the frame is partial/filtered; a silently "
            "zero-filled covariance would whiten against the wrong basis"
        )
    n = rows[0]["n"]
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
    lam, u = np.linalg.eigh(cov)
    w = (u * (1.0 / np.sqrt(np.maximum(lam, 0.0) + eps))) @ u.T
    sums = _dim_sums(vectors, id_col, vec_col).collect()
    mean = np.zeros(d)
    for r in sums:
        mean[r["dim"]] = float(r["sx"]) / n

    # no type hints: `from __future__ import annotations` stringifies
    # them and pyspark's hint resolver can't see the local pandas import
    @pandas_udf(T.ArrayType(T.DoubleType()))
    def _project(col):
        x = np.stack(col.to_numpy()).astype(np.float64)
        y = (x - mean) @ w.T
        return pd.Series(list(y))

    return vectors.filter(F.col(vec_col).isNotNull()).withColumn(
        vec_col, _project(as_double(F.col(vec_col)))
    )


def ivf_recall_report(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe_grid: tuple[int, ...] = (1, 2, 4, 8, 16),
    n_cells: int = 16,
    dims: int = 64,
    centroids=None,
) -> DataFrame:
    """Recall@k / scan-cost frontier of IVF probing — the knob-tuning
    report an ANN service publishes before anyone picks ``n_probe``.

    One row per grid point: (n_probe, n_hits, n_pairs, recall_at_k,
    avg_scanned). ``recall_at_k`` = |ANN top-k ∩ exact top-k| / (k·|Q|)
    and ``avg_scanned`` = candidate vectors scanned per query — the cost
    axis (a 100 TB probe's bill is the scanned fraction, so the frontier
    is recall vs scanned, not recall vs wall-clock, which no oracle can
    replay). Deterministic end to end: seeded unit centroids
    (semdedup_centroids — the shared sketch-seed family) make cell
    assignment and the per-query cell ranking (affinity desc, cell asc —
    _probe_cells' tiebreak) engine-replicable literals, candidate sims
    are exact 6dp-rounded cosines (no PQ in this form, so candidates are
    rescored exactly), and with a strict total order (sim desc, id asc)
    the top-k of a candidate set that GROWS with n_probe has
    monotonically non-decreasing overlap with the exact top-k —
    recall is provably monotone and reaches 1.0 at n_probe = n_cells
    (pinned in tests; the PQ-shortlisted persisted-index variant, where
    ADC can evict true neighbors from a fixed shortlist, reports its
    frontier via ann_index.recall_report).

    Shape: assignment is a zero-shuffle argmin projection, the candidate
    join is (query-cells × corpus-cells) on the cell key, the grid is a
    broadcast inequality join against len(grid) literals, and the top-k
    is one window per (query, grid point) — corpus-scale work is ONE
    cell-keyed candidate scan reused by every grid point.
    """
    from airflow_retail_etl_spark.operators.semdedup import (
        semdedup_assign,
        semdedup_centroids,
    )

    spark = vectors.sparkSession
    cb = semdedup_centroids(n_cells, dims) if centroids is None else centroids
    asg = semdedup_assign(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        n_clusters=n_cells,
        dims=dims,
        centroids=cb,
        strategy="literal",
    ).select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nn").alias("cc"),
        F.col("cluster").alias("cell"),
    )
    cent, _c2 = _pq_literals(1, n_cells, dims, cb[None, :, :])
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("qv"),
        )
        .withColumn("qq", dot(F.col("qv"), F.col("qv")))
        .withColumn(
            "aff",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_cells - 1)),
                lambda j: dot(F.col("qv"), F.element_at(cent, j + 1)),
            ),
        )
    )
    w_cells = Window.partitionBy("query_id").orderBy(
        F.col("a").desc(), F.col("cell").asc()
    )
    q_cells = (
        q.select(
            "query_id", "qv", "qq",
            F.posexplode("aff").alias("c0", "a"),
        )
        .withColumn("cell", F.col("c0") + 1)
        .withColumn("cell_rank", F.row_number().over(w_cells))
        .select("query_id", "qv", "qq", "cell", "cell_rank")
    )
    cands = (
        q_cells.join(asg, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cell_rank",
            F.round(
                cosine_hoisted(
                    F.col("qv"), F.col("cv"), F.col("qq"), F.col("cc")
                ),
                6,
            ).alias("sim"),
        )
    )
    grid = spark.range(1).select(
        F.explode(
            F.lit([int(p) for p in n_probe_grid])
        ).alias("n_probe")
    )
    probed = cands.join(
        F.broadcast(grid), F.col("cell_rank") <= F.col("n_probe")
    )
    w_rank = Window.partitionBy("query_id", "n_probe").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    ann_topk = (
        probed.withColumn("r", F.row_number().over(w_rank))
        .filter(F.col("r") <= k)
        .select("n_probe", "query_id", "neighbor_id")
    )
    exact = brute_force_topk(
        vectors, queries, id_col=id_col, vec_col=vec_col, k=k
    ).select("query_id", "neighbor_id")
    hits = (
        ann_topk.join(exact, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("n_probe")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    scanned = probed.groupBy("n_probe").agg(
        F.count(F.lit(1)).alias("n_scanned")
    )
    n_q = queries.count()
    # denominator = the ACTUAL ground-truth pair count, not |Q|*k:
    # brute_force_topk excludes self-matches and returns < k rows per
    # query when the corpus has fewer than k+1 vectors, so |Q|*k would
    # understate recall and cap it below 1.0 on small corpora
    n_pairs = exact.count()
    return (
        grid.join(hits, "n_probe", "left")
        .join(scanned, "n_probe", "left")
        .select(
            "n_probe",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.lit(int(n_pairs)).cast("long").alias("n_pairs"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.lit(int(n_pairs)), 6
            ).alias("recall_at_k"),
            F.round(
                F.coalesce("n_scanned", F.lit(0)) / F.lit(int(n_q)), 6
            ).alias("avg_scanned"),
        )
        .orderBy("n_probe")
    )


def grouped_topk(
    vectors: DataFrame,
    query: DataFrame,
    *,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    shards: int = 32,
) -> DataFrame:
    """Filtered/grouped exact vector search: the top-``k`` cosine
    neighbors of ONE query vector WITHIN every group — "nearest
    neighbors per language / per source / per shard" is the filtered-ANN
    shape production vector stores serve, and the evaluation primitive
    behind per-slice hard-negative mining.

    Grouped top-k discipline (SCALE.md "Grouped top-k/bottom-k"): a
    single per-group window caps parallelism at |groups| and one task
    sorts the whole group — at 10 labels over a corpus that is 10 cores
    of a 1000-core cluster. Phase 1 trims to k per (group, id-shard)
    (shard = md5 bucket of the id — layout-independent), phase 2 trims
    the ≤ shards·k survivors per group; (sim DESC, id ASC) is a strict
    total order, so the result is IDENTICAL to the one-window form
    (test-pinned). Scoring reuses cosine_hoisted — one 64-element fold
    per pair, self-dots hoisted per vector; the query row is broadcast.
    """
    from airflow_retail_etl_spark.functions import xhash

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    # bounded check (limit 2, never the corpus): a multi-row query frame
    # would silently interleave different queries' scores inside one
    # group ranking — fail with a name instead
    n_q = query.limit(2).count()
    if n_q != 1:
        raise ValueError(
            f"grouped_topk takes exactly ONE query row, got "
            f"{'0' if n_q == 0 else '2+'} — for multi-query grouped "
            "search run per query (the broadcast side must be a single "
            "vector for the per-group ranking to be well-defined)"
        )
    q = query.select(
        F.col(id_col).alias("__qid"),
        as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qq", dot(F.col("qv"), F.col("qv")))
    c = vectors.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cc", dot(F.col("cv"), F.col("cv")))
    scored = c.join(
        F.broadcast(q), F.col("__id") != F.col("__qid")
    ).select(
        "__g",
        "__id",
        cosine_hoisted(
            F.col("qv"), F.col("cv"), F.col("qq"), F.col("cc")
        ).alias("__sim"),
    )
    # LONG-domain md5 mod (round 15): same value, no per-row BigDecimal
    shard = xhash.md5_u64_mod(
        F.col("__id").cast("string"), shards
    ).cast("int")
    order = [F.col("__sim").desc(), F.col("__id").asc()]
    w1 = Window.partitionBy("__g", "__shard").orderBy(*order)
    w2 = Window.partitionBy("__g").orderBy(*order)
    return (
        scored.withColumn("__shard", shard)
        .withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__g").alias(group_col),
            "rank",
            F.col("__id").alias(id_col),
            pub_round(F.col("__sim"), 6).alias("sim"),
        )
    )
