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
            F.round(F.col("sim"), 6).alias("sim"),
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
    tables: int = 16,
    dims: int = 64,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    L independent tables of p planes each: a candidate is any vector sharing
    a bucket with the query in ≥1 table, so recall for a pair with per-plane
    collision prob q is 1-(1-q^p)^L. Defaults (p=4, L=16) target high recall
    on weakly-clustered data; raise ``planes`` as corpus density grows to
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
            F.round(F.col("sim"), 6).alias("sim"),
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
        .select("id_a", "id_b", F.round(F.col("sim"), 6).alias("sim"))
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

    ``fit_fraction`` trains the quantizer on a seeded Bernoulli sample of
    the corpus — THE 100 TB path: centroid quality converges with a few
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
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = (
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cv"),
        )
        .withColumn("cc", dot(F.col("cv"), F.col("cv")))
        .withColumn("fv", array_to_vector(F.col("cv")))
    )
    fit_input = (
        v if fit_fraction is None else v.sample(fit_fraction, seed=seed)
    )
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
    assigned = model.transform(v).select("neighbor_id", "cv", "cc", "cell")

    # centroids as a tiny literal table: (cell, centroid array)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    centers_df = vectors.sparkSession.createDataFrame(
        centers, ["cell", "centroid"]
    )

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qq", dot(F.col("qv"), F.col("qv")))
    # rank cells per query by centroid distance, keep n_probe
    qc = q.crossJoin(F.broadcast(centers_df)).select(
        "query_id",
        "qv",
        "qq",
        "cell",
        dot(F.col("qv"), F.col("centroid")).alias("aff"),
    )
    w_cells = Window.partitionBy("query_id").orderBy(
        F.col("aff").desc(), F.col("cell").asc()
    )
    probed = (
        qc.withColumn("cr", F.row_number().over(w_cells))
        .filter(F.col("cr") <= n_probe)
        .select("query_id", "qv", "qq", "cell")
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
            F.round(F.col("sim"), 6).alias("sim"),
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
    v = vectors.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
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
        "id_a", "id_b", F.round(F.col("sim"), 6).alias("sim")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compressed-domain ANN scan + exact rescore
# ---------------------------------------------------------------------------


def _pq_codebook(m: int, ksub: int, dsub: int):
    """Deterministic seeded PQ codebook, shape (m, ksub, dsub).

    Data-independent by design (same rationale as _plane_matrix): the
    codebook is a pure function of the seed, so the DuckDB oracle inlines
    the identical centroids as literals and replicates ENCODING and ADC
    bit-for-bit. Production systems would k-means each subspace on a
    corpus sample; that swaps the literals, not the plan.
    """
    import numpy as np

    rng = np.random.default_rng(20250801 + 1)
    return rng.standard_normal((m, ksub, dsub))


def _pq_literals(m: int, ksub: int, dsub: int):
    """(centroids, c2) as Column literals shared verbatim with the oracle.

    c2 (squared centroid norms) is NOT recomputed per engine — it is a
    numpy-computed constant injected into both plans, so argmin inputs
    are identical doubles everywhere.
    """
    import numpy as np

    cb = _pq_codebook(m, ksub, dsub)
    cent = F.array(*[
        F.array(*[F.lit(float(x)) for x in cb[s, j]])
        for s in range(m)
        for j in range(ksub)
    ])
    c2 = F.array(*[
        F.lit(float(np.dot(cb[s, j], cb[s, j])))
        for s in range(m)
        for j in range(ksub)
    ])
    return cent, c2


def pq_encode(
    vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    dims: int = 64,
) -> DataFrame:
    """Encode each vector as ``m`` sub-codes: (id, v, nn, codes).

    code[s] = argmin_j ‖v_s − c_sj‖² computed as c2 − 2·⟨v_s, c_sj⟩ (the
    ‖v_s‖² term is constant under the argmin), entirely with built-in
    HOFs over inlined centroid literals — engine-replicable, first-index
    tiebreak (array_position ≡ list_position). The distance table is
    materialized behind an exchange before the argmin projection (the
    Catalyst lambda re-evaluation trap — see operators/dedup.py).

    Codes are 1-based centroid positions; 100 TB storage cost is
    m·log₂(ksub) bits per vector (here 8 nibbles) vs dims·8 B raw.
    """
    dsub = dims // m
    cent, c2 = _pq_literals(m, ksub, dsub)
    base = vectors.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).withColumn("nn", dot(F.col("v"), F.col("v"))).repartition("id")
    dists = base.select(
        "id",
        "v",
        "nn",
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
    ).repartition("id")
    return dists.select(
        "id",
        "v",
        "nn",
        F.transform(
            F.col("ds"), lambda d: F.array_position(d, F.array_min(d))
        ).alias("codes"),
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

    At 100 TB this composes with IVF cells (encode per cell, scan probed
    cells only); the scan shuffles (query_id, neighbor_id, adc) keys
    only — vectors re-attach to the shortlist.
    """
    dsub = dims // m
    cent, _ = _pq_literals(m, ksub, dsub)
    enc = pq_encode(
        vectors, id_col=id_col, vec_col=vec_col, m=m, ksub=ksub, dims=dims
    ).withColumnsRenamed({"id": "neighbor_id", "v": "cv", "nn": "cc"})
    q = queries.select(
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
    adc = (
        enc.select("neighbor_id", "cc", "codes")
        .crossJoin(F.broadcast(q.select("query_id", "qq", "lut")))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    F.lit(0.0),
                    lambda acc, s: acc
                    + F.element_at(
                        F.col("lut"),
                        # array_position yields LONG; element_at wants INT
                        (
                            s * ksub + F.element_at(F.col("codes"), s + 1)
                        ).cast("int"),
                    ),
                )
                / F.sqrt(F.col("qq") * F.col("cc")),
                6,
            ).alias("adc"),
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    cand = (
        adc.withColumn("sr", F.row_number().over(w_short))
        .filter(F.col("sr") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    rescored = (
        cand.join(enc.select("neighbor_id", "cv", "cc"), "neighbor_id")
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
            F.round(F.col("sim"), 6).alias("sim"),
        )
    )
