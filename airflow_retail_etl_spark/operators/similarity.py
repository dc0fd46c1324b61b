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
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    )
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("sim"),
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


def _hyperplane_weight(table: int, plane: int, dim: int) -> Column:
    """Deterministic pseudo-random weight in [-1, 1): derived from xxhash64
    of the (table, plane, dim) index — reproducible across runs and engines,
    no RNG state to ship."""
    h = F.xxhash64(F.lit((table * 131 + plane) * 100003 + dim))
    return (F.pmod(h, F.lit(2001)) - F.lit(1000)) / F.lit(1000.0)


def lsh_signature(vec: Column, *, table: int, planes: int, dims: int) -> Column:
    """Bit-signature for one hash table: sign of ⟨v, plane_p⟩ per plane,
    packed into a bigint bucket key."""
    sig = F.lit(0).cast("bigint")
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[_hyperplane_weight(table, p, d) for d in range(dims)]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(proj >= 0, F.lit(1 << p).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    return sig


def _with_buckets(
    df: DataFrame, vec_name: str, *, tables: int, planes: int, dims: int
) -> DataFrame:
    """Explode each vector into its (table, bucket) memberships.

    explode_outer: plain explode lets Catalyst infer a non-empty-array
    filter that re-inlines the (expensive) signature expressions; the
    literal array is never empty, so outer semantics are identical."""
    return df.withColumn(
        "tb",
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        lsh_signature(
                            F.col(vec_name), table=t, planes=planes, dims=dims
                        ).alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ),
    ).select(*df.columns, "tb.table", "tb.bucket")


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
    c = _with_buckets(
        vectors.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cv"),
        ),
        "cv",
        tables=tables,
        planes=planes,
        dims=dims,
    )
    q = _with_buckets(
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("qv"),
        ),
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
        cosine(F.col("qv"), F.col("cv")).alias("sim"),
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
    )
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        cosine(F.col("a.v"), F.col("b.v")).alias("sim"),
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
