"""Deterministic sampling operators for training-data pipelines.

Random sampling (``df.sample``) is non-reproducible across runs, engines,
and partitionings — useless for a pipeline whose sample membership must be
auditable and re-derivable at 100 TB. These operators sample by HASH: a row
is in the sample iff a 64-bit md5-derived integer of its key falls under a
threshold. Properties that matter at scale:

- **Embarrassingly parallel** — membership is a pure per-row predicate; no
  shuffle, no coordination, survives any repartitioning. ``sample_exact_k``
  adds one window (one shuffle on the strata key) for exact-size strata.
- **Deterministic & engine-portable** — md5 arithmetic is integer-exact in
  both Spark and DuckDB (functions.xhash), so the oracle reproduces the
  exact sample, and reruns/backfills select identical rows.
- **Consistent across tables** — hashing the same key column (e.g.
  user_id) in two tables yields ALIGNED samples: the sampled fact rows
  always find their sampled dimension rows (the "consistent sampling"
  property hash-threshold gives for free and RNG sampling cannot).
- **Uniform** — md5 output bits are uniform, so P(u < f·2^64) = f per
  stratum; smallest-k-by-hash is a uniform without-replacement draw
  (the bottom-k / KMV construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions import xhash
from airflow_retail_etl_spark.operators.selection import global_cumsum

#: u is uniform on [0, 2^64); keep iff u < fraction · 2^64
TWO64 = xhash.TWO64


def _sample_u(key: Column, seed: str) -> Column:
    """Uniform 64-bit draw (DECIMAL 20,0) from a seeded key.

    Unseeded draws hash the bare key so the oracle twin is just
    ``md5(CAST(key AS VARCHAR))``; seeded draws join seed and key with an
    explicit 0x1F unit separator so (seed="a", key="bc") and (seed="ab",
    key="c") cannot collide.
    """
    if seed == "":
        return xhash.md5_u64(key)
    return xhash.md5_u64(F.concat_ws("\x1f", F.lit(seed), key))


def threshold_for(fraction: float) -> int:
    """Integer keep-threshold for a sampling fraction (exact, no FP compare)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return int(fraction * TWO64)


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, *, seed: str = ""
) -> DataFrame:
    """Uniform deterministic sample: keep iff md5-u64(seed,key) < f·2^64."""
    thr = F.lit(str(threshold_for(fraction))).cast("decimal(21,0)")
    return df.filter(_sample_u(F.col(key_col).cast("string"), seed) < thr)


def hash_split(
    df: DataFrame,
    key_col: str,
    boundaries: list[tuple[str, float]],
    *,
    default: str,
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic categorical split on the md5 draw of ``key_col``:
    label_i iff u < boundary_i·2^64 (ascending cumulative upper bounds),
    else ``default`` — the train/val/test assignment as a pure per-row
    predicate (same membership under any layout, rerun, or engine; a
    document never migrates between splits when the corpus grows).

    Split on the right KEY for the leakage model: hashing doc_id splits
    DOCUMENTS independently, so near-duplicates straddle splits and eval
    leaks training text; hashing a dup-CLUSTER id (connected components
    over near-dup pairs) keeps every version of a passage in one split
    (the `leakage_safe_split` registry query). Hashing user_id keeps a
    user's sessions together — pick the entity whose leakage matters.
    """
    fracs = [b for _, b in boundaries]
    # STRICTLY ascending: a tied boundary makes the later label's
    # interval empty — every row below the tie takes the first label and
    # the second is silently unreachable (round-11 advice)
    if any(a >= b for a, b in zip(fracs, fracs[1:])) or not all(
        0.0 < b <= 1.0 for b in fracs
    ):
        raise ValueError(
            "boundaries must be STRICTLY ascending fractions in (0, 1] "
            f"(ties make a label unreachable): {boundaries}"
        )
    u = _sample_u(F.col(key_col).cast("string"), seed)
    split: Column = F.lit(default)
    for label, frac in reversed(boundaries):
        thr = F.lit(str(threshold_for(frac))).cast("decimal(21,0)")
        split = F.when(u < thr, F.lit(label)).otherwise(split)
    return df.withColumn(out_col, split)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    *,
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum hash-threshold sample (e.g. downsample 'view' events to
    5% while keeping every 'purchase').

    ``fractions`` maps stratum value → keep fraction; strata not listed keep
    ``default_fraction``. The threshold is a CASE expression over the
    stratum column — still a pure per-row predicate, zero shuffles, and the
    filter sits directly on the scan so column pruning and pushdown apply.
    """
    thr: Column = F.lit(str(threshold_for(default_fraction))).cast(
        "decimal(21,0)"
    )
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value),
            F.lit(str(threshold_for(frac))).cast("decimal(21,0)"),
        ).otherwise(thr)
    return df.filter(_sample_u(F.col(key_col).cast("string"), seed) < thr)


def sample_exact_k(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    key_col: str,
    *,
    seed: str = "",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum: smallest-k-by-hash.

    The bottom-k construction: rank rows in each stratum by their hash draw
    (ties broken by key) and keep rank ≤ k — a uniform without-replacement
    sample whose membership is stable under any data layout. One window =
    one shuffle on the strata key; at 100 TB prefer per-partition pre-trim
    via AQE or run after a stratum-keyed repartition so the exchange is
    shared with downstream per-stratum work.
    """
    u = _sample_u(F.col(key_col).cast("string"), seed)
    w = Window.partitionBy(*strata_cols).orderBy(
        u.asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def weighted_sample_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    *,
    seed: str = "",
) -> DataFrame:
    """Weighted without-replacement sample of ``k`` rows: A-ES keys.

    Efraimidis–Spirakis: draw u ~ U(0,1) per row (hash-derived, so the
    draw is deterministic and engine-portable like every sampler here)
    and keep the top-k rows by u^(1/w) — inclusion probability is
    proportional to weight, membership survives repartitioning and
    reruns. Rows with weight ≤ 0 or NULL are never selected.

    The A-ES key is rounded to 9 decimals BEFORE ranking (pow is not
    IEEE-exact across engines; ties fall to the deterministic key
    tiebreak — same policy as TF-IDF ranking). The top-k runs as
    orderBy+limit, which Spark plans as TakeOrderedAndProject —
    partition-local top-k's merged on the driver, no global sort, no
    single-task window.
    """
    u64 = _sample_u(F.col(key_col).cast("string"), seed)
    # (u64 + 0.5) / 2^64 ∈ (0, 1): decimal→double conversion is
    # nearest-double in both engines, +0.5 keeps the draw off the edges
    u = (u64.cast("double") + F.lit(0.5)) / F.lit(float(TWO64))
    aes = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 9
    )
    eligible = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    )
    return (
        eligible.withColumn("__aes", aes)
        .orderBy(F.col("__aes").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("__aes")
    )


def balanced_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    *,
    seed: str = "",
) -> DataFrame:
    """Equalize strata: keep exactly min-group-size rows from EVERY
    stratum, selected by the deterministic hash draw — the class-balancing
    step before training on skewed label/source/language distributions.

    Same bottom-k-by-hash construction as sample_exact_k, but k is the
    smallest stratum's cardinality, computed distributively (one
    stratum-keyed count, one 1-row broadcast min — no driver scalar,
    no collect). One window on the stratum key; membership is a pure
    function of (seed, key, corpus strata sizes): stable under layout,
    reproducible cross-engine.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    kmin = counts.agg(F.min("__n").alias("__kmin"))
    u = _sample_u(F.col(key_col).cast("string"), seed)
    w = Window.partitionBy(strata_col).orderBy(
        u.asc(), F.col(key_col).asc()
    )
    return (
        df.crossJoin(F.broadcast(kmin))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__kmin"))
        .drop("__rk", "__kmin")
    )


def _shuffle_seed(seed: str, epoch: int) -> str:
    """Seed string binding a shuffle draw to (user seed, epoch): each
    epoch is an INDEPENDENT deterministic permutation of the corpus."""
    return f"shuffle-{seed}-epoch-{epoch}"


def shuffle_u(key: Column, *, seed: str = "", epoch: int = 0) -> Column:
    """Permutation draw for corpus shuffling — the seeded hash-sample
    draw (md5-u64, DECIMAL(20,0)) with the epoch folded into the seed.

    Oracle twin: ``duck_md5_u64(concat_ws(chr(31), '<shuffle seed>',
    CAST(key AS VARCHAR)))`` with the literal from :func:`_shuffle_seed`.
    """
    return _sample_u(key, _shuffle_seed(seed, epoch))


def corpus_shuffle(
    df: DataFrame,
    key_col: str,
    *,
    seed: str = "",
    epoch: int = 0,
    num_partitions: int = 16,
    u_col: str = "shuffle_u",
    position_col: str = "position",
) -> DataFrame:
    """Reproducible global corpus shuffle with exact positions.

    Training-data pipelines need the document ORDER randomized — and that
    order re-derivable for any epoch, on any cluster layout, years later
    (curriculum audits, resume-from-step, loss-spike forensics). RNG
    shuffles (``ORDER BY rand()``) give none of that. Here the order key
    is a seeded md5 draw over the row key — a pure projection — so the
    permutation is a function of (seed, epoch, key) alone:

    - **Layout-invariant**: input partitioning cannot change the result
      (pinned by test); reruns and backfills reproduce it bit-exact.
    - **Distributed**: the 1-based ``position`` comes from the
      range-partitioned prefix-sum (``selection.global_cumsum`` — no
      single-partition window anywhere); ``num_partitions`` sizes the
      range exchange (raise it ∝ corpus at scale).
    - **Writable**: feed ``(u_col, key_col)`` to ``io.write_sorted`` to
      lay the shuffled corpus down as range-clustered parquet readers
      stream in shuffled order.

    The draw is total-ordered by ``(u, key)`` — the key tiebreak makes
    64-bit collisions harmless.
    """
    key = F.col(key_col).cast("string")
    out = global_cumsum(
        df.withColumn(u_col, shuffle_u(key, seed=seed, epoch=epoch))
        .withColumn("__one", F.lit(1)),
        [F.col(u_col).asc(), F.col(key_col).asc()],
        "__one",
        out_col=position_col,
        num_partitions=num_partitions,
    )
    return out.drop("__one").withColumn(
        position_col, F.col(position_col).cast("long")
    )


def epoch_slice_id(
    key: Column, n_slices: int, *, seed: str = "", epoch: int = 0
) -> Column:
    """Deterministic slice assignment for epoch-wise corpus consumption:
    ``md5-u64(slice seed, key) mod n_slices`` as INT. An independent
    draw from :func:`shuffle_u` (different seed tag), so slice membership
    and intra-slice order are uncorrelated."""
    u = _sample_u(key, f"slice-{seed}-epoch-{epoch}")
    return (u % F.lit(n_slices).cast("decimal(20,0)")).cast("int")


def epoch_slice(
    df: DataFrame,
    key_col: str,
    n_slices: int,
    slice_idx: int,
    *,
    seed: str = "",
    epoch: int = 0,
) -> DataFrame:
    """One slice of the epoch's corpus — a PURE FILTER (no shuffle, no
    global state): slices are disjoint hash buckets covering the corpus
    (pinned by test), so N training jobs each read 1/N of the data with
    zero coordination, and a crashed job re-derives exactly its slice.
    Compose with :func:`corpus_shuffle` (same seed/epoch) for the
    within-slice order."""
    if not 0 <= slice_idx < n_slices:
        raise ValueError(f"slice_idx {slice_idx} not in [0, {n_slices})")
    key = F.col(key_col).cast("string")
    return df.filter(
        epoch_slice_id(key, n_slices, seed=seed, epoch=epoch)
        == F.lit(slice_idx)
    )


def curriculum_order(
    df: DataFrame,
    difficulty: Column,
    key_col: str,
    *,
    n_bands: int = 4,
    seed: str = "",
    epoch: int = 0,
    num_partitions: int = 16,
) -> DataFrame:
    """Curriculum ordering: rank by ``difficulty``, cut into ``n_bands``
    equal-size bands, shuffle WITHIN each band — the classic
    easy-to-hard schedule (shortest-first, quality-first, …) with
    randomization inside each difficulty level so the trainer never sees
    a difficulty-sorted (and therefore length/topic-correlated) stream.

    Everything is exact and layout-invariant: the difficulty rank and
    the final 1-based ``position`` both come from the distributed prefix
    sum (no single-partition window), band = ((rank−1)·n_bands) div n
    (pure integer arithmetic — bands differ by at most one row), and the
    within-band order is the seeded epoch draw (:func:`shuffle_u`), so
    every epoch re-randomizes within bands while the band structure
    stays fixed. Returns df + ``band`` + ``position``; sort/write by
    ``position`` for the training stream.
    """
    if n_bands < 1:
        raise ValueError(f"need n_bands >= 1, got {n_bands}")
    key = F.col(key_col).cast("string")
    ranked = global_cumsum(
        df.withColumn("__d", difficulty).withColumn("__one", F.lit(1)),
        [F.col("__d").asc(), F.col(key_col).asc()],
        "__one",
        out_col="__rk",
        num_partitions=num_partitions,
    )
    n = ranked.agg(F.count(F.lit(1)).alias("__n"))
    banded = (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(
            "band",
            F.expr(f"CAST(((__rk - 1) * {int(n_bands)}) div __n AS INT)"),
        )
        .withColumn("__u", shuffle_u(key, seed=seed, epoch=epoch))
        .drop("__n", "__rk", "__d")
    )
    out = global_cumsum(
        banded,
        [F.col("band").asc(), F.col("__u").asc(), F.col(key_col).asc()],
        "__one",
        out_col="position",
        num_partitions=num_partitions,
    )
    return (
        out.drop("__one", "__u")
        .withColumn("position", F.col("position").cast("long"))
    )
