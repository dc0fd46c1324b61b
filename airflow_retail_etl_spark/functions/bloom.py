"""Deterministic, engine-replicable Bloom filters over the md5 family.

The decontamination scale path (operators/decontam.py, SCALE.md) probes
a BROADCAST distinct eval-gram set; its documented fallback once the
eval side outgrows broadcast — "a Bloom prefilter + shuffled semi-join"
— lives here. A Bloom filter compresses an n-element membership set to
~10-15 bits/element (vs full strings), so an eval set whose gram SET is
too big to broadcast still ships to every executor as a bit array; the
exact join then runs only on the prefiltered survivors.

Deterministic by construction: bit positions come from Kirsch–
Mitzenmacher double hashing over the two md5 halves
(``functions/xhash``) — no seeds, no engine-private hash — so the SAME
filter (bit-for-bit) is buildable in Spark and DuckDB, membership
verdicts replicate exactly, and the false-positive SET (not just rate)
is reproducible across engines, partitionings, and reruns. Bloom
guarantees: no false negatives ever; false positives at the standard
(1 - e^{-kn/m})^k rate.

Representation: one row with an ``array<long>`` of ``n_bits/64`` words
(position p → word p>>6, bit p&63; two's-complement bit_or is plain
bitwise OR). The array broadcasts as DATA (a few MB for 10⁶ elements),
never as plan literals — the round-9 plan-size trap does not apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions import xhash


def _positions(col: Column, k_hashes: int, n_bits: int) -> list[Column]:
    """The k Kirsch–Mitzenmacher bit positions of a value, as BIGINTs in
    [0, n_bits). Pure LONG hi/lo arithmetic (round 15): the u64 rides as
    two 32-bit halves and ``xhash.km_hash_mod`` decomposes the mod —
    bit-identical to the old DECIMAL form (equivalence proven in
    functions/xhash's module notes and pinned by tests/test_xhash.py)."""
    h1, l1 = xhash.md5_u64_hilo(col, 1)
    h2, l2 = xhash.md5_u64_hilo(col, 2)
    return [
        xhash.km_hash_mod(h1, l1, h2, l2, i, n_bits)
        for i in range(k_hashes)
    ]


def build_bloom(
    values: DataFrame,
    col: str,
    *,
    n_bits: int,
    k_hashes: int = 7,
) -> DataFrame:
    """One-row DataFrame (bits: array<long>, n_bits, k_hashes) holding
    the Bloom filter of ``values[col]`` (nulls ignored).

    Shape: explode k positions per value (linear), one word-keyed
    bit_or aggregation (≤ n_bits/64 uniform keys, map-side combine),
    then a dense ordered array built by filling absent words with 0 —
    the single collect-free fold a filter of any size supports. The
    result is data, broadcast-joined by probes, so filter size is
    bounded by executor memory, not plan size.
    """
    if n_bits % 64 != 0:
        raise ValueError(f"n_bits must be a multiple of 64, got {n_bits}")
    n_words = n_bits // 64
    v = values.select(F.col(col).cast("string").alias("v")).filter(
        F.col("v").isNotNull()
    )
    # md5 halves bound BELOW the generate: explode evaluates each array
    # element's tree independently, so inline positions would hash every
    # row k times (round 15 — see operators/frequency._with_km_halves;
    # explode_outer ≡ explode on this never-empty literal array and
    # dodges the InferFiltersFromGenerate re-inlining trap)
    h1a, l1a = xhash.md5_u64_hilo(F.col("v"), 1)
    h2a, l2a = xhash.md5_u64_hilo(F.col("v"), 2)
    hv = v.select(
        h1a.alias("__h1"),
        l1a.alias("__l1"),
        h2a.alias("__h2"),
        l2a.alias("__l2"),
    )
    bound = [
        xhash.km_hash_mod(
            F.col("__h1"), F.col("__l1"), F.col("__h2"), F.col("__l2"),
            i, n_bits,
        )
        for i in range(k_hashes)
    ]
    pos = hv.select(F.explode_outer(F.array(*bound)).alias("p"))
    words = (
        pos.select(
            F.shiftright(F.col("p"), 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p AS INT) & 63)").alias(
                "b"
            ),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    dense = (
        values.sparkSession.range(n_words)
        .select(F.col("id").alias("w"))
        .join(words, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("bigint")).alias("bits"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bits"))),
            lambda s: s["bits"],
        ).alias("bits")
    ).select(
        "bits",
        F.lit(n_bits).cast("long").alias("n_bits"),
        F.lit(k_hashes).cast("int").alias("k_hashes"),
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    *,
    n_bits: int,
    k_hashes: int = 7,
    hit_col: str = "bloom_hit",
) -> DataFrame:
    """``df`` plus a boolean ``hit_col``: every one of the value's k bit
    positions is set in the filter. ``n_bits``/``k_hashes`` must match
    the build (they ride the bloom row too; literals here keep the
    probe a pure projection). The one-row filter cross-joins broadcast —
    each partition probes locally, the probed side never shuffles."""
    # positions bound as COLUMNS below the cross join (round 15, same
    # rule as frequency.cms_probe): a caller's filter on the hit flag
    # is substituted by PushDownPredicates into the cross join's
    # condition — off bound position columns the duplicated predicate
    # is cheap bit arithmetic instead of k md5 re-derivations, and the
    # one lower projection dedups the md5 via subexpression elimination
    h1a, l1a = xhash.md5_u64_hilo(F.col(col).cast("string"), 1)
    h2a, l2a = xhash.md5_u64_hilo(F.col(col).cast("string"), 2)
    tmp = [f"__bp{i}" for i in range(k_hashes)]
    hv = df.select(
        "*",
        h1a.alias("__bh1"),
        l1a.alias("__bl1"),
        h2a.alias("__bh2"),
        l2a.alias("__bl2"),
    ).select(
        "*",
        *[
            xhash.km_hash_mod(
                F.col("__bh1"), F.col("__bl1"),
                F.col("__bh2"), F.col("__bl2"),
                i, n_bits,
            ).alias(tmp[i])
            for i in range(k_hashes)
        ],
    ).drop("__bh1", "__bl1", "__bh2", "__bl2")
    probed = hv.crossJoin(
        F.broadcast(bloom.select(F.col("bits").alias("__bloom_bits")))
    )
    hit = None
    for name in tmp:
        c = F.expr(
            f"(element_at(__bloom_bits, "
            f"CAST(shiftright({name}, 6) AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST({name} AS INT) & 63)) != 0"
        )
        hit = c if hit is None else hit & c
    return probed.withColumn(
        hit_col, F.col(col).isNotNull() & hit
    ).drop("__bloom_bits", *tmp)
