"""Engine-replicable cardinality sketches (operators/cardinality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators import cardinality


def _ids(spark, n, parts=None):
    df = spark.range(n).select(F.col("id").alias("v"))
    return df.repartition(parts) if parts else df


def test_kmv_exact_below_k(spark):
    """Fewer distincts than k: the sketch IS the set — exact count,
    NULL threshold."""
    r = cardinality.kmv_distinct(_ids(spark, 100), "v", k=256).first()
    assert r.method == "kmv" and r.n_kept == 100
    assert r.threshold is None
    assert r.estimate == 100.0


def test_kmv_estimator_accuracy_and_determinism(spark):
    """Above k the order-statistic estimator runs; md5 determinism makes
    the estimate EXACTLY reproducible under any partitioning, and the
    k=256 estimator lands within ~3σ ≈ 3/√k ≈ 19%% of truth."""
    a = cardinality.kmv_distinct(_ids(spark, 10_000), "v", k=256).first()
    b = cardinality.kmv_distinct(
        _ids(spark, 10_000, parts=13), "v", k=256
    ).first()
    assert a.threshold is not None
    assert abs(a.estimate - 10_000) / 10_000 < 0.19
    assert a.estimate == b.estimate and a.threshold == b.threshold


def test_hll_raw_branch_accuracy_and_determinism(spark):
    """10k distinct ≫ 2.5m: raw harmonic branch; ~3σ ≈ 3·1.04/√2048 ≈
    7%% at p=11. Partition-count invariance is the DECIMAL scaled-sum
    policy's whole point."""
    a = cardinality.hll_distinct(_ids(spark, 10_000), "v", p=11).first()
    b = cardinality.hll_distinct(
        _ids(spark, 10_000, parts=7), "v", p=11
    ).first()
    assert a.estimate == a.raw_estimate  # raw branch taken
    assert abs(a.estimate - 10_000) / 10_000 < 0.07
    assert a.estimate == b.estimate and a.s_scaled == b.s_scaled


def test_hll_linear_counting_branch(spark):
    """Small sets take Flajolet's linear-counting branch (raw ≤ 2.5m,
    empty registers present) — far tighter than the raw estimate
    there."""
    r = cardinality.hll_distinct(_ids(spark, 200), "v", p=11).first()
    assert r.estimate != r.raw_estimate  # linear branch taken
    assert r.v_zero > 0
    assert abs(r.estimate - 200) / 200 < 0.05


def test_hll_duplicates_do_not_move_the_estimate(spark):
    """Cardinality sketches see multisets: 50 copies of each value must
    give the identical sketch state as one copy."""
    base = _ids(spark, 500)
    dup = base.crossJoin(spark.range(50).select(F.lit(1).alias("x"))).select(
        "v"
    )
    a = cardinality.hll_distinct(base, "v", p=11).first()
    b = cardinality.hll_distinct(dup, "v", p=11).first()
    assert a.s_scaled == b.s_scaled and a.estimate == b.estimate
    ka = cardinality.kmv_distinct(base, "v", k=64).first()
    kb = cardinality.kmv_distinct(dup, "v", k=64).first()
    assert ka.estimate == kb.estimate


def test_hll_p_validation(spark):
    with pytest.raises(ValueError, match=r"p must be"):
        cardinality.hll_distinct(_ids(spark, 10), "v", p=12)
    with pytest.raises(ValueError, match=r"p must be"):
        cardinality.hll_distinct(_ids(spark, 10), "v", p=3)


def test_kmv_overlap_exact_when_union_fits_and_estimates_otherwise(spark):
    """Small unions (≤ k) make the union sketch THE union: estimates
    are exact. Large unions run the order-statistic estimator within
    its error bars, deterministically under any partitioning."""
    left = _ids(spark, 300)                      # {0..299}
    right = spark.range(150, 450).select(F.col("id").alias("v"))
    # exact path: k = 1024 swallows the 450-element union
    r = cardinality.kmv_overlap(left, right, "v", k=1024).first()
    assert r.threshold is None
    assert r.union_est == 450.0
    assert r.jaccard_est == round(150 / 450, 6)
    # intersection consumes the 6dp-ROUNDED jaccard (round-then-consume
    # policy), so 0.333333 * 450 = 149.99985, not 150 exactly
    assert r.intersection_est == round(r.jaccard_est * 450, 6)
    # estimator path: k = 256 < union of 4500 ({0..2999} ∪ {1500..4499})
    big_l = spark.range(3000).select(F.col("id").alias("v"))
    big_r = spark.range(1500, 4500).select(F.col("id").alias("v"))
    e1 = cardinality.kmv_overlap(big_l, big_r, "v", k=256).first()
    e2 = cardinality.kmv_overlap(
        big_l.repartition(9), big_r.repartition(5), "v", k=256
    ).first()
    assert e1.threshold is not None
    assert tuple(e1) == tuple(e2)                  # deterministic
    assert abs(e1.union_est - 4500) / 4500 < 0.2   # ~3σ at k=256
    assert abs(e1.jaccard_est - 1 / 3) < 0.1


def test_hll_distinct_by_matches_per_group_global(spark):
    """The grouped fold is definitionally the global fold per key:
    every register, integer, and rounded estimate matches running
    hll_distinct on each group alone."""
    df = spark.createDataFrame(
        [(g, v % (50 * (g + 1))) for g in range(3) for v in range(400)],
        ["g", "v"],
    ).repartition(7)
    by = {
        r.g: r
        for r in cardinality.hll_distinct_by(df, ["g"], "v", p=5).collect()
    }
    assert set(by) == {0, 1, 2}
    for g in range(3):
        solo = cardinality.hll_distinct(
            df.filter(F.col("g") == g), "v", p=5
        ).first()
        got = by[g]
        assert got.s_scaled == solo.s_scaled
        assert got.n_registers_hit == solo.n_registers_hit
        assert got.v_zero == solo.v_zero
        assert got.raw_estimate == solo.raw_estimate
        assert got.estimate == solo.estimate


def test_hll_distinct_by_null_only_groups_absent(spark):
    """A key whose column is entirely NULL produces no row (matches the
    oracle's WHERE col IS NOT NULL grain)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", None)], ["g", "v"]
    )
    rows = cardinality.hll_distinct_by(df, ["g"], "v", p=4).collect()
    assert [r.g for r in rows] == ["a"]


def test_hll_distinct_by_validation(spark):
    df = spark.createDataFrame([("a", 1)], ["g", "v"])
    with pytest.raises(ValueError, match="keys"):
        cardinality.hll_distinct_by(df, [], "v", p=5)
    with pytest.raises(ValueError, match="p must be"):
        cardinality.hll_distinct_by(df, ["g"], "v", p=12)


def test_hll_register_merge_is_exact_union(spark):
    """MAX(mx) per register over two register tables == sketching the
    concatenated input: fold-after-merge is bit-identical to the
    one-shot sketch, every column."""
    a = spark.range(0, 600).select(F.col("id").alias("v"))
    b = spark.range(400, 900).select(F.col("id").alias("v"))
    ra = cardinality.hll_registers(a, (), "v", p=6)
    rb = cardinality.hll_registers(b, (), "v", p=6)
    merged = (
        ra.unionByName(rb).groupBy("reg").agg(F.max("mx").alias("mx"))
    )
    got = cardinality.hll_fold(merged, (), p=6).first()
    want = cardinality.hll_distinct(a.unionByName(b), "v", p=6).first()
    assert got.s_scaled == want.s_scaled
    assert got.n_registers_hit == want.n_registers_hit
    assert got.v_zero == want.v_zero
    assert got.raw_estimate == want.raw_estimate
    assert got.estimate == want.estimate
