"""Corpus mixing: rebalance a multi-source corpus to target weights.

Training mixes are specified as source weights ("2 parts web to 1 part
books"); the engine must downsample each source so the output follows the
weights while keeping as much data as possible. With integer weights
``W_s`` and source sizes ``n_s``, the largest feasible mix scales every
source's output to ``c·W_s`` where ``c = min_s n_s/W_s`` — the binding
source is kept whole and every other source is hash-thresholded down.

Scale shape: the per-source stats are one tiny aggregation (|sources|
rows — broadcast), the argmin is a limit(1) on that aggregate, and
membership is then a pure per-row predicate over the broadcast stats —
the corpus itself never shuffles. Membership hashes the row key
(operators.sampling draw), so the mix is deterministic, engine-portable,
and consistent across reruns.

The keep rule ``u < (c·W_s/n_s)·2^64`` is evaluated as the cross-
multiplied INTEGER comparison ``u·n_s·q < p·W_s·2^64`` (where c = p/q is
the binding source's exact count/weight ratio) — no float thresholds, so
Spark DECIMAL and DuckDB HUGEINT agree bit-for-bit. Magnitudes stay
within DECIMAL(38)/HUGEINT for n_s·q below ~10^14, far past any real
source count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators.sampling import _sample_u


def _weight_expr(group_col: str, weights: dict[str, int]) -> Column:
    out: Column = F.lit(None).cast("int")
    for value, w in sorted(weights.items()):
        if w <= 0 or w != int(w):
            raise ValueError(f"weights must be positive integers, got {w!r}")
        out = F.when(F.col(group_col) == F.lit(value), F.lit(int(w))).otherwise(
            out
        )
    return out


def mix_corpus(
    df: DataFrame,
    group_col: str,
    weights: dict[str, int],
    key_col: str,
    *,
    seed: str = "",
) -> DataFrame:
    """Largest deterministic subsample of ``df`` matching ``weights``.

    Groups absent from ``weights`` are dropped. The binding group (max
    n_s/W_s deficit) survives whole; every other group is thinned by the
    hash-threshold rule, so expected output sizes are exactly
    ``c·W_s``. All original columns pass through.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    stats = (
        df.groupBy(group_col)
        .count()
        .select(
            group_col,
            F.col("count").cast("decimal(20,0)").alias("__n"),
            _weight_expr(group_col, weights)
            .cast("decimal(10,0)")
            .alias("__w"),
        )
        .filter(F.col("__w").isNotNull())
    )
    # ratio ordered as DOUBLE (ties broken by group) to match the oracle's
    # division type; the chosen (p, q) pair is then used exactly
    arg = (
        stats.orderBy(
            (F.col("__n").cast("double") / F.col("__w").cast("double")).asc(),
            F.col(group_col).asc(),
        )
        .limit(1)
        .select(F.col("__n").alias("__p"), F.col("__w").alias("__q"))
    )
    joined = df.join(F.broadcast(stats), group_col).crossJoin(
        F.broadcast(arg)
    )
    u = _sample_u(F.col(key_col).cast("string"), seed)
    two64 = F.lit("18446744073709551616").cast("decimal(21,0)")
    keep = (u * F.col("__n") * F.col("__q")) < (
        F.col("__p") * F.col("__w") * two64
    )
    return joined.filter(keep).drop("__n", "__w", "__p", "__q")


def source_repeat_plan(
    df: DataFrame,
    group_col: str,
    tokens_col: Column,
    budget: int,
    *,
    max_repeat: int = 4,
) -> DataFrame:
    """Data-constrained epoching plan: split a token ``budget`` across
    sources as uniformly as possible, capping every source at
    ``max_repeat`` passes over its data — the UniMax allocation
    (Chung et al. 2023) that replaced ad-hoc mixture weights for
    data-constrained pretraining.

    Exact integer waterfill, closed-form over prefix sums (no
    iteration): with per-source capacities c_s = n_tokens·max_repeat
    sorted ascending, a source is CAPPED iff granting its capacity to
    itself and every larger source still fits the remaining budget
    (c_r·(S−r+1) + prefix_{r−1} ≤ B); the largest such rank k fixes the
    water level t = (B − prefix_k) div (S − k), and the first
    (B − prefix_k) − t·(S−k) uncapped sources get one extra token so the
    plan sums to min(B, Σc) EXACTLY. Every step is integer arithmetic —
    bit-identical in Spark and DuckDB.

    All computation runs on the SOURCE-GRAIN aggregate (|sources| rows —
    config-scale, like a date dimension), so the single-partition
    windows here are over a handful of rows however big the corpus; the
    only corpus-scale work is the one token-sum aggregation. Returns
    (source, n_tokens, capacity, alloc_tokens, repeat_factor) with
    repeat_factor = round(alloc/n_tokens, 6) for display.
    """
    if budget < 0 or max_repeat < 1:
        raise ValueError(f"need budget >= 0 and max_repeat >= 1")
    from pyspark.sql import Window

    per = (
        df.groupBy(group_col)
        .agg(F.sum(tokens_col).cast("long").alias("n_tokens"))
        .withColumn(
            "capacity", (F.col("n_tokens") * F.lit(int(max_repeat))).cast("long")
        )
    )
    w = Window.orderBy(F.col("capacity").asc(), F.col(group_col).asc())
    w_all = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = F.lit(int(budget))
    ranked = (
        per.withColumn("r", F.row_number().over(w))
        .withColumn(
            "prefix",
            F.coalesce(
                F.sum("capacity").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn("s_total", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "is_capped",
            F.col("capacity") * (F.col("s_total") - F.col("r") + 1)
            + F.col("prefix")
            <= b,
        )
        .withColumn(
            "k",
            F.coalesce(
                F.max(F.when(F.col("is_capped"), F.col("r"))).over(w_all),
                F.lit(0),
            ),
        )
        .withColumn(
            "prefix_k",
            F.coalesce(
                F.max(
                    F.when(
                        F.col("r") == F.col("k"),
                        F.col("prefix") + F.col("capacity"),
                    )
                ).over(w_all),
                F.lit(0),
            ),
        )
    )
    t = F.expr("(CAST(%d AS BIGINT) - prefix_k) div (s_total - k)" % budget)
    leftover = F.expr(
        "(CAST(%d AS BIGINT) - prefix_k) %% (s_total - k)" % budget
    )
    alloc = (
        F.when(F.col("r") <= F.col("k"), F.col("capacity"))
        .when(F.col("k") == F.col("s_total"), F.col("capacity"))
        .otherwise(
            t + F.when(F.col("r") - F.col("k") <= leftover, 1).otherwise(0)
        )
        .cast("long")
    )
    return ranked.select(
        group_col,
        "n_tokens",
        "capacity",
        alloc.alias("alloc_tokens"),
        F.round(alloc / F.col("n_tokens"), 6).alias("repeat_factor"),
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    *,
    alpha: float = 0.5,
    seed: str = "",
) -> DataFrame:
    """Temperature-flattened corpus mix — the multilingual sampling rule
    (q_s ∝ n_s^α, α<1 upweights small groups relative to their natural
    share; XLM-R-style α-sampling) with weights derived IN-ENGINE from
    the data, so the DuckDB oracle replays the whole derivation:

    1. n_s = per-group counts (exact longs);
    2. w_s = round(n_s^α, 6) → DECIMAL — for the default α=0.5 this is
       ``sqrt`` (CORRECTLY ROUNDED IEEE on exact integer input, so
       engine-identical before the round); any other α goes through
       ``pow`` (libm — the transcendental policy applies: round to 6dp
       BEFORE any use, never aggregate/compare raw);
    3. q_s = round(w_s/Σw, 6), scaled to the integer Q_s = q_s·10⁶ (Σ
       is an exact DECIMAL sum of 6dp values; the division is one IEEE
       op on engine-identical doubles);
    4. the mix_corpus largest-feasible rule with integer weights Q_s:
       the binding group (min n_s/Q_s) survives whole, every other
       group hash-thins by the cross-multiplied INTEGER comparison
       u·n_s·Q_b < n_b·Q_s·2⁶⁴ — no float thresholds. Magnitudes stay
       inside DECIMAL(38): u(<2⁶⁴)·n_s·Q_b ≲ 2e37 for n_s ≤ 10¹².

    Scale shape is mix_corpus's: one |groups|-row aggregate broadcast,
    then a pure per-row predicate — the corpus never shuffles.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    w_raw = (
        F.sqrt(F.col("__n").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    )
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .select(
            group_col,
            "__n",
            F.round(w_raw, 6).cast("decimal(24,6)").alias("__w"),
        )
    )
    tot = counts.agg(F.sum("__w").alias("__s"))
    stats = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            F.col("__n").cast("decimal(20,0)").alias("__n"),
            # round the share to 6dp, capture it EXACTLY as decimal(8,6),
            # then scale to an integer in decimal arithmetic (a double
            # multiply by 1e6 would reintroduce FP noise at the cast).
            # Floored at 1: a group whose share rounds below 10⁻⁶ (a
            # 1-row language inside a ≳10¹²-row corpus) would otherwise
            # get integer weight 0 and be dropped SILENTLY — the exact
            # failure temperature flattening exists to prevent
            F.greatest(
                (
                    F.round(
                        F.col("__w").cast("double")
                        / F.col("__s").cast("double"),
                        6,
                    ).cast("decimal(8,6)")
                    * F.lit(1_000_000).cast("decimal(7,0)")
                ).cast("decimal(10,0)"),
                F.lit(1).cast("decimal(10,0)"),
            ).alias("__q"),
        )
    )
    arg = (
        stats.orderBy(
            (F.col("__n").cast("double") / F.col("__q").cast("double")).asc(),
            F.col(group_col).asc(),
        )
        .limit(1)
        .select(F.col("__n").alias("__p"), F.col("__q").alias("__qb"))
    )
    joined = df.join(F.broadcast(stats), group_col).crossJoin(
        F.broadcast(arg)
    )
    u = _sample_u(F.col(key_col).cast("string"), seed)
    two64 = F.lit("18446744073709551616").cast("decimal(21,0)")
    keep = (u * F.col("__n") * F.col("__qb")) < (
        F.col("__p") * F.col("__q") * two64
    )
    return joined.filter(keep).drop("__n", "__q", "__p", "__qb")
