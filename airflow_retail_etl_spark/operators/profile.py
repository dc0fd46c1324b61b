"""Column profiling: the ANALYZE/data-quality pass every warehouse runs.

Ingest pipelines profile every landed table — null rates, cardinalities,
ranges — both as a data-quality gate (a column going 90% NULL overnight
is an upstream breakage) and as optimizer/layout input (distinct counts
drive bucketing and broadcast decisions). One call produces one row per
profiled column.

Plan shape: a SINGLE full-table aggregation computes every column's
(count, nulls, min, max) side by side — one scan, one 1-row result —
then exact ``n_distinct`` adds one count-distinct aggregation per column
over the same scan (Spark rewrites multi-distinct into a single expand +
aggregate, so it stays one pass wide rather than |cols| scans). The
per-column rows are assembled from the 1-row aggregate with ``stack``
(unpivot) — driver never sees data, only the final |cols|-row frame.

Min/max/values are surfaced as STRINGS so heterogeneous column types fit
one frame (the oracle casts identically); numeric policy is untouched —
profiling reads values, it never recomputes money/metric aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions.columns import pub_round


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """One profile row per column: (column, n_rows, n_nulls, null_frac,
    n_distinct, min_value, max_value) ordered by column name.

    ``exact_distinct=False`` swaps COUNT(DISTINCT) for HLL
    ``approx_count_distinct`` — the 100 TB default when ±2% cardinality
    is enough to pick a join strategy (the exact form is the
    oracle-graded one).
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    distinct_fn = (
        F.countDistinct if exact_distinct else F.approx_count_distinct
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct_fn(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    unpivoted = one.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, __nn, n_distinct, min_value, max_value)",
    )
    return unpivoted.select(
        "column",
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__nn")).alias("n_nulls"),
        F.round(
            (F.col("__n") - F.col("__nn"))
            / F.nullif(F.col("__n"), F.lit(0)),
            6,
        ).alias("null_frac"),
        "n_distinct",
        "min_value",
        "max_value",
    ).orderBy("column")


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    num_partitions: int = 16,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov distance between the
    ``value_col`` distributions of two corpus snapshots — the
    distribution-shift alarm for "did this crawl/filter change the
    shape of my data" (length drift, score drift, price drift).

    KS = max over values v of |F_a(v) − F_b(v)|. Computed exactly in
    integers: per distinct value, cumulative counts c_a, c_b via the
    distributed prefix sum (selection.global_cumsum — value space can be
    data-sized, so no single-partition window), then the numerator
    max |c_a·n_b − c_b·n_a| as an exact integer; ONE division at the
    end, rounded 6dp. NULL values are excluded from both sides (KS is a
    statement about the value distribution). Returns one row:
    (n_a, n_b, ks_numerator, ks_stat).
    """
    from airflow_retail_etl_spark.operators.selection import global_cumsum

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.filter(F.col(value_col).isNotNull())
            .groupBy(F.col(value_col).alias("v"))
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    merged = (
        counts(df_a, "ca")
        .join(counts(df_b, "cb"), "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    cum_a = global_cumsum(
        merged, [F.col("v").asc()], "ca", out_col="cum_a",
        num_partitions=num_partitions,
    )
    cum = global_cumsum(
        cum_a, [F.col("v").asc()], "cb", out_col="cum_b",
        num_partitions=num_partitions,
    )
    # `cum` (value-grain counts — the post-GROUP BY domain, not the
    # corpus) feeds BOTH the totals fold and the numerator projection;
    # un-materialized, the totals' broadcast build re-executes the two
    # chained prefix-sum passes plus both corpus scans (the r13
    # exchange-count tell: 40 exchanges in PLANS.md). A/B isolated
    # probes (r14 materialize audit): sf1 warm 2.29 → 1.76 s, sf0.1
    # 1.74 → 1.59 s — kept (SCALING_HISTORY r14_materialize_audit).
    cum = cum.localCheckpoint(eager=True)
    totals = cum.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            "n_a",
            "n_b",
            F.abs(
                F.col("cum_a") * F.col("n_b")
                - F.col("cum_b") * F.col("n_a")
            ).alias("num"),
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("num").cast("long").alias("ks_numerator"))
        .select(
            "n_a",
            "n_b",
            "ks_numerator",
            F.round(
                F.col("ks_numerator")
                / F.nullif(F.col("n_a") * F.col("n_b"), F.lit(0)),
                6,
            ).alias("ks_stat"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_cols: list[str],
) -> DataFrame:
    """Corpus snapshot diff: per document, ADDED / REMOVED / CHANGED /
    UNCHANGED between two snapshots — the audit a pipeline runs before
    reprocessing a refreshed crawl (how much actually moved decides
    between incremental admission and a full rebuild).

    One FULL OUTER join on the id with md5 content fingerprints computed
    over the named columns (null-tagged, ``|``-joined with a
    length-prefix per field so no concatenation collision can fake
    UNCHANGED). Output is the id-grain verdict table
    (``id``, ``status``); aggregate it for the summary, anti-join it for
    the to-reprocess slice. Exactly one shuffle; at 100 TB both sides
    scan once and the join is the id-keyed co-location every table
    maintenance job already pays.
    """
    def fp(df: DataFrame) -> DataFrame:
        parts = []
        for c in content_cols:
            s = F.col(c).cast("string")
            parts.append(
                F.when(s.isNull(), F.lit("∅")).otherwise(
                    F.concat(F.length(s).cast("string"), F.lit(":"), s)
                )
            )
        return df.select(
            F.col(id_col).alias("id"),
            F.md5(F.concat_ws("|", *parts)).alias("fp"),
        )

    o = fp(old).withColumnRenamed("fp", "fp_old")
    n = fp(new).withColumnRenamed("fp", "fp_new")
    return (
        o.join(n, "id", "full_outer")
        .select(
            "id",
            F.when(F.col("fp_old").isNull(), F.lit("ADDED"))
            .when(F.col("fp_new").isNull(), F.lit("REMOVED"))
            .when(F.col("fp_old") == F.col("fp_new"), F.lit("UNCHANGED"))
            .otherwise(F.lit("CHANGED"))
            .alias("status"),
        )
    )


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    *,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the industry drift score :func:`ks_drift` complements (KS
    answers "did the shape move anywhere"; PSI weights WHERE the mass
    moved and is what model-monitoring runbooks threshold at 0.1/0.25).

    Buckets are the REFERENCE side's exact ``n_buckets``-quantile edges
    (selection.global_quantiles — type-7, 6dp-rounded, so the edges are
    engine-identical doubles derived IN-ENGINE, never injected
    literals); each row's bucket is the count of edges strictly below
    its value (one broadcast array projection — no per-row join). Per
    bucket: exact counts, shares rounded 6dp, eps-floored (a zero
    bucket would make the log ratio infinite — the standard smoothing),
    ``term = round((p−q)·ln(p/q), 6)`` computed on engine-identical
    inputs (the lm.py transcendental policy: identical doubles in, one
    log, round before the DECIMAL sum). Returns one row per bucket
    (bucket, n_a, n_b, p_a, p_b, term, psi) with ``psi`` the exact
    DECIMAL sum of the rounded terms, ordered by bucket.

    Scale: two value-grain aggregations + the reference-side quantile
    rank pass; bucket assignment is a pure projection against a
    broadcast ≤(n_buckets−1)-element array. NULLs excluded both sides.
    """
    from airflow_retail_etl_spark.operators.selection import (
        global_quantiles,
    )

    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if not 0.0 < eps < 0.01:
        raise ValueError(f"eps must be in (0, 0.01), got {eps}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # materialize the one-row edge array (the round-10 rule, measured
    # here: it feeds THREE broadcast reuses — both sides' bucket
    # assignments and the spine — and un-materialized each reuse
    # re-executes the whole reference-side rank pass; PLANS.md read 364
    # exchanges for this query before the checkpoints, 10 after)
    edges = (
        global_quantiles(df_a, value_col, qs)
        .agg(F.array_sort(F.collect_list("quantile")).alias("__edges"))
        .localCheckpoint(eager=True)
    )

    def bucketed(df: DataFrame, name: str) -> DataFrame:
        v = F.col(value_col).cast("double")
        b = F.size(F.filter(F.col("__edges"), lambda e: v > e))
        return (
            df.filter(F.col(value_col).isNotNull())
            .crossJoin(F.broadcast(edges))
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias(name))
        )

    spine = edges.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_buckets - 1)))
        ).alias("bucket")
    )
    # joined is n_buckets rows but its lineage holds both corpus-sized
    # bucket counts; it feeds the totals fold AND the terms projection
    joined = (
        spine.join(bucketed(df_a, "n_a"), "bucket", "left")
        .join(bucketed(df_b, "n_b"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0).cast("long")).alias("n_a"),
            F.coalesce("n_b", F.lit(0).cast("long")).alias("n_b"),
        )
        .localCheckpoint(eager=True)
    )
    tot = joined.agg(
        F.sum("n_a").cast("long").alias("__ta"),
        F.sum("n_b").cast("long").alias("__tb"),
    )
    # fail fast on an empty/all-NULL side: p = n/0 would surface as an
    # opaque IEEE Infinity/NaN inside the ln terms, not a named error.
    # Bounded check — joined is already eagerly checkpointed, so this
    # reads n_buckets in-memory rows, never the corpora.
    trow = tot.collect()[0]
    if not trow["__ta"] or not trow["__tb"]:
        raise ValueError(
            "psi_drift: a side has zero non-null values "
            f"(reference={trow['__ta'] or 0}, current={trow['__tb'] or 0} "
            f"rows of non-null {value_col!r}) — PSI is undefined on an "
            "empty distribution"
        )
    eps_l = F.lit(float(eps))
    p_a = F.greatest(
        F.round(
            F.col("n_a").cast("double") / F.col("__ta").cast("double"), 6
        ),
        eps_l,
    )
    p_b = F.greatest(
        F.round(
            F.col("n_b").cast("double") / F.col("__tb").cast("double"), 6
        ),
        eps_l,
    )
    terms = joined.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        pub_round((p_a - p_b) * F.log(p_a / p_b), 6).alias("term"),
    )
    psi = terms.agg(
        F.sum(F.col("term").cast("decimal(18,6)"))
        .cast("double")
        .alias("psi")
    )
    return (
        terms.crossJoin(F.broadcast(psi))
        .select("bucket", "n_a", "n_b", "p_a", "p_b", "term", "psi")
        .orderBy("bucket")
    )


def freq_shift(
    df: DataFrame,
    key_col: str,
    period_b: Column,
    *,
    k: int = 25,
) -> DataFrame:
    """Heavy-change detection (the "deltoids" problem, Cormode/Muthukrishnan):
    the ``k`` keys whose RELATIVE frequency moved most between period A
    (``period_b`` false) and period B (``period_b`` true) — "which parts /
    tokens / users changed share the most between crawls" is the
    what-moved companion of ks_drift (continuous values) and
    keyword_divergence (chi-square significance): this one ranks by the
    magnitude of the share change itself.

    Exactness policy: shares are ratios of exact integer counts, and
    every key's |share_B − share_A| has the SAME denominator tot_a·tot_b,
    so the ranking key is the exact integer |cnt_b·tot_a − cnt_a·tot_b|
    (DECIMAL — no doubles anywhere near the ORDER BY; counts ≤ 1e12 keep
    the product inside 25 digits). The published ``shift`` does ONE
    double division of that integer by the common denominator, rounded
    9 dp AFTER ranking — display only.

    Scale shape: one scan, one map-side-combinable conditional aggregation
    shuffled on the key, a broadcast 1-row totals frame, and a global
    TakeOrderedAndProject — no windows, no second pass over the data.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(F.when(period_b, 0).otherwise(1)).cast("long").alias("cnt_a"),
        F.sum(F.when(period_b, 1).otherwise(0)).cast("long").alias("cnt_b"),
    )
    return _rank_freq_shift(counts, key_col, k, "freq_shift")


def _rank_freq_shift(
    counts: DataFrame, key_col: str, k: int, label: str
) -> DataFrame:
    """Shared exact-integer ranking tail of the freq-shift family:
    ``counts`` is a (key, cnt_a, cnt_b) frame (any provenance — raw
    conditional agg or per-day cell window sums). Materializes it once
    (it feeds a bounded validation collect, a broadcast totals build,
    AND the ranked read — the psi_drift pattern; cardinality is
    key-bounded, not data-sized), fails fast on an empty period, then
    ranks by the exact integer |cnt_b·tot_a − cnt_a·tot_b|.
    """
    counts = counts.localCheckpoint(eager=True)
    tot = counts.agg(
        F.sum("cnt_a").cast("long").alias("tot_a"),
        F.sum("cnt_b").cast("long").alias("tot_b"),
    )
    trow = tot.collect()[0]  # bounded: 1 row
    if not trow["tot_a"] or not trow["tot_b"]:
        raise ValueError(
            f"{label}: a period has zero rows "
            f"(A={trow['tot_a'] or 0}, B={trow['tot_b'] or 0}) — "
            "relative frequency shift is undefined on an empty period"
        )
    dec = "decimal(38,0)"
    num = F.abs(
        F.col("cnt_b").cast(dec) * F.col("tot_a").cast(dec)
        - F.col("cnt_a").cast(dec) * F.col("tot_b").cast(dec)
    )
    j = counts.join(F.broadcast(tot))
    ranked = (
        j.select(
            "key",
            "cnt_a",
            "cnt_b",
            num.alias("__num"),
            F.when(
                F.col("cnt_b").cast(dec) * F.col("tot_a").cast(dec)
                > F.col("cnt_a").cast(dec) * F.col("tot_b").cast(dec),
                F.lit("up"),
            )
            .when(
                F.col("cnt_b").cast(dec) * F.col("tot_a").cast(dec)
                < F.col("cnt_a").cast(dec) * F.col("tot_b").cast(dec),
                F.lit("down"),
            )
            .otherwise(F.lit("flat"))
            .alias("direction"),
            F.col("tot_a"),
            F.col("tot_b"),
        )
        .orderBy(F.col("__num").desc(), F.col("key").asc())
        .limit(k)
    )
    shift = pub_round(
        F.col("__num").cast("double")
        / (F.col("tot_a").cast("double") * F.col("tot_b").cast("double")),
        9,
    )
    return ranked.select(
        F.col("key").alias(key_col),
        "cnt_a",
        "cnt_b",
        shift.alias("shift"),
        "direction",
    )


def rolling_freq_shift(
    df: DataFrame,
    key_col: str,
    day_col: str,
    *,
    window_days: int = 7,
    k: int = 25,
) -> DataFrame:
    """Rolling heavy-change: the ``k`` keys whose share moved most
    between the two most recent ``window_days`` windows — "what are this
    week's movers vs last week" as a STATE READ, the freq_shift
    primitive given the mart-state architecture every sketch family here
    has: the corpus is scanned ONCE into per-(day, key) exact count
    cells (the persistence grain — mergeable, backfill-safe under the
    day-permutation law), and the read is two calendar-bounded window
    sums over ≤ 2·window_days of cells at the global latest day, never a
    rescan of raw events. Period B = [d_max − w + 1, d_max], period A =
    the ``window_days`` immediately before; keys silent in both windows
    are dropped (their cells live outside the read), then the shared
    exact-integer ranking applies (|cnt_b·tot_a − cnt_a·tot_b| — no
    double near the ORDER BY).

    Scale shape: one scan into cells (map-side-combinable, shuffled on
    (day, key)), a broadcast 1-row latest-day frame, one |keys in
    window|-grain re-aggregation, then the shared ranked tail. At
    100 TB the cells table is what a daily job maintains incrementally
    (O(delta) per day); the read touches only the 2w-day slice.
    """
    cells = (
        df.select(
            F.col(day_col).alias("day"), F.col(key_col).alias("key")
        )
        .filter(F.col("day").isNotNull())
        .groupBy("day", "key")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return rolling_freq_shift_cells(
        cells,
        key_col,
        window_days=window_days,
        k=k,
        label="rolling_freq_shift",
    )


def rolling_freq_shift_cells(
    cells: DataFrame,
    key_col: str,
    *,
    window_days: int = 7,
    k: int = 25,
    label: str = "rolling_freq_shift_cells",
) -> DataFrame:
    """The read half of :func:`rolling_freq_shift`, over ALREADY-BUILT
    per-(day, key) count cells — any provenance: the one-shot groupBy,
    a maintained state table, or a streaming cell fold (kpi cells'
    ``n_events`` at (key, day) grain ARE these cells, so replay_kpi's
    stream ≡ batch law transfers to this read verbatim). ``cells`` must
    carry columns (day, key, n).
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # the 1-row latest frame and the window re-aggregation both consume
    # cells; un-materialized, the broadcast build re-executes the
    # corpus-sized cell subtree (the r10 rule) — A/B probed at sf1
    # (SCALING_HISTORY r14_late_additions_probes_2 note)
    cells = cells.localCheckpoint(eager=True)
    latest = cells.agg(F.max("day").alias("d_max"))
    j = cells.crossJoin(F.broadcast(latest))
    in_b = (F.col("day") >= F.date_sub(F.col("d_max"), window_days - 1)) & (
        F.col("day") <= F.col("d_max")
    )
    in_a = (
        F.col("day") >= F.date_sub(F.col("d_max"), 2 * window_days - 1)
    ) & (F.col("day") <= F.date_sub(F.col("d_max"), window_days))
    counts = (
        j.groupBy("key")
        .agg(
            F.sum(F.when(in_a, F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("cnt_a"),
            F.sum(F.when(in_b, F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("cnt_b"),
        )
        .filter((F.col("cnt_a") > 0) | (F.col("cnt_b") > 0))
    )
    return _rank_freq_shift(counts, key_col, k, label)
