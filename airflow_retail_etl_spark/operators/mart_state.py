"""Incrementally maintainable KPI mart state — the marts' answer to
``pipeline.build_dims_incremental``.

The reference recomputes every mart from scratch per run: a full pandas
scan of the warehouse feeding ``to_sql(if_exists="replace")`` /
``pq.write_table`` (reference ``dags/retail_pipeline.py:34-88``). That is
O(corpus) per refresh. The dimensions got an incremental maintenance path
in round 8 (``pipeline.build_dims_incremental`` — SCD-2 folds of daily
snapshots); this module gives the KPI MARTS one, by generalizing the
sketch-state architecture (``cardinality.hll_registers`` /
``frequency.cms_cells`` / ``qsketch.qsketch_state`` /
``sampling.sample_state``) to EXACT relational aggregates:

- **additive KPI cells** (:func:`kpi_cells`): one row per
  (grain keys…, day) holding exact DECIMAL cent sums and conditional
  counts. The merge law is linear (SUM) — the CMS-counter analog, so
  cells from disjoint slices fold to exactly the one-shot aggregate
  under ANY grouping (integer cent arithmetic is associative and
  partition-order-free; see ``functions.columns.money_sum``).
- **distinct-user state**: per (grain keys…, day) HLL registers from
  ``cardinality.hll_registers`` — idempotent MAX merge, exactly the
  state ``rolling_distinct_hll`` persists.

A day's refresh overwrites that day's cells — O(delta), via the same
dynamic-partition-overwrite idempotence as ``io.write_partitioned`` —
and every read (lifetime totals, arbitrary date ranges, trailing
windows) is a fold of calendar-bounded state rows: the raw event corpus
is scanned ONCE per day, never per mart refresh and never per window.

100 TB posture: cells are |grain × days| rows (brands × days — thousands,
not billions); the only event-scale work is the per-day cell build, a
single map-side-combined aggregation on (keys, day). Window reads cost
calendar² × |grain| row touches — independent of corpus size. The
DECIMAL(18,2) cent state caps at ~10^16 cents per cell; ANSI mode makes
a breach an explicit overflow error, never a silent wrap (widen the
state type if a single grain cell can exceed it).

Streaming twin: ``streaming.incremental.fold_kpi_batch`` (additive cells
are linear, so per-batch dynamic partition OVERWRITE gives replay
idempotence — the CMS pattern, not HLL's MAX); the distinct-user half
streams via the existing ``fold_hll_batch``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airflow_retail_etl_spark.functions.columns import (
    conditional_count,
    pub_round,
    safe_ratio,
)

#: the additive (linear-merge) state columns, in state-schema order
KPI_ADDITIVE = ("views", "carts", "purchases", "revenue_cents", "n_events")

#: fixed persistence type for the cent sums (see module docstring)
_CENT = "decimal(18,2)"


def kpi_cells(
    events: DataFrame,
    keys: Sequence[str],
    *,
    date_col: str = "event_date",
    type_col: str = "event_type",
    revenue_col: str = "price",
    view_value: str = "view",
    cart_value: str = "cart",
    purchase_value: str = "purchase",
) -> DataFrame:
    """Build the per-(keys…, day) additive KPI state.

    One map-side-combined aggregation over the day's events; the output
    is the mart's persistence/merge grain. Revenue follows the money
    policy (round to cents per row, accumulate in DECIMAL — exact, so
    the fold law below is exact too).
    """
    t = F.col(type_col)
    cent = F.when(
        t == purchase_value,
        F.round(F.col(revenue_col), 2).cast(_CENT),
    ).otherwise(F.lit(0).cast(_CENT))
    return events.groupBy(*keys, date_col).agg(
        conditional_count(t == view_value).cast("long").alias("views"),
        conditional_count(t == cart_value).cast("long").alias("carts"),
        conditional_count(t == purchase_value)
        .cast("long")
        .alias("purchases"),
        F.sum(cent).cast(_CENT).alias("revenue_cents"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def kpi_fold(cells: DataFrame, group_keys: Sequence[str]) -> DataFrame:
    """Merge KPI cells to ``group_keys`` grain — the linear fold.

    Because every state column is an exact integer/DECIMAL sum, folding
    per-day cells (or per-batch cells, or cells merged in any order) is
    bit-identical to the one-shot aggregate of the underlying events:
    SUM is associative/commutative and cent arithmetic is exact. This is
    what makes the state MERGEABLE: lifetime reads, range reads, and
    trailing windows are all this one function over different slices.
    """
    aggs = [
        F.sum(c).cast(_CENT if c == "revenue_cents" else "long").alias(c)
        for c in KPI_ADDITIVE
    ]
    if group_keys:
        return cells.groupBy(*group_keys).agg(*aggs)
    return cells.agg(*aggs)


def refresh_day(
    cells: DataFrame, day_cells: DataFrame, *, date_col: str = "event_date"
) -> DataFrame:
    """Replace the days present in ``day_cells`` inside ``cells`` — the
    O(delta) incremental refresh law (the DataFrame face of writing the
    day's cell partition with dynamic partition overwrite). Re-running a
    day is idempotent: the day's state is a pure function of the day's
    events, so the replacement rewrites identical rows."""
    days = day_cells.select(date_col).distinct()
    kept = cells.join(F.broadcast(days), date_col, "left_anti")
    return kept.unionByName(day_cells)


def kpi_read(
    cells: DataFrame,
    regs: DataFrame,
    keys: Sequence[str],
    *,
    p: int,
    rate_dp: int = 6,
) -> DataFrame:
    """Read the mart at ``keys`` grain from state alone: fold the
    additive cells, MAX-merge the HLL registers, estimate distinct
    users, and derive the funnel rates — no raw-event scan.

    ``regs`` is a ``cardinality.hll_registers`` table whose keys are a
    superset of ``keys`` (typically keys + the day column); the merge
    law (MAX per register) collapses the extra grain. Rates are rounded
    BEFORE publication (transcendental/ratio policy: one division on
    exact integer inputs, then round — engine- and layout-stable).
    """
    from airflow_retail_etl_spark.operators import cardinality

    add = kpi_fold(cells, keys)
    merged = regs.groupBy(*keys, "reg").agg(F.max("mx").alias("mx"))
    est = cardinality.hll_fold(merged, list(keys), p=p).select(
        *keys, F.col("estimate").alias("unique_users_est")
    )
    # LEFT join (round-12 advice): a grain whose rows all carry NULL
    # user_id has cells but no registers — an inner join would silently
    # drop its views/revenue from the mart. Estimate defaults to 0.0
    # (the HLL of an empty user set); the oracle twins mirror the LEFT
    # JOIN + COALESCE so the contract stays cross-engine exact.
    joined = add.join(est, list(keys), "left") if keys else add.crossJoin(
        F.broadcast(est)
    )
    return joined.select(
        *keys,
        "views",
        "carts",
        "purchases",
        F.col("revenue_cents").cast("double").alias("revenue"),
        "n_events",
        F.coalesce("unique_users_est", F.lit(0.0)).alias(
            "unique_users_est"
        ),
        F.round(
            safe_ratio(F.col("carts").cast("double"), F.col("views")),
            rate_dp,
        ).alias("cart_rate"),
        F.round(
            safe_ratio(F.col("purchases").cast("double"), F.col("views")),
            rate_dp,
        ).alias("purchase_rate"),
    )


def rolling_kpis(
    cells: DataFrame,
    regs: DataFrame,
    *,
    window_days: int,
    p: int,
    date_col: str = "event_date",
    rate_dp: int = 6,
    materialize: bool = True,
) -> DataFrame:
    """Trailing ``window_days``-day KPI windows, one row per window end,
    computed ENTIRELY from per-day state: additive cells join ≤
    window_days predecessor days and SUM (linear merge); registers
    MAX-merge per window (idempotent). Both joins are calendar-bounded —
    |days|² × state-grain row touches, independent of corpus size. The
    first window_days-1 windows fold fewer days (ramp-up head, reported
    via n_days). ``cells``/``regs`` must be at (day,) grain (keys=[]).

    ``materialize`` (default on) localCheckpoints both state frames
    before the window joins — the round-10 materialize-before-broadcast
    rule: the calendar-bounded state is derived from a corpus-sized
    subtree, and un-materialized it would re-execute that subtree once
    per join branch (days derivation + both window sides ⇒ 4 raw scans;
    measured 6.4 s → ~2 s warm at sf0.1 where single-row-group scans
    serialize the re-derivations). In production the states are
    PERSISTED tables and this flag is moot — it makes the from-raw query
    face match the persisted-state cost shape."""
    from airflow_retail_etl_spark.operators import cardinality

    if materialize:
        cells = cells.localCheckpoint(eager=True)
        regs = regs.localCheckpoint(eager=True)
    days = cells.select(date_col).distinct()
    lo = F.date_sub(F.col(f"d.{date_col}"), window_days - 1)
    in_win = (F.col(f"s.{date_col}") <= F.col(f"d.{date_col}")) & (
        F.col(f"s.{date_col}") >= lo
    )
    win_add = (
        days.alias("d")
        .join(cells.alias("s"), in_win)
        .groupBy(F.col(f"d.{date_col}").alias("window_end"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            *[
                F.sum(f"s.{c}")
                .cast(_CENT if c == "revenue_cents" else "long")
                .alias(c)
                for c in KPI_ADDITIVE
            ],
        )
    )
    reg_in_win = (F.col(f"r.{date_col}") <= F.col(f"d.{date_col}")) & (
        F.col(f"r.{date_col}") >= lo
    )
    win_regs = (
        days.alias("d")
        .join(regs.alias("r"), reg_in_win)
        .groupBy(
            F.col(f"d.{date_col}").alias("window_end"),
            F.col("r.reg").alias("reg"),
        )
        .agg(F.max("r.mx").alias("mx"))
    )
    est = cardinality.hll_fold(win_regs, ["window_end"], p=p).select(
        "window_end", F.col("estimate").alias("unique_users_est")
    )
    # LEFT join for the same reason as kpi_read: a window whose days
    # carry no registers (all-NULL users) must keep its additive KPIs.
    return win_add.join(est, "window_end", "left").select(
        "window_end",
        "n_days",
        "views",
        "carts",
        "purchases",
        F.col("revenue_cents").cast("double").alias("revenue"),
        "n_events",
        F.coalesce("unique_users_est", F.lit(0.0)).alias(
            "unique_users_est"
        ),
        F.round(
            safe_ratio(F.col("carts").cast("double"), F.col("views")),
            rate_dp,
        ).alias("cart_rate"),
        F.round(
            safe_ratio(F.col("purchases").cast("double"), F.col("views")),
            rate_dp,
        ).alias("purchase_rate"),
    )


def moment_cells(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    date_col: str = "event_date",
    dp: int = 2,
) -> DataFrame:
    """Per-(keys…, day) MERGEABLE moment state: (n, sx, sxx) — the
    univariate-statistics member of the state family (the mergeable
    twin of brand_price_corr's one-shot moment sums). Values are
    rounded to ``dp`` then accumulated in DECIMAL, so every cell is an
    exact integer-scaled sum and the fold law is exact: cells merged in
    any order/grouping equal the one-shot sums. Days with no qualifying
    rows produce no cell (reads report coverage via n/n_days)."""
    x = F.round(F.col(value_col), dp).cast(f"decimal(18,{dp})")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, date_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(x).cast(f"decimal(28,{dp})").alias("sx"),
            F.sum((x * x).cast(f"decimal(32,{2 * dp})"))
            .cast(f"decimal(32,{2 * dp})")
            .alias("sxx"),
        )
    )


def _moment_stats(n: Column, sx: Column, sxx: Column) -> list[Column]:
    """mean / population variance / stddev from exact sums — the
    brand_price_corr policy: exact DECIMAL sums cast to double, ONE
    fixed-order IEEE expression per statistic, rounded 6 dp before
    publication (sqrt is correctly rounded — no libm drift)."""
    nd = n.cast("double")
    sxd = sx.cast("double")
    sxxd = sxx.cast("double")
    var = (nd * sxxd - sxd * sxd) / (nd * nd)
    # pub_round: variance is cancellation-shaped (can be -ε for constant
    # data) and sqrt(-0.0) IS -0.0 — the sign-of-zero class the driver's
    # byte hash catches (round-14 embedding_gram). Oracle twins carry + 0.
    return [
        pub_round(sxd / nd, 6).alias("mean"),
        pub_round(var, 6).alias("variance"),
        pub_round(F.sqrt(var), 6).alias("stddev"),
    ]


def moment_fold(
    cells: DataFrame, group_keys: Sequence[str], *, dp: int = 2
) -> DataFrame:
    """Merge moment cells to ``group_keys`` grain — the linear fold,
    the :func:`kpi_fold` twin for (n, Σx, Σx²) state. Exact DECIMAL
    sums make the fold bit-identical to the one-shot aggregate under
    any grouping/order; results are cast back to the cell column types
    so folds compose (re-folding folded cells is a no-op type-wise —
    an overflow would be an explicit ANSI error, same posture as the
    cent cells)."""
    aggs = [
        F.sum("n").cast("long").alias("n"),
        F.sum("sx").cast(f"decimal(28,{dp})").alias("sx"),
        F.sum("sxx").cast(f"decimal(32,{2 * dp})").alias("sxx"),
    ]
    if group_keys:
        return cells.groupBy(*group_keys).agg(*aggs)
    return cells.agg(*aggs)


def moment_read(
    cells: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Fold moment cells to ``keys`` grain and derive the statistics —
    no raw rescan."""
    folded = (
        cells.groupBy(*keys).agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sx").alias("sx"),
            F.sum("sxx").alias("sxx"),
        )
        if keys
        else cells.agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sx").alias("sx"),
            F.sum("sxx").alias("sxx"),
        )
    )
    return folded.select(
        *keys,
        "n",
        *_moment_stats(F.col("n"), F.col("sx"), F.col("sxx")),
    )


def rolling_moments(
    cells: DataFrame,
    *,
    window_days: int,
    date_col: str = "event_date",
    materialize: bool = True,
) -> DataFrame:
    """Trailing ``window_days``-day mean/variance/stddev per window end,
    ENTIRELY from per-day moment state (calendar²-bounded window sums of
    exact DECIMAL cells — the volatility dashboard that would otherwise
    rescan raw rows once per window). Same ramp-up-head contract as the
    sibling rolling faces (n_days reports coverage); ``materialize``
    follows the measured rule (two branches consume the state)."""
    if materialize:
        cells = cells.localCheckpoint(eager=True)
    days = cells.select(date_col).distinct()
    lo = F.date_sub(F.col(f"d.{date_col}"), window_days - 1)
    in_win = (F.col(f"s.{date_col}") <= F.col(f"d.{date_col}")) & (
        F.col(f"s.{date_col}") >= lo
    )
    win = (
        days.alias("d")
        .join(cells.alias("s"), in_win)
        .groupBy(F.col(f"d.{date_col}").alias("window_end"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("s.n").cast("long").alias("n"),
            F.sum("s.sx").alias("sx"),
            F.sum("s.sxx").alias("sxx"),
        )
    )
    return win.select(
        "window_end",
        "n_days",
        "n",
        *_moment_stats(F.col("n"), F.col("sx"), F.col("sxx")),
    )


def decayed_read(
    cells: DataFrame,
    value_col: str,
    *,
    lam: float,
    date_col: str = "event_date",
    dp: int = 6,
) -> DataFrame:
    """Exponentially time-decayed reads from per-day state — the
    trend-weighted member of the state family: for every observed day D,
    ``decayed = Σ_{d ≤ D} S_d · λ^(D−d)`` with day-grain decay (S_d is
    the day's EXACT state cell; calendar gaps contribute 0), i.e. the
    recency-weighted total a trend dashboard plots.

    Engine-exact without transcendentals: day-grain decay means λ is
    only ever applied by REPEATED MULTIPLICATION, so each day's value is
    one left-to-right Horner fold ``acc ← acc·λ + S_d`` over the dense
    calendar prefix — exact DECIMAL inputs cast once to double, a fixed
    operation order, identical IEEE arithmetic in Spark
    (``F.aggregate``) and DuckDB (``list_reduce``), rounded ``dp``
    before publication. Never ``pow``: libm powers differ across
    engines; a fold of multiplies cannot.

    Mergeability/incrementality law (test-pinned): the read is O(1) to
    maintain — ``decayed(D+g) = decayed(D)·λ^g + S_{D+g}`` with λ^g by
    repeated multiplication — so a streaming job carries one double per
    grain, never re-reading history. This batch face recomputes every
    prefix from the calendar² state (|days|-sized array broadcast), the
    same audit-vs-production split as the rolling faces.

    ``cells`` must be at (day,) grain with an exact (DECIMAL/integer)
    ``value_col``. Returns (date_col, n_days, decayed) for every
    observed day, ordered.
    """
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    lam_lit = F.lit(float(lam))
    # NULL-date cells are excluded (a dateless cell has no position on
    # the decay axis; left in, it would surface as a NULL output row)
    series = cells.filter(F.col(date_col).isNotNull()).select(
        F.col(date_col).alias("__d"),
        F.col(value_col).cast("double").alias("__s"),
    )
    # dense calendar: one row per day in [min, max], gaps at 0.0, then
    # ONE ordered array of daily values (bounded by the calendar, the
    # rolling faces' state-size argument)
    bounds = series.agg(
        F.min("__d").alias("__lo"), F.max("__d").alias("__hi")
    )
    cal = bounds.select(
        F.explode(F.sequence("__lo", "__hi")).alias("__d"), "__lo"
    )
    dense = (
        cal.join(series, "__d", "left")
        .select("__lo", "__d", F.coalesce("__s", F.lit(0.0)).alias("__s"))
    )
    arr = dense.groupBy("__lo").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__d", "__s"))),
            lambda t: t["__s"],
        ).alias("__arr")
    )
    obs = series.select(F.col("__d").alias(date_col))
    idx = F.datediff(F.col(date_col), F.col("__lo")) + F.lit(1)
    horner = F.aggregate(
        F.slice(F.col("__arr"), F.lit(1), idx),
        F.lit(0.0),
        lambda acc, x: acc * lam_lit + x,
    )
    return (
        obs.crossJoin(F.broadcast(arr))
        .select(
            date_col,
            idx.cast("long").alias("n_days"),
            F.round(horner, dp).alias("decayed"),
        )
        .orderBy(date_col)
    )


def decayed_step(
    cells: DataFrame,
    carry: DataFrame | None,
    value_col: str,
    *,
    lam: float,
    date_col: str = "event_date",
    dp: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """One batch advance of :func:`decayed_read`'s O(1) incremental law
    — the engine step behind the decayed family's STREAMING face
    (``streaming.incremental.fold_decayed_batch`` / ``replay_decayed``):
    given this batch's per-day exact state cells and the carried
    ``(__lo, __last, __acc)`` state (None for the first batch), return

    - ``out``: (date_col, n_days, decayed) for every day observed in
      the batch — each value the law ``decayed(D) = acc·λ^(D−last) +
      Σ S_d·λ^(D−d)`` computed as ONE left-to-right Horner fold resumed
      FROM the carried acc over the dense calendar (last, D]. Resuming
      a sequential fold is the identical IEEE operation sequence as the
      one-shot fold over [lo, D], so every published value is
      BIT-IDENTICAL to :func:`decayed_read` of all cells delivered so
      far — the stream ≡ batch certificate.
    - ``new_carry``: one row carrying (__lo, __last=batch max day,
      __acc = UNROUNDED decayed at __last) — the whole streaming state,
      one double per series (the O(1) law made literal).

    Batch days must be strictly NEWER than the carried ``__last``: a
    late day cannot be folded into an already-decayed scalar — the
    guard raises in-plan with the backfill recipe (fold the late day's
    cells into the CELL store, which is permutation-safe because cells
    are linear, and re-read via decayed_read / replay from that day).
    The 1-row state array is localCheckpointed: it feeds the output's
    broadcast AND every later batch's carry chain, so un-materialized
    each downstream batch would re-execute this batch's corpus subtree
    (the psi_drift / round-10 materialize rule — O(B²) batch rescans).
    Empty batches must be skipped by the caller (carry unchanged).
    """
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    lam_lit = F.lit(float(lam))
    series = cells.filter(F.col(date_col).isNotNull()).select(
        F.col(date_col).alias("__d"),
        F.col(value_col).cast("double").alias("__s"),
    )
    bounds = series.agg(
        F.min("__d").alias("__bmin"), F.max("__d").alias("__bmax")
    )
    if carry is None:
        base = bounds.select(
            F.col("__bmin").alias("__lo"),
            F.col("__bmin").alias("__start"),
            F.col("__bmax").alias("__hi"),
            F.lit(0.0).alias("__acc0"),
        )
    else:
        base = bounds.crossJoin(F.broadcast(carry)).select(
            F.col("__lo"),
            F.when(
                F.col("__bmin") <= F.col("__last"),
                F.raise_error(
                    F.concat(
                        F.lit("decayed_step: late day "),
                        F.col("__bmin").cast("string"),
                        F.lit(" <= carried last day "),
                        F.col("__last").cast("string"),
                        F.lit(
                            " — a decayed scalar cannot absorb the past;"
                            " backfill through the linear CELL store"
                            " (fold_kpi_batch/refresh_day) and re-read"
                            " with decayed_read, or replay from that day"
                        ),
                    )
                ).cast("date"),
            )
            .otherwise(F.date_add(F.col("__last"), 1))
            .alias("__start"),
            F.col("__bmax").alias("__hi"),
            F.col("__acc").alias("__acc0"),
        )
    cal = base.select(
        "__lo",
        "__start",
        "__hi",
        "__acc0",
        F.explode(F.sequence("__start", "__hi")).alias("__d"),
    )
    dense = cal.join(series, "__d", "left").select(
        "__lo",
        "__start",
        "__hi",
        "__acc0",
        "__d",
        F.coalesce("__s", F.lit(0.0)).alias("__s"),
    )
    arr = (
        dense.groupBy("__lo", "__start", "__hi", "__acc0")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__d", "__s"))),
                lambda t: t["__s"],
            ).alias("__arr")
        )
        .localCheckpoint(eager=True)
    )
    obs = series.select(F.col("__d").alias(date_col))
    idx = F.datediff(F.col(date_col), F.col("__start")) + F.lit(1)
    horner = F.aggregate(
        F.slice(F.col("__arr"), F.lit(1), idx),
        F.col("__acc0"),
        lambda acc, x: acc * lam_lit + x,
    )
    out = obs.crossJoin(F.broadcast(arr)).select(
        date_col,
        (F.datediff(F.col(date_col), F.col("__lo")) + F.lit(1))
        .cast("long")
        .alias("n_days"),
        F.round(horner, dp).alias("decayed"),
    )
    new_carry = arr.select(
        "__lo",
        F.col("__hi").alias("__last"),
        F.aggregate(
            F.col("__arr"),
            F.col("__acc0"),
            lambda acc, x: acc * lam_lit + x,
        ).alias("__acc"),
    )
    return out, new_carry


def ewm_stats(
    cells: DataFrame,
    *,
    lam: float,
    date_col: str = "event_date",
    dp: int = 6,
) -> DataFrame:
    """Exponentially-weighted mean/variance read from per-day MOMENT
    cells — :func:`decayed_read` composed with :func:`moment_cells`
    (r13's reuse pattern: decayed reads run over existing state, no new
    state type): for every observed day D, fold the three exact sums
    with day-grain decay — ``N(D) = Σ n_d·λ^(D−d)``, likewise SX/SXX —
    and derive ``ewm_mean = SX/N``, ``ewm_var = (N·SXX − SX²)/N²``
    (the ``_moment_stats`` fixed-order form on the decayed sums). This
    is the drift-monitoring EWMA/EWMVar a 100 TB pipeline plots per
    day: recency-weighted level AND spread from |calendar| state rows,
    never a raw rescan.

    Engine-exact by the decayed_read argument: λ is applied only by
    repeated multiplication inside three left-to-right Horner folds
    over ONE dense calendar array of exact-DECIMAL day sums cast once
    to double; the two divisions and the square are single fixed-order
    IEEE expressions on the fold outputs, rounded ``dp`` before
    publication (DuckDB twin: the same three ``list_reduce`` folds).
    Returns (date_col, n_days, ewm_n, ewm_mean, ewm_var), ordered.
    """
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    lam_lit = F.lit(float(lam))
    series = cells.filter(F.col(date_col).isNotNull()).select(
        F.col(date_col).alias("__d"),
        F.col("n").cast("double").alias("__n"),
        F.col("sx").cast("double").alias("__sx"),
        F.col("sxx").cast("double").alias("__sxx"),
    )
    bounds = series.agg(
        F.min("__d").alias("__lo"), F.max("__d").alias("__hi")
    )
    cal = bounds.select(
        F.explode(F.sequence("__lo", "__hi")).alias("__d"), "__lo"
    )
    dense = cal.join(series, "__d", "left").select(
        "__lo",
        "__d",
        F.coalesce("__n", F.lit(0.0)).alias("__n"),
        F.coalesce("__sx", F.lit(0.0)).alias("__sx"),
        F.coalesce("__sxx", F.lit(0.0)).alias("__sxx"),
    )
    rows = F.array_sort(
        F.collect_list(F.struct("__d", "__n", "__sx", "__sxx"))
    )
    arr = dense.groupBy("__lo").agg(
        F.transform(rows, lambda t: t["__n"]).alias("__an"),
        F.transform(rows, lambda t: t["__sx"]).alias("__ax"),
        F.transform(rows, lambda t: t["__sxx"]).alias("__axx"),
    )
    obs = series.select(F.col("__d").alias(date_col))
    idx = F.datediff(F.col(date_col), F.col("__lo")) + F.lit(1)

    def fold(col: str) -> Column:
        return F.aggregate(
            F.slice(F.col(col), F.lit(1), idx),
            F.lit(0.0),
            lambda acc, x: acc * lam_lit + x,
        )

    en, esx, esxx = fold("__an"), fold("__ax"), fold("__axx")
    var = (en * esxx - esx * esx) / (en * en)
    return (
        obs.crossJoin(F.broadcast(arr))
        .select(
            date_col,
            idx.cast("long").alias("n_days"),
            F.round(en, dp).alias("ewm_n"),
            pub_round(esx / en, dp).alias("ewm_mean"),
            pub_round(var, dp).alias("ewm_var"),
        )
        .orderBy(date_col)
    )


def decayed_now_by(
    cells: DataFrame,
    keys: Sequence[str],
    value_col: str,
    *,
    lam: float,
    date_col: str = "event_date",
    dp: int = 6,
) -> DataFrame:
    """Grouped :func:`decayed_read` evaluated AT the latest calendar day
    — the trending dashboard: one row per group with its recency-
    weighted total ``Σ_d S_{g,d}·λ^(hi−d)``, where hi is the GLOBAL max
    day (so groups are comparable: a group with no recent activity
    decays toward 0 instead of being read at its own stale day).

    Same engine-exactness argument as decayed_read: per-group dense
    calendar arrays (|groups|·|days| state rows — calendar²-bounded,
    never corpus-sized) and ONE fixed-order Horner fold per group over
    exact DECIMAL inputs. Returns (keys…, n_days, decayed).
    """
    if not 0.0 < lam < 1.0:
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    lam_lit = F.lit(float(lam))
    series = cells.filter(F.col(date_col).isNotNull()).select(
        *keys,
        F.col(date_col).alias("__d"),
        F.col(value_col).cast("double").alias("__s"),
    )
    bounds = series.agg(
        F.min("__d").alias("__lo"), F.max("__d").alias("__hi")
    )
    cal = bounds.select(
        F.explode(F.sequence("__lo", "__hi")).alias("__d"),
        "__lo",
        "__hi",
    )
    groups = series.select(*keys).distinct()
    dense = (
        groups.crossJoin(F.broadcast(cal))
        .join(series, [*keys, "__d"], "left")
        .select(
            *keys,
            "__lo",
            "__hi",
            "__d",
            F.coalesce("__s", F.lit(0.0)).alias("__s"),
        )
    )
    horner = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__d", "__s"))),
            lambda t: t["__s"],
        ),
        F.lit(0.0),
        lambda acc, x: acc * lam_lit + x,
    )
    return (
        dense.groupBy(*keys)
        .agg(
            (F.datediff(F.first("__hi"), F.first("__lo")) + F.lit(1))
            .cast("long")
            .alias("n_days"),
            F.round(horner, dp).alias("decayed"),
        )
        .orderBy(F.col("decayed").desc(), *[F.col(k).asc() for k in keys])
    )
