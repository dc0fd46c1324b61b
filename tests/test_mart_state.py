"""Incrementally maintainable KPI mart state (operators/mart_state.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_retail_etl_spark import adapters
from airflow_retail_etl_spark.operators import cardinality, mart_state
from airflow_retail_etl_spark.streaming.incremental import (
    fold_kpi_batch,
    replay_kpi,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    return adapters.staging_events(spark, SF)


def _rows(df, *keys):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple(str(x) for x in t[: len(keys) or 1]),
    )


def test_fold_of_daily_cells_equals_one_shot(spark):
    """The linear fold law: per-day cells summed to brand grain must be
    BIT-identical to aggregating the raw events at brand grain directly
    (cent sums and counts are exact under any grouping)."""
    ev = _events(spark).withColumn(
        "brand", F.expr("CAST(user_id % 5 AS STRING)")
    )
    cells = mart_state.kpi_cells(ev, ["brand"])
    folded = mart_state.kpi_fold(cells, ["brand"])
    one_shot = mart_state.kpi_cells(
        ev.withColumn("event_date", F.lit(None).cast("date")), ["brand"]
    ).drop("event_date")
    assert _rows(folded, "brand") == _rows(
        one_shot.select(*folded.columns), "brand"
    )


def test_fold_is_split_and_layout_invariant(spark):
    """Cells built from any disjoint split of the events, unioned and
    folded, equal the one-split fold; repartitioning the input changes
    nothing (md5-free exact arithmetic)."""
    ev = _events(spark)
    cells_all = mart_state.kpi_cells(ev, [])
    a = mart_state.kpi_cells(ev.filter(F.col("event_id") % 2 == 0), [])
    b = mart_state.kpi_cells(ev.filter(F.col("event_id") % 2 == 1), [])
    refolded = mart_state.kpi_fold(a.unionByName(b), ["event_date"])
    base = mart_state.kpi_fold(cells_all, ["event_date"])
    assert _rows(refolded, "event_date") == _rows(
        base.select(*refolded.columns), "event_date"
    )
    relaid = mart_state.kpi_cells(ev.repartition(13), [])
    assert _rows(
        mart_state.kpi_fold(relaid, ["event_date"]), "event_date"
    ) == _rows(base.select(*refolded.columns), "event_date")


def test_refresh_day_law(spark):
    """State through day d-1 plus day d's fresh cells == state through
    day d; re-refreshing an already-present day is idempotent (the
    O(delta) maintenance law)."""
    ev = _events(spark)
    days = sorted(
        r[0] for r in ev.select("event_date").distinct().collect()
    )
    last = days[-1]
    full = mart_state.kpi_cells(ev, [])
    head = mart_state.kpi_cells(
        ev.filter(F.col("event_date") < F.lit(last)), []
    )
    day = mart_state.kpi_cells(
        ev.filter(F.col("event_date") == F.lit(last)), []
    )
    refreshed = mart_state.refresh_day(head, day)
    assert _rows(refreshed, "event_date") == _rows(full, "event_date")
    again = mart_state.refresh_day(refreshed, day)
    assert _rows(again, "event_date") == _rows(full, "event_date")


def test_read_matches_exact_mart(spark):
    """kpi_read's additive columns at date grain equal the exact
    aggregate computed straight from events, and the funnel rates are
    the rounded exact ratios."""
    ev = _events(spark)
    cells = mart_state.kpi_cells(ev, [])
    regs = cardinality.hll_registers(ev, ["event_date"], "user_id", p=8)
    read = mart_state.kpi_read(cells, regs, ["event_date"], p=8)
    exact = ev.groupBy("event_date").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("views"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("purchases"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("price"), 2).cast("decimal(18,2)"),
            ).otherwise(F.lit(0).cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue"),
        F.count_distinct("user_id").cast("long").alias("exact_users"),
    )
    j = read.join(
        exact.select(
            "event_date",
            F.col("views").alias("x_views"),
            F.col("purchases").alias("x_purchases"),
            F.col("revenue").alias("x_revenue"),
            "exact_users",
        ),
        "event_date",
    ).collect()
    assert j
    for r in j:
        assert r["views"] == r["x_views"]
        assert r["purchases"] == r["x_purchases"]
        assert r["revenue"] == r["x_revenue"]
        # p=8 ⇒ σ ≈ 1.04/√256 ≈ 6.5%; 4σ bound
        assert abs(r["unique_users_est"] - r["exact_users"]) <= max(
            0.26 * r["exact_users"], 3
        )
        if r["views"]:
            assert r["cart_rate"] == round(r["carts"] / r["views"], 6)


def test_rolling_windows_equal_brute_force(spark):
    """rolling_kpis' additive window sums equal recomputing each
    trailing window straight from the raw events."""
    ev = _events(spark)
    cells = mart_state.kpi_cells(ev, [])
    regs = cardinality.hll_registers(ev, ["event_date"], "user_id", p=8)
    roll = {
        r["window_end"]: r
        for r in mart_state.rolling_kpis(
            cells, regs, window_days=7, p=8
        ).collect()
    }
    days = sorted(roll)[::7]  # ramp-up head, steady state, tail
    for d in days:
        win = ev.filter(
            (F.col("event_date") <= F.lit(d))
            & (F.col("event_date") >= F.date_sub(F.lit(d), 6))
        )
        brute = win.agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("purchases"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        ).first()
        assert roll[d]["purchases"] == brute["purchases"]
        assert roll[d]["n_events"] == brute["n_events"]


def test_streaming_fold_store_redelivery_noop(spark, tmp_path):
    """fold_kpi_batch under at-least-once delivery: re-folding an
    already-delivered batch rewrites its own batch_id partition with
    identical cells — the folded mart is unchanged (the CMS overwrite
    pattern for linear state)."""
    ev = _events(spark)
    store = str(tmp_path / "kpi_state")
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    for i, b in enumerate(batches):
        fold_kpi_batch(b, store, [], batch_id=i)
    once = _rows(
        mart_state.kpi_fold(
            spark.read.parquet(store).drop("batch_id"), ["event_date"]
        ),
        "event_date",
    )
    fold_kpi_batch(batches[1], store, [], batch_id=1)  # redelivery
    twice = _rows(
        mart_state.kpi_fold(
            spark.read.parquet(store).drop("batch_id"), ["event_date"]
        ),
        "event_date",
    )
    assert once == twice
    # and the store equals the batch-face replay
    replayed = _rows(replay_kpi(batches, []), "event_date")
    assert once == replayed


def test_replay_equals_one_shot(spark):
    """The stream ≡ batch certificate in-engine: replay_kpi over any
    batching equals the one-shot cells of the whole corpus."""
    ev = _events(spark)
    one = _rows(mart_state.kpi_cells(ev, []), "event_date")
    batches = [ev.filter(F.col("event_id") % 4 == i) for i in range(4)]
    assert _rows(replay_kpi(batches, []), "event_date") == one


def test_moment_cells_fold_equals_one_shot_and_brute(spark):
    """Moment fold law + statistics: per-day cells folded equal the
    one-shot sums, the statistics match a float brute force, and the
    exact DECIMAL state is layout-invariant."""
    import math

    ev = _events(spark).filter(F.col("price").isNotNull())
    cells = mart_state.moment_cells(ev, [], "price")
    read = mart_state.moment_read(cells, []).first()
    vals = [round(r[0], 2) for r in ev.select("price").collect()]
    n = len(vals)
    mean = sum(vals) / n
    var = sum(v * v for v in vals) / n - mean * mean
    assert read.n == n
    assert abs(read.mean - mean) < 1e-6
    assert abs(read.variance - var) < 1e-4
    assert abs(read.stddev - math.sqrt(max(var, 0.0))) < 1e-4
    relaid = mart_state.moment_read(
        mart_state.moment_cells(ev.repartition(13), [], "price"), []
    ).first()
    assert tuple(relaid) == tuple(read)


def test_rolling_moments_equal_brute(spark):
    """rolling_moments' window statistics equal recomputing each
    trailing window straight from raw purchase prices."""
    ev = _events(spark).filter(F.col("event_type") == "purchase")
    cells = mart_state.moment_cells(ev, [], "price")
    roll = {
        r["window_end"]: r
        for r in mart_state.rolling_moments(
            cells, window_days=7
        ).collect()
    }
    for d in sorted(roll)[::9]:
        vals = [
            round(r[0], 2)
            for r in ev.filter(
                (F.col("event_date") <= F.lit(d))
                & (F.col("event_date") >= F.date_sub(F.lit(d), 6))
                & F.col("price").isNotNull()
            )
            .select("price")
            .collect()
        ]
        n = len(vals)
        mean = sum(vals) / n
        var = sum(v * v for v in vals) / n - mean * mean
        assert roll[d]["n"] == n
        assert abs(roll[d]["mean"] - mean) < 1e-6
        assert abs(roll[d]["variance"] - var) < 1e-4


def test_fold_moment_batch_redelivery_noop(spark, tmp_path):
    """Streaming moment fold under at-least-once delivery: re-folding a
    delivered batch rewrites its own partition with identical cells."""
    from airflow_retail_etl_spark.streaming.incremental import (
        fold_moment_batch,
    )

    ev = _events(spark).filter(F.col("event_type") == "purchase")
    store = str(tmp_path / "moment_state")
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    for i, b in enumerate(batches):
        fold_moment_batch(b, store, [], "price", batch_id=i)
    read = lambda: tuple(  # noqa: E731
        mart_state.moment_read(
            spark.read.parquet(store).drop("batch_id"), []
        ).first()
    )
    once = read()
    fold_moment_batch(batches[1], store, [], "price", batch_id=1)
    assert read() == once
    # stream == batch: folded store equals the one-shot statistics
    one_shot = tuple(
        mart_state.moment_read(
            mart_state.moment_cells(ev, [], "price"), []
        ).first()
    )
    assert once == one_shot


def test_kpi_read_keeps_grain_with_no_registers(spark):
    """A grain whose rows all carry NULL user_id has additive cells but
    no HLL registers — the LEFT join (round-12 advice) must keep its
    views/revenue with unique_users_est defaulted to 0.0, not drop the
    grain from the mart."""
    ev = spark.createDataFrame(
        [
            ("2024-01-01", "view", 1.0, "u1"),
            ("2024-01-01", "purchase", 2.5, "u1"),
            ("2024-01-02", "view", 3.0, None),
            ("2024-01-02", "view", 4.0, None),
        ],
        "event_date string, event_type string, price double, "
        "user_id string",
    ).withColumn("event_date", F.to_date("event_date"))
    cells = mart_state.kpi_cells(ev, ["event_date"])
    regs = cardinality.hll_registers(ev, ["event_date"], "user_id", p=8)
    read = {
        str(r["event_date"]): r
        for r in mart_state.kpi_read(
            cells, regs, ["event_date"], p=8
        ).collect()
    }
    assert set(read) == {"2024-01-01", "2024-01-02"}
    lone = read["2024-01-02"]
    assert lone["views"] == 2
    assert lone["unique_users_est"] == 0.0


def test_rolling_kpis_keep_registerless_windows(spark):
    """rolling_kpis' window join is LEFT for the same reason: a window
    whose days have no non-NULL users keeps its additive KPIs."""
    ev = spark.createDataFrame(
        [("2024-01-01", "view", 1.0, None), ("2024-01-02", "view", 2.0, None)],
        "event_date string, event_type string, price double, "
        "user_id string",
    ).withColumn("event_date", F.to_date("event_date"))
    cells = mart_state.kpi_cells(ev, [])
    regs = cardinality.hll_registers(ev, ["event_date"], "user_id", p=8)
    out = mart_state.rolling_kpis(cells, regs, window_days=7, p=8).collect()
    assert len(out) == 2
    assert all(r["unique_users_est"] == 0.0 for r in out)
    assert sum(r["views"] for r in out) == 3  # 1 + (1+2 ramp-up window)


def test_replay_helpers_reject_empty_batches():
    """Every replay_* helper fails fast with a named error on zero
    batches instead of an AttributeError deep in the fold."""
    import pytest

    from airflow_retail_etl_spark.streaming import incremental as inc

    with pytest.raises(ValueError, match="replay_kpi: empty batches"):
        inc.replay_kpi([], [])
    with pytest.raises(ValueError, match="replay_sketch: empty batches"):
        inc.replay_sketch([], "c")
    with pytest.raises(ValueError, match="replay_cms: empty batches"):
        inc.replay_cms([], "c")
    with pytest.raises(ValueError, match="replay_qsketch: empty batches"):
        inc.replay_qsketch([], "v", "k", [0.5])
    with pytest.raises(ValueError, match="replay_sample: empty batches"):
        inc.replay_sample([], "c", k=4)
    with pytest.raises(
        ValueError, match="replay_admission: empty batches"
    ):
        inc.replay_admission([])


def test_replay_moment_equals_one_shot(spark):
    """replay_moment folded across 4 batches is bit-identical to the
    one-shot per-day moment cells (linear exact DECIMAL sums)."""
    from airflow_retail_etl_spark.streaming.incremental import (
        replay_moment,
    )

    ev = _events(spark).filter(F.col("event_type") == "purchase")
    batches = [ev.filter(F.col("event_id") % 4 == i) for i in range(4)]
    folded = replay_moment(batches, [], "price")
    one_shot = mart_state.moment_cells(ev, [], "price")
    assert _rows(folded) == _rows(one_shot)
    with __import__("pytest").raises(
        ValueError, match="replay_moment: empty batches"
    ):
        replay_moment([], [], "price")


def test_decayed_read_incremental_law_and_gaps(spark):
    """decayed_read equals the O(1) incremental recurrence
    decayed(D) = decayed(D-1)·λ + S_D (with λ-only steps across
    calendar gaps), and rejects degenerate λ."""
    import datetime as dt

    import pytest

    rows = [
        ("2024-01-01", "purchase", 100.0),
        ("2024-01-02", "purchase", 50.0),
        # gap on 01-03
        ("2024-01-04", "purchase", 10.0),
    ]
    ev = spark.createDataFrame(
        [(d, t, p, "u") for d, t, p in rows],
        "event_date string, event_type string, price double, user_id string",
    ).withColumn("event_date", F.to_date("event_date"))
    cells = mart_state.kpi_cells(ev, [])
    out = {
        str(r["event_date"]): r
        for r in mart_state.decayed_read(
            cells, "revenue_cents", lam=0.5
        ).collect()
    }
    assert out["2024-01-01"]["decayed"] == 100.0
    assert out["2024-01-02"]["decayed"] == 100.0 * 0.5 + 50.0
    # gap day contributes 0: ((100·0.5+50)·0.5 + 0)·0.5 + 10
    assert out["2024-01-04"]["decayed"] == round(
        (100.0 * 0.5 + 50.0) * 0.5 * 0.5 + 10.0, 6
    )
    assert out["2024-01-04"]["n_days"] == 4
    with pytest.raises(ValueError, match="lam"):
        mart_state.decayed_read(cells, "revenue_cents", lam=1.0)


def _decayed_batches(spark, n=3):
    ev = _events(spark)
    dom = F.dayofmonth("event_date")
    spans = ((1, 10), (11, 20), (21, 31))[:n]
    return [
        mart_state.kpi_cells(ev.filter((dom >= lo) & (dom <= hi)), [])
        for lo, hi in spans
    ]


def test_fold_decayed_batch_redelivery_noop(spark, tmp_path):
    """Streaming decayed fold under at-least-once delivery: partition N
    is a pure function of (partition N−1's carry, batch N), so
    re-folding a delivered batch rewrites identical rows — the series
    read is unchanged, and it is BIT-identical to the one-shot
    decayed_read of everything delivered (the store-backed certificate
    the other five state folds have)."""
    from airflow_retail_etl_spark.streaming.incremental import (
        fold_decayed_batch,
        read_decayed_store,
    )

    store = str(tmp_path / "decayed_state")
    batches = _decayed_batches(spark)
    for i, b in enumerate(batches):
        fold_decayed_batch(b, store, "revenue_cents", batch_id=i, lam=0.9)
    once = _rows(read_decayed_store(spark, store), "event_date")
    fold_decayed_batch(
        batches[1], store, "revenue_cents", batch_id=1, lam=0.9
    )  # redelivery
    assert _rows(read_decayed_store(spark, store), "event_date") == once
    # stream == batch: the store equals the one-shot decayed read
    ev = _events(spark)
    one_shot = _rows(
        mart_state.decayed_read(
            mart_state.kpi_cells(ev, []), "revenue_cents", lam=0.9
        ),
        "event_date",
    )
    assert once == one_shot


def test_fold_decayed_batch_rejects_late_day(spark, tmp_path):
    """A batch whose days do not advance past the carried last day must
    raise the backfill recipe, never silently fold the past into an
    already-decayed scalar."""
    import pytest

    from airflow_retail_etl_spark.streaming.incremental import (
        fold_decayed_batch,
    )

    store = str(tmp_path / "decayed_state")
    batches = _decayed_batches(spark)
    for i, b in enumerate(batches):
        fold_decayed_batch(b, store, "revenue_cents", batch_id=i, lam=0.9)
    with pytest.raises(Exception, match="late day"):
        fold_decayed_batch(
            batches[0], store, "revenue_cents", batch_id=3, lam=0.9
        )


def test_fold_decayed_batch_empty_batch_carries_through(spark, tmp_path):
    """An empty micro-batch rewrites the prior carry under its own
    batch id; the next real batch resumes from it and the final series
    still equals the one-shot read."""
    from airflow_retail_etl_spark.streaming.incremental import (
        fold_decayed_batch,
        read_decayed_store,
    )

    store = str(tmp_path / "decayed_state")
    b0, b1, b2 = _decayed_batches(spark)
    empty = b0.filter("1 = 0")
    for i, b in enumerate((b0, empty, b1, b2)):
        fold_decayed_batch(b, store, "revenue_cents", batch_id=i, lam=0.9)
    got = _rows(read_decayed_store(spark, store), "event_date")
    one_shot = _rows(
        mart_state.decayed_read(
            mart_state.kpi_cells(_events(spark), []),
            "revenue_cents",
            lam=0.9,
        ),
        "event_date",
    )
    assert got == one_shot


def test_state_folds_are_day_permutation_invariant(spark, tmp_path):
    """The backfill law (r13 verdict item 5): per-day cells folded in
    ANY arrival order — including a LATE day landing after later days
    were already folded — read identically to the calendar-ordered fold
    for the kpi, moment, and decayed READS, because cells are linear
    and every read is a pure function of the folded cell state. (The
    carried-scalar decayed STORE is the one order-sensitive face; it
    rejects late days and routes them here — test above.)"""
    import random

    from airflow_retail_etl_spark.streaming.incremental import (
        fold_kpi_batch,
        fold_moment_batch,
    )

    ev = _events(spark)
    days = sorted(
        r["event_date"] for r in ev.select("event_date").distinct().collect()
    )
    rng = random.Random(42)
    perm = days[:]
    rng.shuffle(perm)
    # a demonstrably-late arrival: force the earliest day to fold LAST
    perm.remove(days[0])
    perm.append(days[0])

    kpi_store = str(tmp_path / "kpi_perm")
    mom_store = str(tmp_path / "mom_perm")
    purchases = ev.filter(F.col("event_type") == "purchase")
    for i, d in enumerate(perm):
        day = ev.filter(F.col("event_date") == d)
        fold_kpi_batch(day, kpi_store, [], batch_id=i)
        fold_moment_batch(
            purchases.filter(F.col("event_date") == d),
            mom_store,
            [],
            "price",
            batch_id=i,
        )

    kpi_cells_folded = mart_state.kpi_fold(
        spark.read.parquet(kpi_store).drop("batch_id"), ["event_date"]
    )
    one_kpi = mart_state.kpi_cells(ev, [])
    assert _rows(kpi_cells_folded, "event_date") == _rows(
        one_kpi, "event_date"
    )
    # decayed read over the permutation-folded cell store == calendar
    assert _rows(
        mart_state.decayed_read(kpi_cells_folded, "revenue_cents", lam=0.9),
        "event_date",
    ) == _rows(
        mart_state.decayed_read(one_kpi, "revenue_cents", lam=0.9),
        "event_date",
    )
    # moment read likewise
    mom_folded = mart_state.moment_fold(
        spark.read.parquet(mom_store).drop("batch_id"), ["event_date"]
    )
    assert _rows(
        mart_state.moment_read(mom_folded, ["event_date"]), "event_date"
    ) == _rows(
        mart_state.moment_read(
            mart_state.moment_cells(purchases, [], "price"), ["event_date"]
        ),
        "event_date",
    )


def test_ewm_stats_matches_reference_fold(spark):
    """ewm_stats ≡ a python reference of the same day-grain decay law
    on a small synthetic series (gap days contribute 0), and the
    outputs are layout-invariant."""
    import datetime as dt

    rows = [
        (dt.date(2024, 1, 1), 10.0),
        (dt.date(2024, 1, 1), 20.0),
        (dt.date(2024, 1, 2), 5.0),
        (dt.date(2024, 1, 4), 7.5),
        (dt.date(2024, 1, 4), 2.5),
        (dt.date(2024, 1, 7), 40.0),
    ]
    df = spark.createDataFrame(rows, "event_date date, price double")
    cells = mart_state.moment_cells(df, [], "price")
    got = {
        str(r.event_date): (r.n_days, r.ewm_n, r.ewm_mean, r.ewm_var)
        for r in mart_state.ewm_stats(cells, lam=0.5).collect()
    }
    # python reference: fold per day over the dense calendar
    by_day = {}
    for d, v in rows:
        n, sx, sxx = by_day.get(d, (0, 0.0, 0.0))
        by_day[d] = (n + 1, sx + v, sxx + v * v)
    lo = min(by_day)
    for day in sorted(by_day):
        en = ex = exx = 0.0
        for i in range((day - lo).days + 1):
            d = lo + dt.timedelta(days=i)
            n, sx, sxx = by_day.get(d, (0, 0.0, 0.0))
            en = en * 0.5 + n
            ex = ex * 0.5 + sx
            exx = exx * 0.5 + sxx
        m = ex / en
        var = (en * exx - ex * ex) / (en * en)
        nd, g_en, g_m, g_v = got[str(day)]
        assert nd == (day - lo).days + 1
        # engine publishes at 6dp (HALF_UP); reference is unrounded
        assert abs(g_en - en) < 5e-7
        assert abs(g_m - m) < 5e-7
        assert abs(g_v - var) < 5e-7
    # layout invariance (exact DECIMAL cells -> identical folds)
    again = {
        str(r.event_date): (r.n_days, r.ewm_n, r.ewm_mean, r.ewm_var)
        for r in mart_state.ewm_stats(
            mart_state.moment_cells(df.repartition(5), [], "price"),
            lam=0.5,
        ).collect()
    }
    assert again == got
