from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from airflow_retail_etl_spark.operators.scd import (
    scd2_current,
    scd2_from_snapshots,
    scd2_upsert,
)

D = datetime.date


def _snapshots(spark):
    rows = [
        # key 1: gold → gold → silver  (change on day 3)
        (1, "gold", D(2020, 1, 1)),
        (1, "gold", D(2020, 1, 2)),
        (1, "silver", D(2020, 1, 3)),
        # key 2: appears day 2 only, never changes
        (2, "bronze", D(2020, 1, 2)),
        # key 3: NULL → value transition is a change
        (3, None, D(2020, 1, 1)),
        (3, "gold", D(2020, 1, 2)),
    ]
    return spark.createDataFrame(rows, ["user_id", "tier", "snap_date"])


def test_scd2_from_snapshots_versions(spark):
    hist = scd2_from_snapshots(
        _snapshots(spark), ["user_id"], ["tier"], "snap_date"
    )
    rows = {
        (r.user_id, r.tier): (r.effective_from, r.effective_to, r.is_current)
        for r in hist.collect()
    }
    assert rows == {
        (1, "gold"): (D(2020, 1, 1), D(2020, 1, 3), False),
        (1, "silver"): (D(2020, 1, 3), None, True),
        (2, "bronze"): (D(2020, 1, 2), None, True),
        (3, None): (D(2020, 1, 1), D(2020, 1, 2), False),
        (3, "gold"): (D(2020, 1, 2), None, True),
    }


def test_scd2_current_is_scd1_view(spark):
    hist = scd2_from_snapshots(
        _snapshots(spark), ["user_id"], ["tier"], "snap_date"
    )
    cur = {(r.user_id, r.tier) for r in scd2_current(hist).collect()}
    assert cur == {(1, "silver"), (2, "bronze"), (3, "gold")}


def test_upsert_fold_equals_batch_rebuild(spark):
    snaps = _snapshots(spark)
    full = scd2_from_snapshots(snaps, ["user_id"], ["tier"], "snap_date")

    days = sorted(
        r.snap_date for r in snaps.select("snap_date").distinct().collect()
    )
    first = snaps.filter(F.col("snap_date") == days[0])
    hist = first.select(
        "user_id",
        "tier",
        F.col("snap_date").alias("effective_from"),
        F.lit(None).cast("date").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    for day in days[1:]:
        batch = snaps.filter(F.col("snap_date") == day).drop("snap_date")
        hist = scd2_upsert(
            hist, batch, ["user_id"], ["tier"], F.lit(day)
        )
    from collections import Counter

    assert Counter(map(tuple, hist.collect())) == Counter(
        map(tuple, full.collect())
    )


def test_upsert_absent_key_stays_current(spark):
    hist = spark.createDataFrame(
        [(1, "gold", D(2020, 1, 1), None, True)],
        "user_id long, tier string, effective_from date, "
        "effective_to date, is_current boolean",
    )
    batch = spark.createDataFrame([(2, "bronze")], ["user_id", "tier"])
    out = scd2_upsert(
        hist, batch, ["user_id"], ["tier"], F.lit(D(2020, 1, 5))
    )
    rows = {(r.user_id, r.tier): r.is_current for r in out.collect()}
    assert rows == {(1, "gold"): True, (2, "bronze"): True}


def test_scd2_asof_single_version_per_key(spark):
    from pyspark.sql import functions as F

    from airflow_retail_etl_spark.operators.scd import (
        scd2_asof,
        scd2_current,
        scd2_from_snapshots,
    )

    snaps = spark.createDataFrame(
        [
            (1, "2024-01-01", "a"),
            (1, "2024-01-03", "b"),
            (1, "2024-01-06", "c"),
            (2, "2024-01-02", "x"),
        ],
        "k int, d string, v string",
    ).select("k", F.to_date("d").alias("d"), "v")
    hist = scd2_from_snapshots(snaps, ["k"], ["v"], "d")

    mid = scd2_asof(hist, F.lit("2024-01-04").cast("date"))
    got = {(r["k"], r["v"]) for r in mid.collect()}
    assert got == {(1, "b"), (2, "x")}
    assert mid.groupBy("k").count().filter("count > 1").count() == 0

    # as-of beyond the last change ≡ the current slice
    late = scd2_asof(hist, F.lit("2030-01-01").cast("date"))
    cur = scd2_current(hist)
    assert {tuple(r) for r in late.select("k", "v").collect()} == {
        tuple(r) for r in cur.select("k", "v").collect()
    }

    # as-of before any version: empty
    early = scd2_asof(hist, F.lit("2023-12-31").cast("date"))
    assert early.count() == 0
