from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from airflow_retail_etl_spark.pipeline import (
    PipelineConfig,
    build_dim_date,
    run_backfill,
    run_day,
)

HEADER = (
    "event_time,event_type,product_id,category_id,category_code,"
    "brand,price,user_id,user_session\n"
)


def _day_rows(date: str, rows: list[tuple[str, int, str, str, float, int]]) -> str:
    body = HEADER
    for t, pid, code, brand, price, uid in rows:
        body += f"{date} {t},{_typ(t)},{pid},9,{code},{brand},{price},{uid},s-{uid}\n"
    return body


def _typ(t: str) -> str:
    # encode event_type in the seconds field for terseness: 00=view 01=cart 02=purchase
    return {"0": "view", "1": "cart", "2": "purchase"}[t[-1]]


@pytest.fixture(scope="module")
def cfg(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("retail")
    raw = root / "raw"
    for date, rows in {
        "2019-10-01": [
            ("10:00:00", 1, "electronics.phone", "apple", 999.0, 1),
            ("10:01:00", 1, "electronics.phone", "apple", 999.0, 2),
            ("10:02:01", 1, "electronics.phone", "apple", 999.0, 1),
            ("10:03:02", 1, "electronics.phone", "apple", 999.0, 1),
            ("11:00:02", 2, "home", "", 19.99, 3),
        ],
        "2019-10-02": [
            ("09:00:00", 1, "electronics.phone", "apple", 999.0, 1),
            ("09:01:01", 3, "", "acme", 5.0, 4),
        ],
    }.items():
        d = raw / "Day_Wise" / date
        d.mkdir(parents=True)
        (d / "event.csv").write_text(_day_rows(date, rows))
    cfg = PipelineConfig(
        raw_root=str(raw),
        warehouse_root=str(root / "wh"),
        mart_root=str(root / "mart"),
        calendar=("2019-10-01", "2019-10-05"),
    )
    run_backfill(spark, cfg, ["2019-10-01", "2019-10-02"])
    build_dim_date(spark, cfg)
    return cfg


def test_staging_partitions(spark, cfg):
    staging = spark.read.parquet(f"{cfg.warehouse_root}/staging_events")
    assert staging.count() == 7
    # imputation applied (empty CSV fields → NULL → defaults)
    assert staging.filter(F.col("brand") == "Generic").count() == 1
    assert staging.filter(F.col("category_code") == "Unknown").count() == 1


def test_fact_partitions_and_revenue(spark, cfg):
    fact = spark.read.parquet(f"{cfg.warehouse_root}/fact_events")
    d1 = fact.filter(F.col("dt") == "2019-10-01")
    total = d1.agg(F.sum("total_revenue")).first()[0]
    assert total == pytest.approx(999.0 + 19.99)


def test_dim_product_split_and_dedup(spark, cfg):
    prod = spark.read.parquet(f"{cfg.warehouse_root}/dim_product").filter(
        F.col("dt") == "2019-10-01"
    )
    rows = {r["product_id"]: r for r in prod.collect()}
    assert rows[1]["category"] == "electronics"
    assert rows[1]["sub_category1"] == "phone"
    assert rows[1]["sub_category2"] == "na"
    assert rows[2]["category"] == "home"
    assert prod.count() == 2


def test_marts_written_per_date(spark, cfg):
    mart = spark.read.parquet(
        f"{cfg.mart_root}/aggregates/daily_revenue_summary"
    )
    by_dt = {str(r["dt"]): r for r in mart.collect()}
    assert by_dt["2019-10-01"]["revenue"] == pytest.approx(1018.99)
    assert (
        by_dt["2019-10-01"]["views"],
        by_dt["2019-10-01"]["carts"],
        by_dt["2019-10-01"]["purchases"],
    ) == (2, 1, 2)
    assert by_dt["2019-10-01"]["unique_users"] == 3
    assert by_dt["2019-10-02"]["purchases"] == 0
    assert by_dt["2019-10-02"]["revenue"] == 0.0


def test_rerun_is_idempotent(spark, cfg):
    before = spark.read.parquet(f"{cfg.warehouse_root}/fact_events").count()
    run_day(spark, cfg, "2019-10-01")  # re-run one date
    after = spark.read.parquet(f"{cfg.warehouse_root}/fact_events").count()
    assert before == after


def test_dim_date_calendar(spark, cfg):
    cal = spark.read.parquet(f"{cfg.warehouse_root}/dim_date")
    assert cal.count() == 5
    r = cal.filter(F.col("date") == dt.date(2019, 10, 1)).first()
    assert (r["weekday"], r["week"]) == (1, 40)  # Tuesday, ISO week 40


_STAGING_COLS = (
    "event_time timestamp, event_type string, product_id long, "
    "category_id long, category_code string, brand string, "
    "price double, user_id long, user_session string, dt string"
)


def _write_staging_day(spark, cfg2, date, rows):
    spark.createDataFrame(
        [
            (
                dt.datetime.fromisoformat(f"{date} 10:00:00"),
                "view", pid, 9, code, brand, price, uid, f"s-{uid}", date,
            )
            for pid, code, brand, price, uid in rows
        ],
        _STAGING_COLS,
    ).write.mode("append").partitionBy("dt").parquet(
        f"{cfg2.warehouse_root}/staging_events"
    )


def _dims_fixture(spark, tmp_path, days):
    """A standalone incremental-dim warehouse over synthetic staging
    slices (independent of the shared cfg so compaction can delete)."""
    from airflow_retail_etl_spark.pipeline import (
        PipelineConfig,
        build_dims_incremental,
    )

    cfg2 = PipelineConfig(
        raw_root=str(tmp_path / "raw"),
        warehouse_root=str(tmp_path / "wh"),
        mart_root=str(tmp_path / "mart"),
    )
    for date in sorted(days):
        _write_staging_day(spark, cfg2, date, days[date])
        build_dims_incremental(spark, cfg2, date)
    return cfg2


DIM_DAYS = {
    # (product_id, category_code, brand, price, user_id)
    "2019-10-01": [(1, "a.b", "apple", 10.0, 1), (2, "c", "acme", 5.0, 2)],
    "2019-10-02": [(1, "a.b", "apple", 12.0, 1)],           # price change
    "2019-10-03": [(3, "d.e", "zen", 7.0, 3)],              # new product
    "2019-10-04": [(2, "c", "acme", 6.0, 2), (4, "f", "neo", 1.0, 4)],
}


def test_compacted_warehouse_reproduces_upsert_results(
    spark, tmp_path_factory
):
    from airflow_retail_etl_spark.pipeline import (
        build_dims_incremental,
        compact_dim_snapshots,
    )

    base_a = tmp_path_factory.mktemp("dimcomp_a")
    base_b = tmp_path_factory.mktemp("dimcomp_b")
    first3 = {d: r for d, r in DIM_DAYS.items() if d <= "2019-10-03"}
    cfg_a = _dims_fixture(spark, base_a, first3)   # compacted
    cfg_b = _dims_fixture(spark, base_b, first3)   # control

    res = compact_dim_snapshots(
        spark, cfg_a, "dim_product_scd", ["product_id"], keep_last=1
    )
    assert res["dropped"] == ["2019-10-01", "2019-10-02"]
    assert res["kept"] == ["2019-10-03"]
    snaps = spark.read.parquet(f"{cfg_a.warehouse_root}/dim_product_scd")
    assert {str(r["dt"]) for r in snaps.select("dt").distinct().collect()} \
        == {"2019-10-03"}

    # merge continuity: the next day's merge on the compacted warehouse
    # equals the uncompacted control exactly
    for cfgx in (cfg_a, cfg_b):
        _write_staging_day(spark, cfgx, "2019-10-04", DIM_DAYS["2019-10-04"])
        build_dims_incremental(spark, cfgx, "2019-10-04")

    def final_state(cfgx):
        return sorted(
            (
                r["product_id"], r["category_code"], r["brand"], r["price"]
            )
            for r in spark.read.parquet(
                f"{cfgx.warehouse_root}/dim_product_scd"
            ).filter(F.col("dt") == "2019-10-04").collect()
        )

    assert final_state(cfg_a) == final_state(cfg_b)
    assert len(final_state(cfg_a)) == 4


def test_compaction_history_time_travels_to_dropped_snapshots(
    spark, tmp_path_factory
):
    from airflow_retail_etl_spark.operators import scd
    from airflow_retail_etl_spark.pipeline import compact_dim_snapshots

    base = tmp_path_factory.mktemp("dimcomp_tt")
    cfg2 = _dims_fixture(spark, base, DIM_DAYS)
    # capture pre-compaction snapshots for the dates about to be dropped
    pre = {
        d: sorted(
            (r["product_id"], r["category_code"], r["brand"], r["price"])
            for r in spark.read.parquet(
                f"{cfg2.warehouse_root}/dim_product_scd"
            ).filter(F.col("dt") == d).collect()
        )
        for d in DIM_DAYS
    }
    res = compact_dim_snapshots(
        spark, cfg2, "dim_product_scd", ["product_id"], keep_last=1
    )
    assert res["dropped"] == sorted(DIM_DAYS)[:-1]
    hist = spark.read.parquet(res["history_path"])
    for d in DIM_DAYS:
        asof = scd.scd2_asof(hist, F.lit(d).cast("date"))
        got = sorted(
            (r["product_id"], r["category_code"], r["brand"], r["price"])
            for r in asof.collect()
        )
        assert got == pre[d], d

    # idempotent: re-running folds nothing and drops nothing new
    again = compact_dim_snapshots(
        spark, cfg2, "dim_product_scd", ["product_id"], keep_last=1
    )
    assert again["dropped"] == []
    assert spark.read.parquet(res["history_path"]).count() == hist.count()


def test_build_dims_incremental_snapshots(spark, cfg):
    from airflow_retail_etl_spark.pipeline import build_dims_incremental

    build_dims_incremental(spark, cfg, "2019-10-01")
    build_dims_incremental(spark, cfg, "2019-10-02")
    prod = spark.read.parquet(f"{cfg.warehouse_root}/dim_product_scd")
    latest = prod.filter(F.col("dt") == "2019-10-02")
    # the latest snapshot is the COMPLETE dim: day-1 products survive,
    # day-2 products merged in
    assert {r["product_id"] for r in latest.collect()} == {1, 2, 3}
    day1 = prod.filter(F.col("dt") == "2019-10-01")
    assert {r["product_id"] for r in day1.collect()} == {1, 2}
    # re-running day 2 is idempotent (dynamic partition overwrite)
    build_dims_incremental(spark, cfg, "2019-10-02")
    again = spark.read.parquet(f"{cfg.warehouse_root}/dim_product_scd").filter(
        F.col("dt") == "2019-10-02"
    )
    assert again.count() == 3
    users = spark.read.parquet(f"{cfg.warehouse_root}/dim_user_scd").filter(
        F.col("dt") == "2019-10-02"
    )
    # accumulated (user, session) pairs across both days: day-1 {1,2,3}
    # plus day-2's new user 4 (user 1's pair is unchanged → no dup)
    assert users.count() == 4


def test_snapshot_pointer_is_authoritative_and_falls_back(spark, cfg):
    """O(1) previous-snapshot discovery (round-13): the merge base
    comes from the _snapshot_dts.json pointer, not a partition scan;
    with the pointer gone, the physical listing takes over and the next
    write rebuilds the file. Pointer authority is proven by doctoring
    it: omitting a physically-present snapshot must change the chosen
    merge base — a directory listing would not notice."""
    import json
    import pathlib

    from airflow_retail_etl_spark.pipeline import (
        build_dims_incremental,
        read_snapshot_dts,
        write_snapshot_dts,
    )

    build_dims_incremental(spark, cfg, "2019-10-01")
    build_dims_incremental(spark, cfg, "2019-10-02")
    path = f"{cfg.warehouse_root}/dim_product_scd"
    assert read_snapshot_dts(spark, path) == ["2019-10-01", "2019-10-02"]

    # doctor the pointer (through the API — the local Hadoop FS keeps a
    # .crc sidecar, so an out-of-band edit reads as corrupt, which is
    # the FALLBACK path, tested below) to hide day 2: day 3 must merge
    # against day 1 — pointer authority, no physical re-listing
    write_snapshot_dts(spark, path, ["2019-10-01"])
    build_dims_incremental(spark, cfg, "2019-10-03")
    d3 = spark.read.parquet(path).filter(F.col("dt") == "2019-10-03")
    # day-1 base has products {1, 2}; day-3 staging is empty (no raw
    # csv for that date), so the merge equals day 1 — product 3 (added
    # on the hidden day 2) must be ABSENT
    assert {r["product_id"] for r in d3.collect()} == {1, 2}
    # the write repaired the pointer with day 3 appended
    assert read_snapshot_dts(spark, path) == ["2019-10-01", "2019-10-03"]

    # fallback 1: an out-of-band edit fails the local-FS checksum and
    # reads as corrupt → None (never a wrong list)
    ptr = pathlib.Path(path) / "_snapshot_dts.json"
    ptr.write_text(json.dumps({"dts": ["2019-10-01"]}))
    assert read_snapshot_dts(spark, path) is None
    # fallback 2: delete the pointer (and its checksum sidecar) → the
    # physical listing finds ALL snapshots and day 4 merges against the
    # true latest (day 3, built on the doctored day-1 base → {1, 2});
    # the write rebuilds the pointer from the full listing
    ptr.unlink()
    crc = pathlib.Path(path) / "._snapshot_dts.json.crc"
    if crc.exists():
        crc.unlink()
    assert read_snapshot_dts(spark, path) is None
    build_dims_incremental(spark, cfg, "2019-10-04")
    d4 = spark.read.parquet(path).filter(F.col("dt") == "2019-10-04")
    assert {r["product_id"] for r in d4.collect()} == {1, 2}
    assert read_snapshot_dts(spark, path) == [
        "2019-10-01", "2019-10-02", "2019-10-03", "2019-10-04",
    ]


def test_compaction_updates_snapshot_pointer(spark, cfg, tmp_path):
    """compact_dim_snapshots keeps the pointer consistent with its
    physical partition drops."""
    from airflow_retail_etl_spark.pipeline import (
        build_dims_incremental,
        compact_dim_snapshots,
        read_snapshot_dts,
    )

    for d in ("2019-10-01", "2019-10-02"):
        build_dims_incremental(spark, cfg, d)
    res = compact_dim_snapshots(
        spark, cfg, "dim_user_scd", ["user_id", "user_session"],
        keep_last=1,
    )
    # fixture state is shared across tests — assert shape, not dates:
    # exactly one (the newest) snapshot survives and the pointer
    # mirrors the physical drops
    assert len(res["kept"]) == 1
    assert res["dropped"] and all(d < res["kept"][0] for d in res["dropped"])
    assert read_snapshot_dts(
        spark, f"{cfg.warehouse_root}/dim_user_scd"
    ) == res["kept"]


def test_stale_snapshot_pointer_self_heals(spark, cfg, tmp_path):
    """ADVICE r13: a snapshot partition removed EXTERNALLY (manual
    vacuum, out-of-band retention) leaves a stale pointer entry; the
    merge must not route at the nonexistent dt= partition — it
    validates the pick against the filesystem, relists, rewrites the
    pointer, and merges against the true latest survivor."""
    import dataclasses
    import pathlib
    import shutil

    from airflow_retail_etl_spark.pipeline import (
        build_dims_incremental,
        read_snapshot_dts,
    )

    # own warehouse: cfg is module-scoped and earlier tests leave
    # snapshots behind — this test asserts exact pointer contents
    cfg = dataclasses.replace(
        cfg, warehouse_root=str(tmp_path / "warehouse")
    )
    from airflow_retail_etl_spark.pipeline import ingest_day

    ingest_day(spark, cfg, "2019-10-01")
    ingest_day(spark, cfg, "2019-10-02")
    build_dims_incremental(spark, cfg, "2019-10-01")
    build_dims_incremental(spark, cfg, "2019-10-02")
    path = f"{cfg.warehouse_root}/dim_product_scd"
    # remove day 2 BEHIND the pointer's back (no compact_dim_snapshots)
    shutil.rmtree(pathlib.Path(path) / "dt=2019-10-02")
    assert read_snapshot_dts(spark, path) == ["2019-10-01", "2019-10-02"]
    # day 3 must fall back to day 1 (products {1, 2}) instead of
    # failing on the missing day-2 partition
    build_dims_incremental(spark, cfg, "2019-10-03")
    d3 = spark.read.parquet(path).filter(F.col("dt") == "2019-10-03")
    assert {r["product_id"] for r in d3.collect()} == {1, 2}
    # the heal rewrote the pointer from the physical listing + day 3
    assert read_snapshot_dts(spark, path) == ["2019-10-01", "2019-10-03"]
