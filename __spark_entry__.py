"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship daily-KPI query at sf0.001.
``queries()`` maps every implemented SURVEY §2 operator (plus the §7.4
extension operators) to a ``(spark, sf_dir) -> DataFrame`` callable;
``oracle_sql()`` carries the DuckDB-equivalent ANSI SQL for each.

Numeric determinism: every money aggregate accumulates per-row-rounded
DECIMAL(18,2) and casts back to double (see functions.columns.money_sum), and
every average is derived as exact-sum / count, so Spark and DuckDB produce
bit-identical doubles independent of partitioning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_retail_etl_spark import adapters
from airflow_retail_etl_spark.adapters import FUNNEL_TYPES, PRODUCT_KEY_REGEX
from airflow_retail_etl_spark.functions.columns import money_sum, split_hierarchy
from airflow_retail_etl_spark.operators import marts, star
from airflow_retail_etl_spark.session import configure
from airflow_retail_etl_spark.sources.tables import load_table

VIEW, CART, PURCHASE = FUNNEL_TYPES

# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------


def q_staging_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 scan + P1 projection + P4 imputation + P5/P11 derived columns."""
    return adapters.staging_events(spark, sf_dir)


def q_fact_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: 4-key rollup with conditional revenue (P9)."""
    return star.fact_rollup(
        adapters.staging_events(spark, sf_dir), purchase_value=PURCHASE
    )


def q_dim_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: multi-column DISTINCT + P3 null-key filter."""
    return star.build_dim(
        adapters.staging_events(spark, sf_dir),
        ["user_id", "user_session"],
        not_null=["user_id"],
    )


def q_dim_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 distinct + D3 deterministic keep-first dedup + P6 category split."""
    src = adapters.product_dim_source(spark, sf_dir)
    dim = star.build_dim(
        src,
        ["product_id", "brand", "category_code", "price"],
        not_null=["product_id"],
    )
    dim = star.dedup_keep_first(
        dim, ["product_id"], ["brand", "category_code", "price"]
    )
    cat, sub1, sub2 = split_hierarchy(F.col("category_code"), sep=" ")
    return dim.select(
        "product_id",
        "brand",
        "category_code",
        "price",
        cat.alias("category"),
        sub1.alias("sub_category1"),
        sub2.alias("sub_category2"),
    )


def q_dim_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 date sequence + P7 date parts, bounded by the observed event dates."""
    ev = adapters.staging_events(spark, sf_dir)
    bounds = ev.agg(
        F.min("event_date").alias("d0"), F.max("event_date").alias("d1")
    )
    cal = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("date")
    )
    return star.with_date_parts(cal, "date")


def q_daily_revenue_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 daily KPIs + P8 funnel ratios (flagship)."""
    return marts.daily_revenue_summary(
        adapters.staging_events(spark, sf_dir),
        view_value=VIEW,
        cart_value=CART,
        purchase_value=PURCHASE,
    )


def q_daily_funnel_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 funnel over the star join J1 (broadcast dimension)."""
    return marts.funnel_by_dim(
        adapters.staging_events(spark, sf_dir),
        adapters.product_dim_source(spark, sf_dir).select(
            "product_id", "brand", "category_code"
        ),
        view_value=VIEW,
        cart_value=CART,
        purchase_value=PURCHASE,
    )


def q_top_brands_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 top-k by measure, deterministic tiebreak."""
    ev = adapters.staging_events(spark, sf_dir)
    dim = adapters.product_dim_source(spark, sf_dir).select(
        "product_id", "brand"
    )
    revenue = (
        ev.join(F.broadcast(dim), "product_id")
        .groupBy("brand")
        .agg(
            money_sum(
                F.col("price"), F.col("event_type") == PURCHASE
            ).alias("revenue")
        )
    )
    return marts.top_k(revenue, "revenue", 10, tiebreak=["brand"])


def q_events_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/P10/P11/O2: membership filter + daily type counts + global sort."""
    ev = load_table(spark, sf_dir, "events")
    return marts.events_summary(
        ev, ts_col="ts", type_col="event_type", allowed_types=FUNNEL_TYPES
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing rollup on lineitem (headline bench query)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("2024-12-01").cast("timestamp_ntz")
    )
    # All money arithmetic in DECIMAL: the inputs are exact 2-dp values, so
    # cast→multiply→sum is exact and engine-independent. Rounding double
    # products per-row would diverge between engines at half-way boundaries.
    e_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    one_minus_d = (F.lit(1.0) - F.col("l_discount")).cast("decimal(3,2)")
    one_plus_t = (F.lit(1.0) + F.col("l_tax")).cast("decimal(3,2)")
    disc_price = e_dec * one_minus_d  # decimal(22,4), exact
    charge = disc_price * one_plus_t  # decimal(26,6), exact
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.sum(F.round(F.col("l_discount"), 4).cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_disc"),
        F.count("*").alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
        (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
        (F.col("sum_disc") / F.col("count_order")).alias("avg_disc"),
        "count_order",
    )


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure(spark)
    return q_daily_revenue_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "staging_clean": q_staging_clean,
        "fact_rollup": q_fact_rollup,
        "dim_user": q_dim_user,
        "dim_product": q_dim_product,
        "dim_date": q_dim_date,
        "daily_revenue_summary": q_daily_revenue_summary,
        "daily_funnel_by_brand": q_daily_funnel_by_brand,
        "top_brands_by_revenue": q_top_brands_by_revenue,
        "events_summary": q_events_summary,
        "pricing_summary": q_pricing_summary,
    }


_PRODUCT_ID_SQL = (
    "TRY_CAST(regexp_extract(props, '\"k\": (\\d+)', 1) AS BIGINT)"
)

_STAGING_CTE = f"""
WITH staging AS (
    SELECT event_id,
           CAST(ts AS TIMESTAMP)                    AS event_time,
           user_id,
           COALESCE(event_type, 'unknown')          AS event_type,
           value                                    AS price,
           COALESCE(props, '{{}}')                  AS user_session,
           {_PRODUCT_ID_SQL}                        AS product_id,
           CAST(ts AS DATE)                         AS event_date
    FROM events
)
"""


def _money(expr: str, pred: str | None = None) -> str:
    cent = f"CAST(ROUND({expr}, 2) AS DECIMAL(18,2))"
    if pred:
        cent = f"CASE WHEN {pred} THEN {cent} ELSE CAST(0 AS DECIMAL(18,2)) END"
    return f"CAST(SUM({cent}) AS DOUBLE)"


def oracle_sql() -> dict[str, str]:
    return {
        "staging_clean": _STAGING_CTE + "SELECT * FROM staging",
        "fact_rollup": _STAGING_CTE
        + f"""
        SELECT event_date, event_type, product_id, user_id,
               CAST(COUNT(*) AS BIGINT) AS total_events,
               {_money('price', f"event_type = '{PURCHASE}'")} AS total_revenue
        FROM staging
        GROUP BY 1, 2, 3, 4
        """,
        "dim_user": _STAGING_CTE
        + """
        SELECT DISTINCT user_id, user_session
        FROM staging WHERE user_id IS NOT NULL
        """,
        "dim_product": """
        WITH d AS (
            SELECT DISTINCT p_partkey AS product_id, p_brand AS brand,
                            p_type AS category_code, p_retailprice AS price
            FROM part WHERE p_partkey IS NOT NULL
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY product_id
                ORDER BY brand, category_code, price) AS rn
            FROM d
        )
        SELECT product_id, brand, category_code, price,
               COALESCE(string_split(category_code, ' ')[1], 'na') AS category,
               COALESCE(string_split(category_code, ' ')[2], 'na') AS sub_category1,
               COALESCE(string_split(category_code, ' ')[3], 'na') AS sub_category2
        FROM r WHERE rn = 1
        """,
        "dim_date": """
        WITH b AS (
            SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
            FROM events
        ), cal AS (
            SELECT CAST(UNNEST(generate_series(
                CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                INTERVAL 1 DAY)) AS DATE) AS date
            FROM b
        )
        SELECT date,
               CAST(day(date) AS INTEGER)       AS day,
               CAST(month(date) AS INTEGER)     AS month,
               CAST(year(date) AS INTEGER)      AS year,
               CAST(isodow(date) - 1 AS INTEGER) AS weekday,
               CAST(weekofyear(date) AS INTEGER) AS week
        FROM cal
        """,
        "daily_revenue_summary": _STAGING_CTE
        + f"""
        SELECT event_date,
               {_money('price', f"event_type = '{PURCHASE}'")} AS revenue,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS unique_users,
               CAST(COUNT(*) FILTER (WHERE event_type = '{PURCHASE}') AS BIGINT) AS purchases,
               CAST(COUNT(*) FILTER (WHERE event_type = '{CART}') AS BIGINT) AS carts,
               CAST(COUNT(*) FILTER (WHERE event_type = '{VIEW}') AS BIGINT) AS views,
               CAST(COUNT(*) FILTER (WHERE event_type = '{CART}') AS DOUBLE)
                   / NULLIF(COUNT(*) FILTER (WHERE event_type = '{VIEW}'), 0) AS cart_rate,
               CAST(COUNT(*) FILTER (WHERE event_type = '{PURCHASE}') AS DOUBLE)
                   / NULLIF(COUNT(*) FILTER (WHERE event_type = '{VIEW}'), 0) AS purchase_rate
        FROM staging
        GROUP BY 1
        """,
        "daily_funnel_by_brand": _STAGING_CTE
        + f"""
        , joined AS (
            SELECT s.event_date, s.event_type, s.price,
                   p.p_brand AS brand, p.p_type AS category_code
            FROM staging s JOIN part p ON s.product_id = p.p_partkey
        )
        SELECT event_date, brand, category_code,
               CAST(COUNT(*) FILTER (WHERE event_type = '{VIEW}') AS BIGINT) AS views,
               CAST(COUNT(*) FILTER (WHERE event_type = '{CART}') AS BIGINT) AS carts,
               CAST(COUNT(*) FILTER (WHERE event_type = '{PURCHASE}') AS BIGINT) AS purchases,
               {_money('price', f"event_type = '{PURCHASE}'")} AS revenue
        FROM joined
        GROUP BY 1, 2, 3
        """,
        "top_brands_by_revenue": _STAGING_CTE
        + f"""
        , joined AS (
            SELECT s.event_type, s.price, p.p_brand AS brand
            FROM staging s JOIN part p ON s.product_id = p.p_partkey
        )
        SELECT brand,
               {_money('price', f"event_type = '{PURCHASE}'")} AS revenue
        FROM joined
        GROUP BY 1
        ORDER BY revenue DESC, brand ASC
        LIMIT 10
        """,
        "events_summary": f"""
        SELECT CAST(ts AS DATE) AS event_date, event_type,
               CAST(COUNT(*) AS BIGINT) AS event_count
        FROM events
        WHERE event_type IN ('{VIEW}', '{CART}', '{PURCHASE}')
          AND ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
        ORDER BY 1, 2
        """,
        "pricing_summary": f"""
        WITH agg AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   {_money('l_extendedprice')} AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(3,2))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * CAST(1 - l_discount AS DECIMAL(3,2))
                            * CAST(1 + l_tax AS DECIMAL(3,2))) AS DOUBLE) AS sum_charge,
                   CAST(SUM(CAST(ROUND(l_discount, 4) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '2024-12-01'
            GROUP BY 1, 2
        )
        SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
               sum_disc_price, sum_charge,
               sum_qty / count_order AS avg_qty,
               sum_base_price / count_order AS avg_price,
               sum_disc / count_order AS avg_disc,
               count_order
        FROM agg
        """,
    }
