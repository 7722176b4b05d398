"""Warehouse-path queries: the reference's staging cleanse, KPI views and
star-schema fact build, exercised end-to-end over the driver's ``events``
table (via the deterministic adapter) with full DuckDB oracles.

The oracle SQL reproduces the adapter + staging cleanse as CTEs so the
whole pipeline — projection, regex-guarded casts, case normalization,
dedup, dimension derivation with deterministic surrogate keys, star join,
measure math — is hash-checked, not just the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from _event_intelligence_data_warehouse_spark.contract import load, query
from _event_intelligence_data_warehouse_spark.functions.keys import (
    event_nk,
    price_avg_expr,
    price_to_eur,
    venue_nk,
)
from _event_intelligence_data_warehouse_spark.plans.staging import stage_events
from _event_intelligence_data_warehouse_spark.sources.events_adapter import (
    events_as_raw,
)


def _ic(expr: str) -> str:
    """DuckDB has no initcap; emulate Spark's exactly: lowercase, then
    uppercase the first character of each space-delimited word."""
    return (
        "array_to_string(list_transform(string_split(lower(" + expr + "), ' '), "
        "x -> upper(x[1]) || x[2:]), ' ')"
    )


# Adapter (events_adapter.events_as_raw) + staging cleanse
# (plans.staging.stage_events) as DuckDB CTEs. Any change there must be
# mirrored here — tools/check_oracle.py catches drift.
_STG_CTE = f"""
WITH raw AS (
    SELECT
        CAST(event_id AS VARCHAR)                          AS raw_event_id,
        CAST(event_id AS BIGINT)                           AS ingest_id,
        'stream'                                           AS source,
        'event ' || CAST(event_id AS VARCHAR)              AS event_name,
        strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')        AS event_date,
        strftime(CAST(ts AS TIMESTAMP), '%H:%M:%S')        AS event_time,
        'Venue ' || CAST(user_id % 7 AS VARCHAR)           AS venue_name,
        'city_' || CAST(user_id % 5 AS VARCHAR)            AS venue_city,
        'germany'                                          AS venue_country,
        '52.5200000'                                       AS venue_lat,
        '13.4050000'                                       AS venue_lon,
        event_type                                         AS category,
        'General'                                          AS subcategory,
        CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)      AS price_min,
        CAST(CAST(value AS DECIMAL(10,2))
             * CAST(1.5 AS DECIMAL(2,1)) AS VARCHAR)       AS price_max,
        'eur'                                              AS currency,
        'https://example.com/e/' || CAST(event_id AS VARCHAR) AS url,
        CASE WHEN event_type = 'purchase' THEN 'onsale'
             WHEN event_type = 'error' THEN 'cancelled'
             ELSE 'offsale' END                            AS status,
        CAST(ts AS TIMESTAMP)                              AS ingested_at
    FROM events
), stg AS (
    SELECT
        ingest_id, source, raw_event_id,
        {_ic("trim(event_name)")}                          AS event_name,
        CASE WHEN regexp_matches(trim(event_date), '^\\d{{4}}-\\d{{2}}-\\d{{2}}$')
             THEN CAST(trim(event_date) AS DATE) END       AS event_date,
        CASE WHEN regexp_matches(trim(event_time), '^\\d{{2}}:\\d{{2}}')
             THEN trim(event_time) END                     AS event_time,
        trim(venue_name)                                   AS venue_name,
        {_ic("trim(venue_city)")}                          AS venue_city,
        {_ic("trim(venue_country)")}                       AS venue_country,
        CAST(trim(venue_lat) AS DECIMAL(10,7))             AS venue_lat,
        CAST(trim(venue_lon) AS DECIMAL(10,7))             AS venue_lon,
        coalesce(nullif(trim(category), ''), 'Unknown')    AS category,
        coalesce(nullif(trim(subcategory), ''), 'General') AS subcategory,
        CASE WHEN regexp_matches(trim(price_min), '^\\d+(\\.\\d+)?$')
             THEN CAST(trim(price_min) AS DECIMAL(10,2)) END AS price_min,
        CASE WHEN regexp_matches(trim(price_max), '^\\d+(\\.\\d+)?$')
             THEN CAST(trim(price_max) AS DECIMAL(10,2)) END AS price_max,
        upper(trim(currency))                              AS currency,
        url,
        lower(trim(status))                                AS event_status,
        ingested_at
    FROM raw
)
"""


def _stg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stage_events(events_as_raw(load(spark, sf_dir, "events")))


# Per-row price midpoint (kpi_queries.sql averages fact_events.price_avg,
# the ROUND((min+max)/2, 2) measure from load_facts.sql:58-62) — the same
# cross-engine-exact formulation fact_build_star's oracle uses.
_PA_SQL = (
    "CASE WHEN price_min IS NOT NULL AND price_max IS NOT NULL "
    "THEN ROUND(CAST(price_min + price_max AS DECIMAL(20,2)) "
    "* CAST(0.5 AS DECIMAL(2,1)), 2) "
    "ELSE coalesce(price_min, price_max) END"
)

# COUNT(DISTINCT venue_sk) — venue_sk is 1:1 with venue_nk
# (load_facts.sql:82), so distinct-count the nk hash directly.
_VSK_SQL = "md5(coalesce(venue_name, '') || coalesce(venue_city, ''))"


def _pa():
    return price_avg_expr("price_min", "price_max")


# ---------------------------------------------------------------------------
# Flagship KPI (entry smoke): events by category
# (/root/reference/dashboard/kpi_queries.sql:11-26)
# ---------------------------------------------------------------------------

@query(
    "kpi_events_by_category",
    _STG_CTE
    + """
    SELECT category,
           COUNT(*) AS total_events,
           COUNT(*) FILTER (WHERE event_status = 'onsale') AS events_on_sale,
           CAST(SUM("""
    + _PA_SQL
    + """) AS DOUBLE) / COUNT("""
    + _PA_SQL
    + """)
               AS avg_ticket_price_eur,
           CAST(MIN(price_min) AS DOUBLE) AS cheapest_ticket_eur,
           CAST(MAX(price_max) AS DOUBLE) AS most_expensive_ticket
    FROM stg
    GROUP BY category
    """,
)
def kpi_events_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    stg = _stg(spark, sf_dir)
    return stg.groupBy("category").agg(
        F.count("*").alias("total_events"),
        F.count_if(F.col("event_status") == "onsale").alias("events_on_sale"),
        (F.sum(_pa()).cast("double") / F.count(_pa())).alias(
            "avg_ticket_price_eur"
        ),
        F.min("price_min").cast("double").alias("cheapest_ticket_eur"),
        F.max("price_max").cast("double").alias("most_expensive_ticket"),
    )


# ---------------------------------------------------------------------------
# Staging cleanse surface itself (P2-P10)
# ---------------------------------------------------------------------------

@query(
    "staging_cleanse",
    _STG_CTE
    + """
    SELECT raw_event_id, event_name, event_date, event_time,
           venue_name, venue_city, venue_country,
           CAST(venue_lat AS DOUBLE) AS venue_lat,
           CAST(venue_lon AS DOUBLE) AS venue_lon,
           category, subcategory,
           CAST(price_min AS DOUBLE) AS price_min,
           CAST(price_max AS DOUBLE) AS price_max,
           currency, event_status
    FROM stg
    """,
)
def staging_cleanse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full row-level cleanse (transform_events.sql:53-75): INITCAP /
    UPPER / LOWER / TRIM, regex-guarded date/time/decimal casts,
    default-filled categories — checked value-for-value."""
    stg = _stg(spark, sf_dir)
    return stg.select(
        "raw_event_id",
        "event_name",
        "event_date",
        "event_time",
        "venue_name",
        "venue_city",
        "venue_country",
        F.col("venue_lat").cast("double").alias("venue_lat"),
        F.col("venue_lon").cast("double").alias("venue_lon"),
        "category",
        "subcategory",
        F.col("price_min").cast("double").alias("price_min"),
        F.col("price_max").cast("double").alias("price_max"),
        "currency",
        "event_status",
    )


# ---------------------------------------------------------------------------
# KPI 2: events by city (kpi_queries.sql:32-46)
# ---------------------------------------------------------------------------

@query(
    "kpi_events_by_city",
    _STG_CTE
    + """
    SELECT venue_city, venue_country,
           COUNT(*) AS total_events,
           COUNT(DISTINCT """
    + _VSK_SQL
    + """) AS unique_venues,
           CAST(SUM("""
    + _PA_SQL
    + """) AS DOUBLE) / COUNT("""
    + _PA_SQL
    + """) AS avg_price_eur,
           COUNT(*) FILTER (WHERE event_status = 'cancelled')
               AS cancelled_events
    FROM stg
    GROUP BY venue_city, venue_country
    """,
)
def kpi_events_by_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    stg = _stg(spark, sf_dir)
    return stg.groupBy("venue_city", "venue_country").agg(
        F.count("*").alias("total_events"),
        F.countDistinct(venue_nk("venue_name", "venue_city")).alias(
            "unique_venues"
        ),
        (F.sum(_pa()).cast("double") / F.count(_pa())).alias("avg_price_eur"),
        F.count_if(F.col("event_status") == "cancelled").alias("cancelled_events"),
    )


# ---------------------------------------------------------------------------
# KPI 3: monthly trend (kpi_queries.sql:52-67)
# ---------------------------------------------------------------------------

@query(
    "kpi_monthly_trend",
    _STG_CTE
    + """
    SELECT CAST(year(event_date) AS BIGINT) AS year,
           CAST(month(event_date) AS BIGINT) AS month_number,
           monthname(event_date) AS month_name,
           COUNT(*) AS total_events,
           COUNT(*) FILTER (WHERE event_status = 'onsale') AS active_events,
           CAST(SUM("""
    + _PA_SQL
    + """) AS DOUBLE) / COUNT("""
    + _PA_SQL
    + """) AS avg_price_eur,
           COUNT(DISTINCT """
    + _VSK_SQL
    + """) AS unique_venues
    FROM stg
    WHERE event_date IS NOT NULL
    GROUP BY 1, 2, 3
    """,
)
def kpi_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    stg = _stg(spark, sf_dir).filter(F.col("event_date").isNotNull())
    return stg.groupBy(
        F.year("event_date").cast("long").alias("year"),
        F.month("event_date").cast("long").alias("month_number"),
        F.date_format("event_date", "MMMM").alias("month_name"),
    ).agg(
        F.count("*").alias("total_events"),
        F.count_if(F.col("event_status") == "onsale").alias("active_events"),
        (F.sum(_pa()).cast("double") / F.count(_pa())).alias("avg_price_eur"),
        F.countDistinct(venue_nk("venue_name", "venue_city")).alias(
            "unique_venues"
        ),
    )


# ---------------------------------------------------------------------------
# KPI 4: weekend vs weekday with pct-of-total (kpi_queries.sql:73-83)
# ---------------------------------------------------------------------------

@query(
    "kpi_weekend_vs_weekday",
    _STG_CTE
    + """
    SELECT CASE WHEN dayofweek(event_date) IN (0, 6)
                THEN 'Weekend' ELSE 'Weekday' END AS day_type,
           COUNT(*) AS total_events,
           CAST(SUM("""
    + _PA_SQL
    + """) AS DOUBLE) / COUNT("""
    + _PA_SQL
    + """) AS avg_price_eur,
           100.0 * COUNT(*) / SUM(COUNT(*)) OVER () AS pct_of_total
    FROM stg
    WHERE event_date IS NOT NULL
    GROUP BY 1
    """,
)
def kpi_weekend_vs_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    stg = _stg(spark, sf_dir).filter(F.col("event_date").isNotNull())
    day_type = F.when(
        F.dayofweek("event_date").isin(1, 7), "Weekend"
    ).otherwise("Weekday")
    agg = stg.groupBy(day_type.alias("day_type")).agg(
        F.count("*").alias("total_events"),
        (F.sum(_pa()).cast("double") / F.count(_pa())).alias("avg_price_eur"),
    )
    w = Window.partitionBy()
    return agg.withColumn(
        "pct_of_total",
        F.lit(100.0) * F.col("total_events") / F.sum("total_events").over(w),
    )


# ---------------------------------------------------------------------------
# The star-schema fact build (load_facts.sql:12-98 end-to-end)
# ---------------------------------------------------------------------------

_FACT_CTE = (
    _STG_CTE
    + """
, dedup AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY source, raw_event_id
            ORDER BY ingested_at DESC, ingest_id DESC) AS _rn
        FROM stg
    ) WHERE _rn = 1
), dim_date AS (
    SELECT row_number() OVER (ORDER BY full_date) AS date_id, full_date
    FROM (SELECT DISTINCT event_date AS full_date FROM dedup
          WHERE event_date IS NOT NULL)
), venue_src AS (
    SELECT md5(coalesce(venue_name, '') || coalesce(venue_city, ''))
               AS venue_nk,
           venue_name, venue_city,
           row_number() OVER (
               PARTITION BY md5(coalesce(venue_name, '')
                               || coalesce(venue_city, ''))
               ORDER BY venue_name, venue_city) AS _vrn
    FROM (SELECT DISTINCT venue_name, venue_city FROM dedup)
), dim_venue AS (
    SELECT row_number() OVER (ORDER BY venue_nk) AS venue_sk, venue_nk
    FROM venue_src WHERE _vrn = 1
), dim_category AS (
    SELECT row_number() OVER (ORDER BY category, subcategory) AS category_sk,
           category, subcategory
    FROM (SELECT DISTINCT category, subcategory FROM dedup)
), dim_source AS (
    SELECT row_number() OVER (ORDER BY source) AS source_sk, source
    FROM (SELECT DISTINCT source FROM dedup)
)
"""
)


@query(
    "fact_build_star",
    _FACT_CTE
    + """
    SELECT d.source || '_' || d.raw_event_id AS event_nk,
           dd.date_id, dv.venue_sk, dc.category_sk, ds.source_sk,
           d.event_name, d.url AS event_url, d.event_status,
           CAST(d.price_min AS DOUBLE) AS price_min,
           CAST(d.price_max AS DOUBLE) AS price_max,
           CAST(CASE WHEN d.price_min IS NOT NULL AND d.price_max IS NOT NULL
                THEN ROUND(CAST(d.price_min + d.price_max AS DECIMAL(20,2))
                           * CAST(0.5 AS DECIMAL(2,1)), 2)
                ELSE coalesce(d.price_min, d.price_max) END AS DOUBLE)
               AS price_avg,
           d.currency,
           CAST(CASE d.currency
                WHEN 'EUR' THEN d.price_min
                WHEN 'USD' THEN ROUND(d.price_min * CAST(0.92 AS DECIMAL(3,2)), 2)
                WHEN 'GBP' THEN ROUND(d.price_min * CAST(1.17 AS DECIMAL(3,2)), 2)
                ELSE d.price_min END AS DOUBLE) AS price_min_eur
    FROM dedup d
    LEFT JOIN dim_date dd ON d.event_date = dd.full_date
    LEFT JOIN dim_venue dv
        ON md5(coalesce(d.venue_name, '') || coalesce(d.venue_city, ''))
           = dv.venue_nk
    LEFT JOIN dim_category dc
        ON d.category = dc.category AND d.subcategory = dc.subcategory
    LEFT JOIN dim_source ds ON d.source = ds.source
    """,
)
def fact_build_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole fact load as one logical plan: batch dedup (U2), four
    deterministic dimension derivations (U1/U6), expression-key star join
    (J1-J4), measures (F1/F2/F5/F6). Dims are broadcast — the only
    shuffles are the dedup window and the dim distincts (tiny)."""
    stg = _stg(spark, sf_dir)

    w = Window.partitionBy("source", "raw_event_id").orderBy(
        F.desc("ingested_at"), F.desc("ingest_id")
    )
    # No persist here: the five consumers (four dim derivations + the fact
    # side) all hang off the same (source, raw_event_id) window exchange,
    # which AQE de-duplicates via ReusedExchange — measured faster than
    # caching the staged batch.
    dedup = stg.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )

    dim_date = (
        dedup.filter(F.col("event_date").isNotNull())
        .select(F.col("event_date").alias("full_date"))
        .distinct()
        .withColumn(
            "date_id",
            F.row_number().over(Window.orderBy("full_date")).cast("long"),
        )
    )
    venue_w = Window.partitionBy("venue_nk").orderBy("venue_name", "venue_city")
    dim_venue = (
        dedup.select("venue_name", "venue_city")
        .distinct()
        .withColumn("venue_nk", venue_nk("venue_name", "venue_city"))
        .withColumn("_vrn", F.row_number().over(venue_w))
        .filter(F.col("_vrn") == 1)
        .withColumn(
            "venue_sk",
            F.row_number().over(Window.orderBy("venue_nk")).cast("long"),
        )
        .select("venue_sk", "venue_nk")
    )
    dim_category = (
        dedup.select("category", "subcategory")
        .distinct()
        .withColumn(
            "category_sk",
            F.row_number()
            .over(Window.orderBy("category", "subcategory"))
            .cast("long"),
        )
    )
    dim_source = (
        dedup.select("source")
        .distinct()
        .withColumn(
            "source_sk",
            F.row_number().over(Window.orderBy("source")).cast("long"),
        )
    )

    d = dedup.withColumn("_venue_nk", venue_nk("venue_name", "venue_city"))
    return (
        d.join(F.broadcast(dim_date), d.event_date == dim_date.full_date, "left")
        .join(F.broadcast(dim_venue), d._venue_nk == dim_venue.venue_nk, "left")
        .join(F.broadcast(dim_category), ["category", "subcategory"], "left")
        .join(F.broadcast(dim_source), ["source"], "left")
        .select(
            event_nk("source", "raw_event_id").alias("event_nk"),
            F.col("date_id").cast("long").alias("date_id"),
            F.col("venue_sk").cast("long").alias("venue_sk"),
            F.col("category_sk").cast("long").alias("category_sk"),
            F.col("source_sk").cast("long").alias("source_sk"),
            "event_name",
            F.col("url").alias("event_url"),
            "event_status",
            F.col("price_min").cast("double").alias("price_min"),
            F.col("price_max").cast("double").alias("price_max"),
            price_avg_expr("price_min", "price_max")
            .cast("double")
            .alias("price_avg"),
            "currency",
            price_to_eur("price_min", "currency")
            .cast("double")
            .alias("price_min_eur"),
        )
    )
