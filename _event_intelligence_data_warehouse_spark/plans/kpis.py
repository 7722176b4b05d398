"""The six reporting KPI views (/root/reference/dashboard/kpi_queries.sql),
each a DataFrame-returning function over the gold tables; column aliases
are the public API and match the reference exactly (SURVEY.md §2.10 V2).

All dims broadcast into the fact scan; every view is a single agg after a
broadcast join, so at 100 TB each KPI is one shuffle (the group-by).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from _event_intelligence_data_warehouse_spark.functions.datetime_fns import (
    epoch_seconds_between,
)

def _active():
    return ~F.col("is_deleted")


def kpi_events_by_category(fact: DataFrame, dim_category: DataFrame) -> DataFrame:
    """kpi_queries.sql:11-26: COUNT(event_sk), onsale filter-count,
    ROUND(AVG(price_avg),2), ROUND(MIN(price_min_eur),2),
    ROUND(MAX(price_max),2)."""
    return (
        fact.filter(_active())
        .join(F.broadcast(dim_category), "category_sk")
        .groupBy("category_name", "subcategory")
        .agg(
            F.count("*").alias("total_events"),
            F.count_if(F.col("event_status") == "onsale").alias("events_on_sale"),
            F.round(F.avg("price_avg"), 2).alias("avg_ticket_price_eur"),
            F.round(F.min("price_min_eur"), 2).alias("cheapest_ticket_eur"),
            F.round(F.max("price_max"), 2).alias("most_expensive_ticket"),
        )
        .orderBy(F.desc("total_events"))
    )


def kpi_events_by_city(fact: DataFrame, dim_venue: DataFrame) -> DataFrame:
    """kpi_queries.sql:32-46."""
    return (
        fact.filter(_active())
        .join(F.broadcast(dim_venue), "venue_sk")
        .groupBy("city", "country")
        .agg(
            F.count("*").alias("total_events"),
            F.countDistinct("venue_sk").alias("unique_venues"),
            F.round(F.avg("price_avg"), 2).alias("avg_price_eur"),
            F.count_if(F.col("event_status") == "cancelled").alias(
                "cancelled_events"
            ),
        )
        .orderBy(F.desc("total_events"))
    )


def kpi_monthly_trend(fact: DataFrame, dim_date: DataFrame) -> DataFrame:
    """kpi_queries.sql:52-67."""
    return (
        fact.filter(_active())
        .join(F.broadcast(dim_date), "date_id")
        .groupBy("year", "month_number", "month_name")
        .agg(
            F.count("*").alias("total_events"),
            F.count_if(F.col("event_status") == "onsale").alias("active_events"),
            F.round(F.avg("price_avg"), 2).alias("avg_price_eur"),
            F.countDistinct("venue_sk").alias("unique_venues"),
        )
        .orderBy("year", "month_number")
    )


def kpi_weekend_vs_weekday(fact: DataFrame, dim_date: DataFrame) -> DataFrame:
    """kpi_queries.sql:73-83."""
    agg = (
        fact.filter(_active())
        .join(F.broadcast(dim_date), "date_id")
        .groupBy(
            F.when(F.col("is_weekend"), "Weekend")
            .otherwise("Weekday")
            .alias("day_type")
        )
        .agg(
            F.count("*").alias("total_events"),
            F.round(F.avg("price_avg"), 2).alias("avg_price_eur"),
        )
    )
    w = Window.partitionBy()
    return agg.withColumn(
        "pct_of_total",
        F.round(
            (F.lit(100.0) * F.col("total_events"))
            .cast("decimal(18,4)")
            / F.sum("total_events").over(w),
            1,
        ).cast("double"),
    )


def kpi_pipeline_health(ingestion_runs: DataFrame) -> DataFrame:
    """kpi_queries.sql:89-102 over the *latest state per run*
    (sources.bronze.current_runs)."""
    return (
        ingestion_runs.groupBy(
            F.to_date("started_at").alias("run_date"), F.col("source")
        )
        .agg(
            F.count("*").alias("total_runs"),
            F.count_if(F.col("status") == "success").alias("successful_runs"),
            F.count_if(F.col("status") == "failed").alias("failed_runs"),
            F.sum("records_loaded").alias("total_records_loaded"),
            F.round(
                F.avg(
                    epoch_seconds_between("started_at", "finished_at")
                ),
                1,
            ).alias("avg_duration_seconds"),
        )
        .orderBy(F.desc("run_date"), "source")
    )


def kpi_data_quality(quality_log: DataFrame) -> DataFrame:
    """kpi_queries.sql:108-118."""
    return (
        quality_log.groupBy("check_name", "table_name")
        .agg(
            F.round(F.avg("pass_rate"), 2).alias("avg_pass_rate"),
            F.count_if(F.col("status") == "failed").alias("times_failed"),
            F.count_if(F.col("status") == "warning").alias("times_warned"),
            F.max("checked_at").alias("last_checked"),
        )
        .orderBy("avg_pass_rate")
    )


def register_views(spark, tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Build all six KPI DataFrames and register them as temp views
    (the Spark analog of CREATE OR REPLACE VIEW reporting.kpi_*)."""
    views = {
        "kpi_events_by_category": kpi_events_by_category(
            tables["fact_events"], tables["dim_category"]
        ),
        "kpi_events_by_city": kpi_events_by_city(
            tables["fact_events"], tables["dim_venue"]
        ),
        "kpi_monthly_trend": kpi_monthly_trend(
            tables["fact_events"], tables["dim_date"]
        ),
        "kpi_weekend_vs_weekday": kpi_weekend_vs_weekday(
            tables["fact_events"], tables["dim_date"]
        ),
        "kpi_pipeline_health": kpi_pipeline_health(tables["ingestion_runs"]),
        "kpi_data_quality": kpi_data_quality(tables["quality_log"]),
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return views
