"""Dimension builds (SURVEY.md §2.5 U1/U3/U5/U6, §2.3 D1-D6).

Each ``update_dim_*`` takes the staged batch plus the existing dimension
image and returns the new image; storage writes it via atomic swap. All
surrogate keys are deterministic (row_number over the natural key,
continuing from the existing max) — reproducibility is a correctness
feature here, not a nicety.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.functions.datetime_fns import (
    is_weekend,
    pg_day_number,
    weekday_name,
)
from _event_intelligence_data_warehouse_spark.functions.keys import (
    source_type_expr,
    venue_nk,
)
from _event_intelligence_data_warehouse_spark.operators.scd2 import scd2_apply
from _event_intelligence_data_warehouse_spark.operators.upsert import (
    assign_surrogate_keys,
    dedup_keys,
    insert_if_absent,
)


def date_attributes(full_date: Column) -> list[Column]:
    """dim_date attribute expressions (transform_events.sql:81-97),
    Postgres conventions preserved (DOW 0=Sunday, ISO week, trimmed
    names)."""
    d = full_date
    return [
        weekday_name(d).alias("day_of_week"),
        pg_day_number(d).alias("day_number"),
        F.weekofyear(d).cast("smallint").alias("week_number"),
        F.month(d).cast("smallint").alias("month_number"),
        F.date_format(d, "MMMM").alias("month_name"),
        F.quarter(d).cast("smallint").alias("quarter"),
        F.year(d).cast("smallint").alias("year"),
        is_weekend(d).alias("is_weekend"),
        F.lit(False).alias("is_holiday"),
    ]


def update_dim_date(existing: DataFrame, stg: DataFrame) -> DataFrame:
    """Insert-if-absent of the batch's distinct dates
    (transform_events.sql:81-97)."""
    dates = (
        stg.filter(F.col("event_date").isNotNull())
        .select(F.col("event_date").alias("full_date"))
        .distinct()
    )
    new = insert_if_absent(existing.select("full_date"), dates, ["full_date"])
    new = new.select(F.col("full_date"), *date_attributes(F.col("full_date")))
    new = assign_surrogate_keys(
        existing, new, "date_id", ["full_date"], bulk=False
    )
    return existing.unionByName(new.select(existing.columns))


def update_dim_category(
    existing: DataFrame, stg: DataFrame, now: Column
) -> DataFrame:
    """UNIQUE(category_name, subcategory) insert-if-absent
    (transform_events.sql:118-124)."""
    cats = (
        stg.select(
            F.col("category").alias("category_name"), F.col("subcategory")
        )
        .distinct()
    )
    new = insert_if_absent(existing, cats, ["category_name", "subcategory"])
    new = (
        new.withColumn("segment", F.lit(None).cast("string"))
        .withColumn("created_at", now)
    )
    # bulk=False: distinct dimension slices are dimension-cardinality
    # by construction; skip the auto-probe count job
    new = assign_surrogate_keys(
        existing, new, "category_sk", ["category_name", "subcategory"],
        bulk=False,
    )
    return existing.unionByName(new.select(existing.columns))


def update_dim_source(existing: DataFrame, stg: DataFrame, now: Column) -> DataFrame:
    """UNIQUE(source_name) insert-if-absent with type mapping
    (transform_events.sql:127-138)."""
    srcs = stg.select(F.col("source").alias("source_name")).distinct()
    new = insert_if_absent(existing, srcs, ["source_name"])
    new = (
        new.withColumn("source_type", source_type_expr("source_name"))
        .withColumn("created_at", now)
    )
    new = assign_surrogate_keys(
        existing, new, "source_sk", ["source_name"], bulk=False
    )
    return existing.unionByName(new.select(existing.columns))


VENUE_ATTRS = ["venue_name", "city", "country", "latitude", "longitude"]


def update_dim_venue(existing: DataFrame, stg: DataFrame, now: Column) -> DataFrame:
    """Real SCD2 on venue (U5): close + version on attribute change.
    Incoming = one row per venue_nk, deterministic tie-break (the
    reference's DISTINCT ON is order-undefined — transform_events.sql:106)."""
    incoming = (
        stg.select(
            venue_nk("venue_name", "venue_city").alias("venue_nk"),
            F.col("venue_name"),
            F.col("venue_city").alias("city"),
            F.col("venue_country").alias("country"),
            F.col("venue_lat").alias("latitude"),
            F.col("venue_lon").alias("longitude"),
        )
        .withColumn("_pos", F.struct("venue_name", "city"))
    )
    incoming = dedup_keys(
        incoming, ["venue_nk"], [F.asc_nulls_last("_pos")]
    ).drop("_pos")
    return scd2_apply(
        existing,
        incoming,
        nk="venue_nk",
        attrs=VENUE_ATTRS,
        sk_col="venue_sk",
        effective_ts=now,
        order_by=["venue_nk"],
        defaults={"created_at": now},
    )
