"""Adapter: the driver's generic ``events`` stream table -> the raw-events
landing contract, so the full warehouse DAG (cleanse -> dims -> facts ->
KPIs) can be exercised and oracle-checked on deterministic driver data.

Mapping is pure column algebra (no UDFs): event_type becomes the category,
the event value becomes a price band, a synthetic venue is derived from the
user id. Everything is deterministic so the DuckDB oracle can reproduce it.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_as_raw(events: DataFrame) -> DataFrame:
    """Driver ``events(event_id, ts, user_id, event_type, value, props)`` ->
    CSV-contract + landing metadata (strings where bronze lands strings)."""
    e = events
    status = (
        F.when(F.col("event_type") == "purchase", F.lit("onsale"))
        .when(F.col("event_type") == "error", F.lit("cancelled"))
        .otherwise(F.lit("offsale"))
    )
    return e.select(
        F.col("event_id").cast("long").alias("ingest_id"),
        F.lit("stream").alias("source"),
        F.col("event_id").cast("string").alias("raw_event_id"),
        F.col("props").alias("raw_payload"),
        F.concat(F.lit("event "), F.col("event_id").cast("string")).alias("event_name"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.date_format("ts", "HH:mm:ss").alias("event_time"),
        F.concat(F.lit("Venue "), (F.col("user_id") % 7).cast("string")).alias(
            "venue_name"
        ),
        F.concat(F.lit("city_"), (F.col("user_id") % 5).cast("string")).alias(
            "venue_city"
        ),
        F.lit("germany").alias("venue_country"),
        F.lit("52.5200000").alias("venue_lat"),
        F.lit("13.4050000").alias("venue_lon"),
        F.col("event_type").alias("category"),
        F.lit("General").alias("subcategory"),
        # All price math stays in the decimal domain: `value` is an exact
        # 2-decimal double, and decimal x decimal is exact on both engines,
        # so the DuckDB oracle reproduces these strings bit-for-bit (a
        # double-domain *1.5 would tie-break differently across engines).
        F.col("value").cast("decimal(10,2)").cast("string").alias("price_min"),
        (F.col("value").cast("decimal(10,2)") * F.lit(Decimal("1.5")))
        .cast("string")
        .alias("price_max"),
        F.lit("eur").alias("currency"),
        F.concat(F.lit("https://example.com/e/"), F.col("event_id").cast("string")).alias(
            "url"
        ),
        status.alias("status"),
        F.col("ts").alias("ingested_at"),
        F.lit(False).alias("is_processed"),
        F.lit(None).cast("string").alias("process_error"),
    )
