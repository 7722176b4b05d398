"""Fact load: batch dedup -> star join -> merge upsert
(/root/reference/warehouse/load_facts.sql re-expressed; SURVEY.md §2.5-2.6).

One fact-load path with key ``source || '_' || raw_event_id`` — the
reference has two conflicting key formulas (SURVEY.md §0.2); the loader's
is canonical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.functions.keys import (
    event_nk,
    price_avg_expr,
    price_to_eur,
    venue_nk,
)
from _event_intelligence_data_warehouse_spark.operators.upsert import (
    assign_surrogate_keys,
    dedup_keys,
    merge_upsert,
)


def build_fact_rows(
    stg: DataFrame,
    dim_date: DataFrame,
    dim_venue: DataFrame,
    dim_category: DataFrame,
    dim_source: DataFrame,
    *,
    loaded_at: Column,
) -> DataFrame:
    """Deduped staging batch -> fact rows with resolved dimension keys.

    Joins (load_facts.sql:75-90): all LEFT on equi-keys; the venue join is
    on the md5 expression key with the ``is_current`` residual (J2). Dims
    are broadcast — at 100 TB the fact side streams and no shuffle occurs
    on the fact table at all for this stage.
    """
    batch = dedup_keys(
        stg,
        ["source", "raw_event_id"],
        [F.desc("ingested_at"), F.desc("ingest_id")],
    ).withColumn("_venue_nk", venue_nk("venue_name", "venue_city"))

    dd = F.broadcast(dim_date.select("date_id", "full_date"))
    dv = F.broadcast(
        dim_venue.filter(F.col("is_current")).select("venue_sk", "venue_nk")
    )
    dc = F.broadcast(
        dim_category.select(
            "category_sk", F.col("category_name"), F.col("subcategory").alias(
                "_subcat"
            )
        )
    )
    ds = F.broadcast(dim_source.select("source_sk", "source_name"))

    joined = (
        batch.join(dd, batch.event_date == dd.full_date, "left")
        .join(dv, batch._venue_nk == dv.venue_nk, "left")
        .join(
            dc,
            (batch.category == dc.category_name)
            & (batch.subcategory == dc._subcat),
            "left",
        )
        .join(ds, batch.source == ds.source_name, "left")
    )

    return joined.select(
        event_nk("source", "raw_event_id").alias("event_nk"),
        F.col("date_id").cast("long"),
        F.col("venue_sk").cast("long"),
        F.col("category_sk").cast("long"),
        F.col("source_sk").cast("long"),
        F.col("event_name"),
        F.col("url").alias("event_url"),
        F.col("event_status"),
        F.col("price_min"),
        F.col("price_max"),
        price_avg_expr("price_min", "price_max").alias("price_avg"),
        F.col("currency"),
        price_to_eur("price_min", "currency").alias("price_min_eur"),
        F.col("ingested_at"),
        loaded_at.alias("loaded_at"),
        F.lit(False).alias("is_deleted"),
        F.col("ingest_id").alias("_ingest_id"),
    )


def upsert_facts(existing: DataFrame, incoming: DataFrame) -> DataFrame:
    """Merge semantics of load_facts.sql:92-98: on event_nk match refresh
    the mutable attrs and loaded_at, preserving event_sk and the original
    ingested_at; new keys get deterministic surrogate keys."""
    inc = incoming.drop("_ingest_id")

    matched_or_existing = merge_upsert(
        existing.drop("event_sk"),
        inc,
        ["event_nk"],
        preserve=["ingested_at"],
    )
    # Re-attach surrogate keys: existing keys keep theirs, new keys extend.
    with_sk = matched_or_existing.join(
        existing.select("event_nk", "event_sk"), "event_nk", "left"
    )
    new_rows = with_sk.filter(F.col("event_sk").isNull()).drop("event_sk")
    old_rows = with_sk.filter(F.col("event_sk").isNotNull())
    new_rows = assign_surrogate_keys(existing, new_rows, "event_sk", ["event_nk"])
    return old_rows.select(existing.columns).unionByName(
        new_rows.select(existing.columns)
    )
