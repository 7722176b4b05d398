"""The five automated data-quality checks
(/root/reference/transform/data_quality.sql), each a one-row aggregate
appended to ``quality_log`` (SURVEY.md §2.13 G4).

Thresholds reproduce the reference exactly: null names warn under 5%
(:21), invalid dates warn under 10% (:41), inverted prices / duplicates /
orphans warn on any occurrence (:65-71,91,108-112).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.functions.cleanse import DATE_RE


def _check_row(
    df: DataFrame,
    *,
    check_name: str,
    table_name: str,
    failed_pred,
    warn_ratio: float | None,
    run_id: str,
) -> DataFrame:
    """records_checked / records_failed / pass_rate / tiered status
    (data_quality.sql:10-24 shape). ``warn_ratio=None`` means any failure
    is at most a warning (checks 3-5)."""
    failed = F.count_if(failed_pred)
    checked = F.count("*")
    pass_rate = F.round(
        (F.lit(Decimal("100.0")) * (checked - failed)).cast("decimal(18,4)")
        / F.nullif(checked, F.lit(0)),
        2,
    ).cast("decimal(5,2)")
    if warn_ratio is None:
        status = F.when(failed == 0, "passed").otherwise("warning")
    else:
        status = (
            F.when(failed == 0, "passed")
            .when(failed < warn_ratio * checked, "warning")
            .otherwise("failed")
        )
    return df.agg(
        F.lit(None).cast("long").alias("check_id"),
        F.lit(run_id).alias("run_id"),
        F.lit(check_name).alias("check_name"),
        F.lit(table_name).alias("table_name"),
        checked.cast("int").alias("records_checked"),
        failed.cast("int").alias("records_failed"),
        pass_rate.alias("pass_rate"),
        F.current_timestamp().alias("checked_at"),
        status.alias("status"),
    )


def check_null_event_names(raw: DataFrame, run_id: str) -> DataFrame:
    """Check 1 (data_quality.sql:10-24): missing/blank event names,
    5% warning threshold."""
    pred = F.col("event_name").isNull() | (F.trim(F.col("event_name")) == "")
    return _check_row(
        raw,
        check_name="null_event_names",
        table_name="raw_events",
        failed_pred=pred,
        warn_ratio=0.05,
        run_id=run_id,
    )


def check_invalid_event_dates(raw: DataFrame, run_id: str) -> DataFrame:
    """Check 2 (:30-44): event_date not YYYY-MM-DD, 10% threshold."""
    pred = ~F.coalesce(F.trim(F.col("event_date")).rlike(DATE_RE), F.lit(False))
    return _check_row(
        raw,
        check_name="invalid_event_dates",
        table_name="raw_events",
        failed_pred=pred,
        warn_ratio=0.10,
        run_id=run_id,
    )


def check_price_min_gt_max(stg: DataFrame, run_id: str) -> DataFrame:
    """Check 3 (:50-72): inverted price ranges; any occurrence warns."""
    pred = (
        F.col("price_min").isNotNull()
        & F.col("price_max").isNotNull()
        & (F.col("price_min") > F.col("price_max"))
    )
    return _check_row(
        stg,
        check_name="price_min_gt_max",
        table_name="stg_events",
        failed_pred=pred,
        warn_ratio=None,
        run_id=run_id,
    )


def check_duplicate_event_ids(raw: DataFrame, run_id: str) -> DataFrame:
    """Check 4 (:78-92): duplicate (source, raw_event_id) pairs. Failed =
    total surplus rows (SUM(cnt-1) over groups with cnt>1); denominator =
    all raw rows, matching the reference's scalar-subquery denominator."""
    dups = (
        raw.groupBy("source", "raw_event_id")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("dup_rows"))
    )
    total = raw.agg(F.count("*").alias("all_rows"))
    df = dups.crossJoin(total)
    failed = F.col("dup_rows")
    checked = F.col("all_rows")
    pass_rate = F.round(
        (F.lit(Decimal("100.0")) * (checked - failed)).cast("decimal(18,4)")
        / F.nullif(checked, F.lit(0)),
        2,
    ).cast("decimal(5,2)")
    return df.select(
        F.lit(None).cast("long").alias("check_id"),
        F.lit(run_id).alias("run_id"),
        F.lit("duplicate_event_ids").alias("check_name"),
        F.lit("raw_events").alias("table_name"),
        checked.cast("int").alias("records_checked"),
        failed.cast("int").alias("records_failed"),
        pass_rate.alias("pass_rate"),
        F.current_timestamp().alias("checked_at"),
        F.when(failed == 0, "passed").otherwise("warning").alias("status"),
    )


def run_raw_checks_one_pass(raw: DataFrame, run_id: str) -> DataFrame:
    """Checks 1-4 (data_quality.sql:10-92) in a SINGLE scan of the landing
    table — the scale path. All four checks are whole-table aggregates over
    the same rows, so computing them as four separate plans re-reads the
    table four times; at 100 TB that is the difference between one pass and
    four. One hash-aggregate computes every counter (duplicate surplus =
    ``COUNT(*) - COUNT(DISTINCT (source, raw_event_id))``, algebraically
    equal to the reference's ``SUM(cnt-1)`` over groups with cnt>1), then an
    ``inline`` unpivot emits the four per-check log rows. Semantics are
    identical to the per-check functions above; check 3's price predicate
    applies the staging cleanse cast inline (transform_events.sql:68-69)."""
    from _event_intelligence_data_warehouse_spark.functions.cleanse import (
        guarded_decimal,
    )

    name_bad = F.col("event_name").isNull() | (F.trim(F.col("event_name")) == "")
    date_bad = ~F.coalesce(
        F.trim(F.col("event_date")).rlike(DATE_RE), F.lit(False)
    )
    pmin = guarded_decimal(F.trim(F.col("price_min")))
    pmax = guarded_decimal(F.trim(F.col("price_max")))
    price_bad = pmin.isNotNull() & pmax.isNotNull() & (pmin > pmax)
    agg = raw.agg(
        F.count("*").alias("checked"),
        F.count_if(name_bad).alias("f_names"),
        F.count_if(date_bad).alias("f_dates"),
        F.count_if(price_bad).alias("f_prices"),
        (
            F.count("*")
            - F.count_distinct(F.struct("source", "raw_event_id"))
        ).alias("f_dups"),
    )
    # warn_ratio NULL = any failure is at most a warning (checks 3-4).
    specs = [
        ("null_event_names", "raw_events", "f_names", 0.05),
        ("invalid_event_dates", "raw_events", "f_dates", 0.10),
        ("price_min_gt_max", "stg_events", "f_prices", None),
        ("duplicate_event_ids", "raw_events", "f_dups", None),
    ]
    rows = agg.select(
        F.col("checked"),
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.lit(table).alias("table_name"),
                        F.col(fcol).alias("failed"),
                        F.lit(ratio).cast("double").alias("warn_ratio"),
                    )
                    for name, table, fcol, ratio in specs
                ]
            )
        ),
    )
    failed = F.col("failed")
    checked = F.col("checked")
    pass_rate = F.round(
        (F.lit(Decimal("100.0")) * (checked - failed)).cast("decimal(18,4)")
        / F.nullif(checked, F.lit(0)),
        2,
    ).cast("decimal(5,2)")
    status = (
        F.when(failed == 0, "passed")
        .when(F.col("warn_ratio").isNull(), "warning")
        .when(failed < F.col("warn_ratio") * checked, "warning")
        .otherwise("failed")
    )
    return rows.select(
        F.lit(None).cast("long").alias("check_id"),
        F.lit(run_id).alias("run_id"),
        F.col("check_name"),
        F.col("table_name"),
        checked.cast("int").alias("records_checked"),
        failed.cast("int").alias("records_failed"),
        pass_rate.alias("pass_rate"),
        F.current_timestamp().alias("checked_at"),
        status.alias("status"),
    )


def check_orphan_fact_records(
    fact: DataFrame,
    dim_date: DataFrame,
    dim_venue: DataFrame,
    dim_category: DataFrame,
    dim_source: DataFrame,
    run_id: str,
) -> DataFrame:
    """Check 5 (:98-113): fact rows whose FK is NULL or dangling. Uses
    left-anti probes against each dim, expressed as one aggregate over
    the fact with broadcast semi-join flags."""
    probes = [
        ("date_id", dim_date.select("date_id")),
        ("venue_sk", dim_venue.select("venue_sk")),
        ("category_sk", dim_category.select("category_sk")),
        ("source_sk", dim_source.select("source_sk")),
    ]
    df = fact
    flags = []
    for col, dim in probes:
        flag = f"__ok_{col}"
        dim_flag = dim.distinct().withColumn(flag, F.lit(True))
        df = df.join(F.broadcast(dim_flag), col, "left")
        flags.append(F.coalesce(F.col(flag), F.lit(False)))
    orphan = ~(flags[0] & flags[1] & flags[2] & flags[3])
    return _check_row(
        df,
        check_name="orphan_fact_records",
        table_name="fact_events",
        failed_pred=orphan,
        warn_ratio=None,
        run_id=run_id,
    )
