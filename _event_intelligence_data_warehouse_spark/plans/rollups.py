"""Continuous-aggregate rollup cascade (hypertable-style): hourly ->
daily -> monthly event aggregates, each level derived from the previous
level's partials and refreshed incrementally.

The design constraints that make this work at 100 TB:

- **Re-aggregable measures only.** Each level stores (n_events,
  sum_value, min_value, max_value) — all additively/associatively
  combinable, so daily derives from hourly partials and monthly from
  daily WITHOUT touching raw data. (Non-reaggregables like exact
  distinct users belong in the sketch family — HLL registers merge the
  same way; see operators/sketches.py.)
- **Additive refresh.** A new event batch produces its own hourly
  partials, which MERGE into the stored hourly table (counts/sums add,
  min/max combine) — no re-scan of raw history. Affected partitions
  cascade upward: only the touched days and months recompute, each from
  the level below.
- **Partition-pruned storage.** Hourly partitions by day, daily by
  month (storage.overwrite_partitions): a refresh rewrites only the
  partitions its batch touched, the same dynamic-overwrite mechanics as
  the fact upsert.

Sum stays in the decimal domain end-to-end (exact, accumulation-order-
free) and is cast to double only at query/report boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOURLY = "agg_events_hourly"
DAILY = "agg_events_daily"
MONTHLY = "agg_events_monthly"

_DEC = "decimal(18,2)"

def _cents():
    """Integer cents of the event value (exact-same floor on every
    engine). Built lazily — Column construction needs a live session."""
    return F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")


def _cents_dec(cents_col):
    """Exact cents -> decimal(18,2): bigint cents cast to decimal and
    divided IN THE DECIMAL DOMAIN (exact — cents/100 always has <= 2
    decimals), then pinned back to the stored (18,2) scale."""
    return (cents_col.cast("decimal(18,2)") / 100).cast(_DEC)


def hourly_partials(events: DataFrame) -> DataFrame:
    """Raw events -> hourly partials (the only level that reads raw).
    Rows without an event time cannot enter a time rollup and are
    dropped here — a null day would otherwise poison the refresh's
    partition arithmetic AND exclude the null partition from its own
    merge (silent data loss under dynamic overwrite)."""
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            # Measures quantize to integer CENTS first
            # (floor(x*100+0.5), identical IEEE on every engine) and
            # convert to the stored decimal(18,2) scale through EXACT
            # decimal division — never a raw double->DECIMAL cast,
            # whose Spark-shortest-repr-HALF_UP vs exact-binary
            # rounding splits on half-cent ties (the r8 ohlc
            # driver-red class; r9 sweep). Stored scale stays pinned:
            # refresh-merged files keep decimal(18,2).
            _cents_dec(F.sum(_cents())).alias("sum_value"),
            _cents_dec(F.min(_cents())).alias("min_value"),
            _cents_dec(F.max(_cents())).alias("max_value"),
        )
        .withColumn("d", F.to_date("hour_start"))
    )


def _combine(df: DataFrame, keys: list[str]) -> DataFrame:
    """Re-aggregate partials: counts/sums add, min/max combine."""
    return df.groupBy(*keys).agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").cast(_DEC).alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def daily_from_hourly(hourly: DataFrame) -> DataFrame:
    return _combine(hourly, ["d", "event_type"]).withColumn(
        "m", F.trunc("d", "month")
    )


def monthly_from_daily(daily: DataFrame) -> DataFrame:
    return _combine(daily, ["m", "event_type"])


def build_cascade(wh, events: DataFrame) -> None:
    """Full (re)build of all three levels, each from the level below."""
    hourly = hourly_partials(events)
    wh.overwrite_partitions(HOURLY, hourly, "d")
    daily = daily_from_hourly(wh.read(HOURLY))
    wh.overwrite_partitions(DAILY, daily, "m")
    wh.overwrite(MONTHLY, monthly_from_daily(wh.read(DAILY)))


def refresh_incremental(wh, new_events: DataFrame) -> dict[str, int]:
    """Merge a new event batch into the cascade without re-scanning
    history: additive hourly merge for the touched days, then recompute
    only the touched days' daily rows and touched months' monthly rows
    from the level below. Returns touched-partition counts."""
    inc = hourly_partials(new_events)
    days = [r[0] for r in inc.select("d").distinct().collect()]
    if not days:
        return {"days": 0, "months": 0}

    existing = wh.read(HOURLY).filter(F.col("d").isin(days))
    merged_hours = _combine(
        existing.unionByName(inc), ["hour_start", "event_type"]
    ).withColumn("d", F.to_date("hour_start"))
    wh.overwrite_partitions(HOURLY, merged_hours, "d")

    # Daily partitions at MONTH granularity: a month partition must be
    # rewritten whole, so recompute every day of the touched months from
    # hourly (partition-pruned on d) — touched-days-only rows would
    # silently drop the month's other days.
    months = sorted({d.replace(day=1) for d in days})
    daily_touched = daily_from_hourly(
        wh.read(HOURLY).filter(F.trunc("d", "month").isin(months))
    )
    wh.overwrite_partitions(DAILY, daily_touched, "m")
    monthly_touched = monthly_from_daily(
        wh.read(DAILY).filter(F.col("m").isin(months))
    )
    # monthly is tiny (months x types): merge via key-replace union. A
    # crash between a previous run's DAILY and MONTHLY writes can leave
    # MONTHLY absent — recover from an empty same-shape frame instead of
    # failing every subsequent refresh.
    if wh.exists(MONTHLY):
        current = wh.read(MONTHLY).filter(~F.col("m").isin(months))
    else:
        current = monthly_touched.limit(0)
    wh.overwrite(
        MONTHLY, current.unionByName(monthly_touched.select(current.columns))
    )
    return {"days": len(days), "months": len(months)}
