"""Time-series shaping operators: calendar gap-filling.

A daily aggregate silently DROPS days with no rows — dashboards then
interpolate across the hole and anomaly screens (kpi_anomalous_days)
under-count the population. Gap-filling materializes one row per
(key, day) over the table's full span with zeroed measures and an
explicit is_gap flag: the dense-spine contract every downstream
moving-average / day-over-day / z-score consumer assumes.

Scale shape: the spine is |keys| x |days| — microscopic next to the
event table (a year is 366 rows per key). The span comes from ONE 1-row
aggregate, the day sequence explodes from that single row, the key list
is a distinct over the aggregate's own grouping column, and the final
left join attaches the daily aggregate to the spine — every frame but
the aggregate is broadcast-sized, so the corpus is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gapfill_daily(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str | None = "user_id",
) -> DataFrame:
    """One row per (key, day) for EVERY day in [min(ts), max(ts)] —
    days with no rows appear with n_events = 0 (and n_users = 0 when
    ``user_col`` is given) and is_gap = true.

    Returns (key_col, day, n_events, [n_users,] is_gap) with exact
    integer measures (engine-stable for oracle comparison)."""
    day = F.to_date(F.col(ts_col)).alias("day")
    aggs = [F.count("*").cast("bigint").alias("n_events")]
    if user_col is not None:
        aggs.append(
            F.countDistinct(F.col(user_col)).cast("bigint").alias("n_users")
        )
    daily = df.groupBy(F.col(key_col), day).agg(*aggs)
    span = df.agg(
        F.min(F.to_date(F.col(ts_col))).alias("d0"),
        F.max(F.to_date(F.col(ts_col))).alias("d1"),
    )
    days = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    keys = daily.select(key_col).distinct()
    spine = keys.crossJoin(F.broadcast(days))
    out_cols = [
        F.col(key_col),
        F.col("day"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
    ]
    if user_col is not None:
        out_cols.append(
            F.coalesce("n_users", F.lit(0)).cast("bigint").alias("n_users")
        )
    out_cols.append(F.col("n_events").isNull().alias("is_gap"))
    return spine.join(daily, [key_col, "day"], "left").select(*out_cols)


def ohlc(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    bucket: str = "hour",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """OHLC candle rollup — the hypertable/financial downsampling
    primitive: per (keys, time bucket) the Opening value (first by time,
    tiebroken deterministically), High, Low, Close (last), event count
    and exact DECIMAL volume.

    Open/close use the min/max of a (ts, tiebreak, value) STRUCT — a
    single aggregate pass with map-side partial combine (struct ordering
    is lexicographic), no row_number window over the raw events. That is
    the scale difference: one wordcount-shaped groupBy versus a
    per-bucket sort; at 100 TB the events stream through partial
    aggregates and only O(#buckets) rows survive."""
    keys = key_cols or []
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    v = F.col(value_col)
    # a NULL timestamp has no bucket: drop it rather than emit a
    # meaningless NULL-bucket candle
    df = df.filter(F.col(ts_col).isNotNull())
    pick = F.struct(
        F.col(ts_col).alias("t"),
        F.col(tiebreak_col).alias("tb"),
        v.alias("v"),
    )
    return (
        df.select(*keys, b, F.col(ts_col), F.col(tiebreak_col), v)
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.min(pick).getField("v").alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max(pick).getField("v").alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(v.cast("decimal(18,2)")).cast("double").alias("volume"),
        )
    )


def growth_accounting(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    id_col: str = "user_id",
) -> DataFrame:
    """Daily growth accounting: per day the active entities, the
    first-ever-seen entities, and the running cumulative entity count —
    the DAU/new/total triple every product and corpus dashboard leads
    with. "New" is min(day) per entity (wordcount shape, no distinct
    window); the cumulative sum windows over O(#days) rows only."""
    from pyspark.sql.window import Window

    day = F.to_date(F.col(ts_col)).alias("day")
    active = (
        df.select(day, F.col(id_col).alias("eid"))
        .groupBy("day")
        .agg(F.count_distinct("eid").cast("bigint").alias("active"))
    )
    new = (
        df.select(F.col(id_col).alias("eid"), day)
        .groupBy("eid")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("new_entities"))
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        active.join(new, "day", "left")
        .select(
            "day",
            "active",
            F.coalesce(F.col("new_entities"), F.lit(0)).cast("bigint")
            .alias("new_entities"),
        )
        .withColumn(
            "cum_entities",
            F.sum("new_entities").over(w).cast("bigint"),
        )
    )
