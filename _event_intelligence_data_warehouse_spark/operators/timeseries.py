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
