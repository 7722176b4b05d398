"""Event-time window operators over the ``events`` stream table.

Batch formulations use the same ``F.window`` primitives Structured
Streaming compiles, so a query developed on the batch table runs
unchanged under ``readStream`` (see ``streaming.jobs``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling_counts(
    events: DataFrame,
    duration: str = "1 hour",
    *,
    ts_col: str = "ts",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling event-time windows: counts + value sums per window
    (+ optional keys). Window start/end surface as plain timestamps."""
    keys = extra_keys or []
    win = F.window(F.col(ts_col), duration)
    return (
        events.groupBy(win.alias("w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))
                   .cast("bigint")).cast("double") / F.lit(100.0))
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    *,
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows."""
    win = F.window(F.col(ts_col), duration, slide)
    return (
        events.groupBy(win.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the key is idle
    longer than the gap. Classic lag+cumsum; one shuffle on the key.

    (Structured Streaming's ``session_window`` computes the same grouping
    incrementally; this batch form is the oracle-checkable one.)
    """
    w = Window.partitionBy(key).orderBy(ts_col, "event_id")
    gap = gap_minutes * 60
    with_breaks = events.withColumn(
        "_new_session",
        F.when(
            F.col(ts_col).cast("long")
            - F.lag(F.col(ts_col).cast("long")).over(w)
            > gap,
            1,
        )
        .otherwise(0),
    )
    with_ids = with_breaks.withColumn(
        "session_seq",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_ids.groupBy(key, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))
                   .cast("bigint")).cast("double") / F.lit(100.0))
            .alias("sum_value"),
        )
        .withColumn(
            "duration_seconds",
            F.col("session_end").cast("long")
            - F.col("session_start").cast("long"),
        )
    )
