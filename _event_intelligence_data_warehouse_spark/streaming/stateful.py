"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` — the arbitrary-state API Structured Streaming
exposes for operators its built-ins can't express (the built-in
``session_window`` can't carry custom per-session payloads or emit custom
close reasons).

State per user: the currently-open session (start, last-seen, count, sum).
Rows arrive in micro-batches; within a batch we close any session whose
gap is exceeded and emit it, keep the trailing open session in state, and
arm an event-time timeout at ``last_ts + gap`` so idle users' sessions are
flushed by the watermark instead of lingering forever — the property that
keeps state bounded on an unbounded stream.

Scale: state is per-key (user) and O(1) per key; the only shuffle is the
groupBy on the user key, identical to the batch sessionizer
(streaming.windows.sessionize). Arrow moves batches column-wise.
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double, close_reason string"
)
# epoch-microsecond longs: GroupState round-trips tuples, keep it flat.
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long, total double"


def _us(ts) -> int:
    import pandas as pd

    return int(pd.Timestamp(ts).value // 1000)


def make_session_func(gap_minutes: int = 30):
    """Build the (key, batches, state) -> batches function for
    ``applyInPandasWithState``. Factory so the gap rides the closure, not
    module state."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key: tuple, pdf_iter: Iterator, state: Any) -> Iterator:
        import pandas as pd

        (user_id,) = key

        def emit(start_us: int, last_us: int, n: int, total: float,
                 reason: str) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us * 1000)],
                    "session_end": [pd.Timestamp(last_us * 1000)],
                    "n_events": [n],
                    "sum_value": [total],
                    "close_reason": [reason],
                }
            )

        if state.hasTimedOut:
            start_us, last_us, n, total = state.get
            state.remove()
            yield emit(start_us, last_us, n, total, "timeout")
            return

        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values("ts", kind="mergesort")

        cur = list(state.get) if state.exists else None
        for ts, value in zip(rows["ts"], rows["value"]):
            t = _us(ts)
            if cur is None:
                cur = [t, t, 0, 0.0]
            elif t - cur[1] > gap_us:
                yield emit(cur[0], cur[1], cur[2], cur[3], "gap")
                cur = [t, t, 0, 0.0]
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += float(value)

        if cur is not None:
            state.update(tuple(cur))
            # Event-time timeout: fires once the watermark passes this.
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_us // 1000)

    return fn


def sessionize_stream(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming gap-sessionization of ``events(user_id, ts, value, ...)``.
    Emits a row per closed session; sessions still open when the stream
    ends stay in state for the next trigger (exactly the semantics a
    continuously-running pipeline wants)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_func(gap_minutes),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_stateful_sessionize(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    *,
    gap_minutes: int = 30,
) -> None:
    """AvailableNow drain of the stateful sessionizer over a parquet
    directory stream (see streaming.jobs.read_event_stream)."""
    from _event_intelligence_data_warehouse_spark.streaming.jobs import (
        read_event_stream,
    )

    stream = read_event_stream(spark, input_dir)
    sessions = sessionize_stream(stream, gap_minutes=gap_minutes)
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# Stateful streaming EWMA: the batch fold (operators/timeseries.py::ewma)
# as a continuously-updatable streaming operator.
# ---------------------------------------------------------------------------

EWMA_OUTPUT_SCHEMA = (
    "event_type string, day_idx long, y long, ewma_milli long"
)
EWMA_STATE_SCHEMA = "s long, last_d long"


def make_ewma_func(alpha_num: int = 1, alpha_den: int = 4):
    """(key, batches, state) -> batches for ``applyInPandasWithState``:
    the exact integer EWMA recurrence s_t = (a_n*y*1e9 +
    (a_d-a_n)*s_{t-1}) DIV a_d, one output row per input row, carrying
    the running state across micro-batches.

    Ordering contract: rows must arrive per-key in day order ACROSS
    batches (the staged daily rollup is written day-sorted; a
    production deployment feeds this from an ordered upstream or
    re-sorts per batch, which the function does defensively). State is
    two int64s per key — bounded regardless of stream length. int64
    holds s = y*1e9 up to y ~ 9.2e9 events/day/key; beyond that,
    pre-scale y (the batch twin widens to DECIMAL(38,0), which
    GroupState cannot carry).
    """
    rest = alpha_den - alpha_num

    def fn(key: tuple, pdf_iter, state):
        import pandas as pd

        (event_type,) = key
        if state.exists:
            s, last_d = state.get
        else:
            s, last_d = None, -(1 << 62)
        out_rows = []
        frames = [p for p in pdf_iter]
        if frames:
            pdf = pd.concat(frames).sort_values("d")
            for d, y in zip(pdf["d"].tolist(), pdf["y"].tolist()):
                d, y = int(d), int(y)
                if d <= last_d:
                    # late/duplicate day: production would route to a
                    # corrections topic; the contract input is dense
                    # and ordered, so this is defensive only.
                    continue
                ppb = y * 1_000_000_000
                s = ppb if s is None else (
                    (alpha_num * ppb + rest * s) // alpha_den
                )
                last_d = d
                out_rows.append(
                    (event_type, d, y, s // 1_000_000)
                )
        if s is not None:
            state.update((s, last_d))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["event_type", "day_idx", "y", "ewma_milli"],
            )

    return fn


def ewma_stream(daily: DataFrame, *, alpha_num: int = 1,
                alpha_den: int = 4) -> DataFrame:
    """Streaming EWMA over a per-key daily series stream
    ``daily(event_type, d, y)`` — same recurrence, same output grain as
    the batch fold; state carries (s, last_d) per key. No timeout: the
    smoother emits on every row, state is just the carried value."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return daily.groupBy("event_type").applyInPandasWithState(
        make_ewma_func(alpha_num, alpha_den),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_ewma(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """AvailableNow drain of the streaming EWMA over a parquet
    directory stream of (event_type, d, y) daily rows."""
    daily = (
        spark.readStream.schema("event_type string, d long, y long")
        .parquet(input_dir)
    )
    out = ewma_stream(daily)
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
