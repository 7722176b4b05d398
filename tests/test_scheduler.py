"""Scheduler (G2): due-job logic, loop mechanics, and the key operational
property — an hourly quality-only run on no new data advances nothing
(watermark incrementality makes it a metadata-probe no-op)."""

from __future__ import annotations

import datetime as dt

from _event_intelligence_data_warehouse_spark.plans import scheduler as sch
from _event_intelligence_data_warehouse_spark.plans import pipeline
from _event_intelligence_data_warehouse_spark.storage import Warehouse


def test_due_jobs_daily_fires_once_per_day_after_anchor():
    at = dt.time(6, 0)
    day = dt.date(2026, 3, 2)
    before = dt.datetime.combine(day, dt.time(5, 59))
    after = dt.datetime.combine(day, dt.time(6, 1))
    assert sch.DAILY_FULL not in sch.due_jobs(before, {}, daily_at=at)
    assert sch.DAILY_FULL in sch.due_jobs(after, {}, daily_at=at)
    # already ran today -> not due again, even hours later
    ran = {sch.DAILY_FULL: after}
    later = dt.datetime.combine(day, dt.time(18, 0))
    assert sch.DAILY_FULL not in sch.due_jobs(later, ran, daily_at=at)
    # next day it fires again
    next_day = dt.datetime.combine(day + dt.timedelta(days=1), dt.time(6, 5))
    assert sch.DAILY_FULL in sch.due_jobs(next_day, ran, daily_at=at)


def test_due_jobs_hourly_quality_cadence():
    t0 = dt.datetime(2026, 3, 2, 7, 0)
    assert sch.HOURLY_QUALITY in sch.due_jobs(t0, {})
    ran = {sch.HOURLY_QUALITY: t0}
    assert sch.HOURLY_QUALITY not in sch.due_jobs(
        t0 + dt.timedelta(minutes=30), ran
    )
    assert sch.HOURLY_QUALITY in sch.due_jobs(
        t0 + dt.timedelta(hours=1), ran
    )


def test_run_scheduler_loop_fires_jobs_via_fake_clock():
    fired: list[tuple[str, int]] = []
    ticks = {"n": 0}
    base = dt.datetime(2026, 3, 2, 5, 30)

    def clock():
        return base + dt.timedelta(minutes=30 * ticks["n"])

    def sleeper(_):
        ticks["n"] += 1

    sch.run_scheduler(
        spark=None,
        warehouse_dir="unused",
        max_ticks=4,  # 05:30, 06:00, 06:30, 07:00
        runner=lambda job: fired.append((job, ticks["n"])) or {},
        clock=clock,
        sleeper=sleeper,
        state_path=None,
    )
    jobs = [j for j, _ in fired]
    assert jobs.count(sch.DAILY_FULL) == 1, "daily job must fire exactly once"
    # hourly fires at 05:30 and again at 06:30 (60 min after its 05:30
    # completion timestamp — the fake clock doesn't advance mid-tick)
    assert jobs.count(sch.HOURLY_QUALITY) == 2


def test_runner_failure_does_not_kill_scheduler():
    """Reference parity (scripts/scheduler.py: subprocess.run doesn't
    raise on nonzero exit): a failing job logs, the loop keeps ticking,
    and the failed job RETRIES on its next due tick because last_runs
    was not updated."""
    fired: list[tuple[str, int]] = []
    ticks = {"n": 0}
    base = dt.datetime(2026, 3, 2, 5, 30)

    def clock():
        return base + dt.timedelta(minutes=30 * ticks["n"])

    def sleeper(_):
        ticks["n"] += 1

    def flaky(job):
        fired.append((job, ticks["n"]))
        if job == sch.HOURLY_QUALITY and ticks["n"] == 0:
            raise RuntimeError("transient pipeline failure")
        return {}

    sch.run_scheduler(
        spark=None,
        warehouse_dir="unused",
        max_ticks=3,  # 05:30 (fail), 06:00 (retry), 06:30
        runner=flaky,
        clock=clock,
        sleeper=sleeper,
        state_path=None,
    )
    hourly_ticks = [t for j, t in fired if j == sch.HOURLY_QUALITY]
    # failed at tick 0, so still due (and succeeds) at tick 1; its next
    # cadence slot after that is past the window
    assert hourly_ticks[:2] == [0, 1], "failed job did not retry next tick"
    assert sch.DAILY_FULL in [j for j, _ in fired], (
        "a job failure stopped the other job from running"
    )


def test_scheduler_restart_does_not_refire_daily(tmp_path):
    """A restart AFTER the daily anchor must not re-run the daily full —
    last-run state persists across processes."""
    state = str(tmp_path / "_meta" / "scheduler.json")
    base = dt.datetime(2026, 3, 2, 6, 30)
    fired: list[str] = []

    def run_once():
        sch.run_scheduler(
            spark=None,
            warehouse_dir=str(tmp_path),
            max_ticks=1,
            runner=lambda job: fired.append(job) or {},
            clock=lambda: base,
            sleeper=lambda _: None,
            state_path=state,
        )

    run_once()  # fresh start after 06:00 -> daily fires once
    assert fired.count(sch.DAILY_FULL) == 1
    run_once()  # simulated restart same day -> daily must NOT re-fire
    assert fired.count(sch.DAILY_FULL) == 1
    assert fired.count(sch.HOURLY_QUALITY) == 1, (
        "hourly also restored from state (ran 0 min ago)"
    )


def test_quality_only_tick_is_noop_on_no_new_data(spark, tmp_path):
    wh_dir = str(tmp_path / "wh")
    full = pipeline.parse_args(
        ["--warehouse-dir", wh_dir, "--source", "csv", "--generate-sample",
         "--sample-rows", "120"]
    )
    pipeline.run_pipeline(spark, wh_dir, full)
    wh = Warehouse(spark, wh_dir)
    before_facts = wh.read("fact_events").count()
    before_wm = wh.get_watermark(pipeline.WATERMARK)
    before_quality = wh.read("quality_log").count()

    runner = sch.make_runner(spark, wh_dir)
    result = runner(sch.HOURLY_QUALITY)

    assert result["load"] == {"staged": 0}, (
        "quality-only tick found data to load despite no new ingest"
    )
    assert wh.read("fact_events").count() == before_facts
    assert wh.get_watermark(pipeline.WATERMARK) == before_wm
    # quality DOES log a fresh check battery — that's its job
    assert wh.read("quality_log").count() == before_quality + 5
