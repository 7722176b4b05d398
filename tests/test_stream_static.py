"""Stream-static enrichment (streaming/jobs.py::stream_static_enrich):
exactly-once stateless emission, left-join null semantics for dimension
misses, and the documented dimension-refresh-on-restart behavior."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint"
    ).write.mode("append").parquet(path)


def _write_dim(spark, path, rows):
    spark.createDataFrame(rows, "user_id bigint, segment string").write.mode(
        "overwrite"
    ).parquet(path)


def _drain(spark, src, dim, out, ckpt):
    from _event_intelligence_data_warehouse_spark.streaming import jobs

    stream = jobs.read_event_stream(spark, src)
    enriched = jobs.stream_static_enrich(
        stream, spark.read.parquet(dim), keys=["user_id"]
    ).select("event_id", "user_id", "segment")
    jobs.run_available_now(stream, enriched, out, ckpt)
    return spark.read.parquet(out)


def test_enrich_left_join_and_exactly_once(spark, tmp_path):
    src, dim, out, ckpt = (
        str(tmp_path / p) for p in ("in", "dim", "out", "ckpt")
    )
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    _write_events(
        spark, src, [(1, t0, 10), (2, t0, 11), (3, t0, 99)]
    )
    _write_dim(spark, dim, [(10, "gold"), (11, "silver")])
    got = {
        r.event_id: r.segment
        for r in _drain(spark, src, dim, out, ckpt).collect()
    }
    # dim miss (user 99) must survive with NULL, not drop
    assert got == {1: "gold", 2: "silver", 3: None}

    # draining again with nothing new emits nothing new (exactly-once)
    n_before = spark.read.parquet(out).count()
    _drain(spark, src, dim, out, ckpt)
    assert spark.read.parquet(out).count() == n_before


def test_dim_refresh_picked_up_on_restart(spark, tmp_path):
    src, dim, out, ckpt = (
        str(tmp_path / p) for p in ("in", "dim", "out", "ckpt")
    )
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    _write_events(spark, src, [(1, t0, 10)])
    _write_dim(spark, dim, [(10, "gold")])
    _drain(spark, src, dim, out, ckpt)

    # dimension refresh + new events; the restarted query (same
    # checkpoint) re-plans, re-listing the rewritten dim
    _write_dim(spark, dim, [(10, "platinum")])
    _write_events(spark, src, [(2, t0, 10)])
    got = {
        r.event_id: r.segment
        for r in _drain(spark, src, dim, out, ckpt).collect()
    }
    assert got[1] == "gold", "already-emitted rows must not be rewritten"
    assert got[2] == "platinum", "restart must see the refreshed dim"


def test_streaming_ewma_state_survives_restart(spark, tmp_path):
    """Two drains (days split across them) must produce exactly the
    one-shot result: the recurrence state carries through the state
    store across query restarts."""
    from _event_intelligence_data_warehouse_spark.streaming import stateful

    days = [(f"t{k}", d, 10 + 7 * d % 13) for k in range(2)
            for d in range(20)]
    df = spark.createDataFrame(days, "event_type string, d long, y long")

    # one-shot reference
    src1, out1, ck1 = (str(tmp_path / p) for p in ("a_in", "a_out", "a_ck"))
    df.repartition(1).sortWithinPartitions("event_type", "d") \
        .write.mode("overwrite").parquet(src1)
    stateful.run_stateful_ewma(spark, src1, out1, ck1)
    want = {
        (r.event_type, r.day_idx): r.ewma_milli
        for r in spark.read.parquet(out1).collect()
    }

    # split feed: days 0-9 first drain, 10-19 second drain
    src2, out2, ck2 = (str(tmp_path / p) for p in ("b_in", "b_out", "b_ck"))
    df.where("d < 10").repartition(1).sortWithinPartitions(
        "event_type", "d"
    ).write.mode("overwrite").parquet(src2)
    stateful.run_stateful_ewma(spark, src2, out2, ck2)
    df.where("d >= 10").repartition(1).sortWithinPartitions(
        "event_type", "d"
    ).write.mode("append").parquet(src2)
    stateful.run_stateful_ewma(spark, src2, out2, ck2)
    got = {
        (r.event_type, r.day_idx): r.ewma_milli
        for r in spark.read.parquet(out2).collect()
    }
    assert got == want and len(got) == 40
