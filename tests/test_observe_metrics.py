"""df.observe in-flight metrics (operators/validate.py::observe_metrics):
the telemetry rides the action's own pass — no second scan — and reports
exactly the processed rows."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_observe_rides_the_write_pass(spark, tmp_path):
    from _event_intelligence_data_warehouse_spark.contract import load
    from _event_intelligence_data_warehouse_spark.operators import validate as vl

    ev = load(spark, SF, "events")
    observed, obs = vl.observe_metrics(
        ev,
        "ingest_telemetry",
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_type": F.sum(
                F.when(F.col("event_type").isNull(), 1).otherwise(0)
            ),
            "max_value": F.max("value"),
            "n_purchases": F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ),
        },
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    want_rows = ev.count()
    want_purch = ev.where(F.col("event_type") == "purchase").count()
    assert got["n_rows"] == want_rows
    assert got["n_null_type"] == 0
    assert got["n_purchases"] == want_purch
    assert got["max_value"] > 0
    # and the written data is byte-identical in row count
    assert spark.read.parquet(str(tmp_path / "out")).count() == want_rows


def test_observation_fires_on_localcheckpoint(spark):
    """The iterative operators (connected_components, kcore_peel) fuse
    their per-round convergence probe onto the round's localCheckpoint
    action via observe(); if a Spark upgrade stops posting execution
    events for the checkpoint action, obs.get would block FOREVER — a
    hang, not an error (r12 advice item 2). Pin the behavior with a
    bounded wait so an upgrade fails fast instead of hanging the
    operators."""
    import threading

    from pyspark.sql import Observation

    obs = Observation()
    df = (
        spark.range(100)
        .observe(obs, F.sum("id").alias("s"))
        .localCheckpoint()
    )
    box: dict = {}
    # daemon thread (not a pool): on a hang the test must FAIL and exit,
    # not block again joining the stuck getter at teardown
    t = threading.Thread(
        target=lambda: box.update(obs.get), daemon=True
    )
    t.start()
    t.join(timeout=60)
    assert not t.is_alive(), (
        "Observation.get did not return within 60s after localCheckpoint"
        " — this Spark version no longer posts execution events for the"
        " checkpoint action; the iterative operators' observe-fused"
        " convergence probes would hang"
    )
    assert box["s"] == 4950
    assert df.count() == 100


def test_observe_sees_only_filtered_rows(spark):
    from _event_intelligence_data_warehouse_spark.contract import load
    from _event_intelligence_data_warehouse_spark.operators import validate as vl

    ev = load(spark, SF, "events").where(F.col("event_type") == "error")
    observed, obs = vl.observe_metrics(
        ev, "filtered", {"n_rows": F.count(F.lit(1))}
    )
    n = observed.count()
    assert obs.get["n_rows"] == n > 0
