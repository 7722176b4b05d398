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


def test_observe_sees_only_filtered_rows(spark):
    from _event_intelligence_data_warehouse_spark.contract import load
    from _event_intelligence_data_warehouse_spark.operators import validate as vl

    ev = load(spark, SF, "events").where(F.col("event_type") == "error")
    observed, obs = vl.observe_metrics(
        ev, "filtered", {"n_rows": F.count(F.lit(1))}
    )
    n = observed.count()
    assert obs.get["n_rows"] == n > 0
