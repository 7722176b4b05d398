"""Streaming bronze -> gold fact MERGE (foreachBatch + AvailableNow):
exactly-once per bronze file via the checkpoint, idempotent via the
event_nk upsert, incremental for genuinely new keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.plans import pipeline
from _event_intelligence_data_warehouse_spark.sources import bronze
from _event_intelligence_data_warehouse_spark.sources.synthetic import (
    generate_sample_events,
)
from _event_intelligence_data_warehouse_spark.storage import Warehouse
from _event_intelligence_data_warehouse_spark.streaming import jobs


def test_stream_fact_merge_is_incremental_and_idempotent(spark, tmp_path):
    whdir = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    args = pipeline.parse_args(
        ["--warehouse-dir", whdir, "--source", "csv", "--generate-sample",
         "--sample-rows", "120"]
    )
    pipeline.run_pipeline(spark, whdir, args)
    wh = Warehouse(spark, whdir)
    n0 = wh.read("fact_events").count()
    assert n0 == 120

    # Drain 1: every bronze row re-merges; MERGE semantics keep counts.
    jobs.stream_facts_from_bronze(spark, wh, ckpt)
    assert wh.read("fact_events").count() == n0

    # Land a batch of genuinely new keys, drain again -> facts grow.
    fresh = generate_sample_events(spark, 30).withColumn(
        "event_id", F.concat(F.lit("S_"), F.col("event_id"))
    )
    bronze.land_batch(wh, fresh, source="csv")
    jobs.stream_facts_from_bronze(spark, wh, ckpt)
    n1 = wh.read("fact_events").count()
    assert n1 == n0 + 30, "new bronze keys did not reach the fact table"

    # Drain 3 with no new bronze files: checkpoint processes nothing.
    jobs.stream_facts_from_bronze(spark, wh, ckpt)
    assert wh.read("fact_events").count() == n1
    # surrogate keys stayed unique through the streaming merges
    sks = wh.read("fact_events").select("event_sk").collect()
    vals = [r[0] for r in sks]
    assert len(vals) == len(set(vals))
    # every merged micro-batch left a success row in the run log (S9
    # parity for the streaming path) and loaded counts are conserved
    stream_runs = (
        bronze.current_runs(wh)
        .filter(F.col("source") == "stream_fact_merge")
        .collect()
    )
    assert stream_runs and all(r["status"] == "success" for r in stream_runs)
    assert sum(r["records_loaded"] for r in stream_runs) == n0 + 30
