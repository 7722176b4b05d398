"""transformWithState user profiles: environment-adaptive — where
protobuf is installed the profile accumulates across micro-batches
through the RocksDB state store; where it is not (this container), the
gate fails fast at plan-build time with the exact fix, never crashing
the streaming runner mid-query."""

from __future__ import annotations

import os

import pytest

from _event_intelligence_data_warehouse_spark.streaming import tws


def test_gate_or_accumulate(spark, tmp_path):
    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    os.makedirs(indir, exist_ok=True)
    schema = "user_id long, value double"
    spark.createDataFrame(
        [(1, 1.5), (1, 2.0), (2, 3.25)], schema
    ).coalesce(1).write.mode("append").parquet(indir)

    if not tws.protobuf_available():
        with pytest.raises(NotImplementedError, match="protobuf"):
            tws.stream_user_profiles(spark, indir, ckpt)
        return

    tws.stream_user_profiles(spark, indir, ckpt, queryName="tws_p")
    got = {
        r.user_id: (r.n_events, r.value_cents)
        for r in spark.table("tws_p").collect()
    }
    assert got == {1: (2, 350), 2: (1, 325)}

    # second batch folds into persisted state (user 1 grows, 3 appears)
    spark.createDataFrame([(1, 0.25), (3, 9.0)], schema).coalesce(
        1
    ).write.mode("append").parquet(indir)
    tws.stream_user_profiles(spark, indir, ckpt, queryName="tws_p2")
    got2 = {
        r.user_id: (r.n_events, r.value_cents)
        for r in spark.table("tws_p2").collect()
    }
    assert got2[1] == (3, 375)
    assert got2[3] == (1, 900)


def test_processor_logic_is_pure_python():
    """The accumulation math itself needs no Spark: replay the processor
    on pandas batches with a stub state handle (so the REAL processor
    body is covered even where protobuf gates the end-to-end run)."""
    import pandas as pd

    class _StubState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class _StubHandle:
        def getValueState(self, name, schema):
            return _StubState()

    p = tws.UserProfileProcessor()
    p.init(_StubHandle())
    out1 = list(
        p.handleInputRows(
            (1,), iter([pd.DataFrame({"value": [1.5, 2.0]})]), None
        )
    )
    assert out1[0].to_dict("records") == [
        {"user_id": 1, "n_events": 2, "value_cents": 350}
    ]
    out2 = list(
        p.handleInputRows(
            (1,), iter([pd.DataFrame({"value": [0.25]})]), None
        )
    )
    assert out2[0].to_dict("records") == [
        {"user_id": 1, "n_events": 3, "value_cents": 375}
    ]
    p.close()
