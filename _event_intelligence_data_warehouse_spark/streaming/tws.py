"""transformWithState user profiles — Spark 4's arbitrary-state API.

``transformWithStateInPandas`` supersedes ``applyInPandasWithState``
(used by streaming/stateful.py's sessionizer): typed named state
(value/list/map), per-key timers, state TTL and schema evolution,
backed by the RocksDB state store. The operator here maintains a
per-user running profile (event count + exact value cents) across
micro-batches — the streaming "user accumulator" every attribution /
feature-store pipeline keeps.

ENVIRONMENT GATE: the transformWithState Python protocol speaks
protobuf to the JVM state server, and ``google.protobuf`` is not
installed in this container (and may not be on minimal executors).
``stream_user_profiles`` probes for it at plan-build time and raises
``NotImplementedError`` with the exact fix (``pip install protobuf``)
instead of crashing the streaming runner mid-query — the same honest
fail-fast contract as the Avro reader (sources/orc_source.py) and the
PIL codecs (operators/multimodal.py). The processor itself is the real
implementation and runs unchanged where protobuf is present; the
sessionizer shipping on ``applyInPandasWithState`` (no protobuf
dependency) remains the tested default path.

Scale: state is partitioned by user key in RocksDB per executor; each
micro-batch touches only its keys' state (no full-state scans), and
cents-integer arithmetic keeps the running totals exact however many
batches fold in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

PROFILE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _require_protobuf() -> None:
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(its Python<->JVM state protocol); install with "
            "`pip install protobuf`. The applyInPandasWithState "
            "sessionizer (streaming/stateful.py) covers stateful "
            "streaming without it."
        ) from exc


class UserProfileProcessor(StatefulProcessor):
    """Running per-user profile in a typed value state: the canonical
    accumulate-across-batches shape on the new API."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._profile = handle.getValueState(
            "profile", "n_events BIGINT, value_cents BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n = 0
        cents = 0
        for pdf in rows:
            n += len(pdf)
            # exact integer cents — a float running total would drift
            # across thousands of micro-batches
            cents += int(
                pdf["value"].mul(100).round().astype("int64").sum()
            )
        if self._profile.exists():
            prev = self._profile.get()
            n += prev[0]
            cents += prev[1]
        self._profile.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_cents": [cents],
            }
        )

    def close(self) -> None:
        pass


def stream_user_profiles(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    *,
    queryName: str = "user_profiles",
    schema: str = "user_id long, value double",
) -> None:
    """Fold landed event files into per-user profiles via
    transformWithStateInPandas (update mode, availableNow trigger —
    drains everything pending then stops, the batch-cadence streaming
    shape the other jobs use). Emits updated profiles to the in-memory
    sink named ``queryName``; production swaps the sink for a
    foreachBatch MERGE into the warehouse."""
    _require_protobuf()
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    src = spark.readStream.schema(schema).parquet(input_dir)
    q = (
        src.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserProfileProcessor(),
            outputStructType=PROFILE_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
        .writeStream.format("memory")
        .queryName(queryName)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def protobuf_available() -> bool:
    try:
        _require_protobuf()
        return True
    except NotImplementedError:
        return False
