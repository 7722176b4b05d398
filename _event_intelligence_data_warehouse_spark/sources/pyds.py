"""Spark 4 Python DataSource: executor-side synthetic event generation.

The existing seeded generator (sources/synthetic.py, SURVEY §2 S6) builds
rows on the driver and parallelizes them — fine for test fixtures,
wrong at benchmark scale (the driver materializes every row). This
DataSource moves generation INTO the scan: the reader's ``partitions()``
declares N independent splits and each executor core generates only its
split's id-range, so a billion-row synthetic load never touches the
driver and scales with the cluster like any other source.

Registered under the short name ``synthetic_events``::

    from _event_intelligence_data_warehouse_spark.sources import pyds
    pyds.register(spark)
    df = (spark.read.format("synthetic_events")
          .option("n_rows", 1_000_000).option("n_partitions", 64).load())

Rows are a pure function of event_id (splitmix64-style bit mixing), so
any (n_rows, n_partitions) combination yields the identical table —
repartitioning the generator never changes the data, which the tests
pin. The same pattern is the template for wrapping any
Python-reachable system (REST cursors, message queues, bespoke file
formats) as a first-class parallel Spark source without a JVM
connector."""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("view", "click", "signup", "purchase", "error")

_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, value double"
)


def _mix64(x: int) -> int:
    """splitmix64 finalizer — deterministic, stateless, uniform; the
    per-row seed so generation is order- and partition-independent."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def row_for(event_id: int, n_users: int = 1000) -> tuple:
    """The closed-form row: tests and downstream fixtures replay it."""
    h = _mix64(event_id)
    user_id = h % n_users
    event_type = EVENT_TYPES[(h >> 10) % len(EVENT_TYPES)]
    # 2-decimal value from integer cents: one IEEE division, so every
    # engine/run gets the bit-identical double (not integral * 100 —
    # 0.07 * 100 != 7.0 in binary; consumers needing exact arithmetic
    # cast to DECIMAL(18,2) first, per the house oracle rules)
    value = ((h >> 16) % 10_000) / 100.0
    return (event_id, user_id, event_type, value)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = max(1, int(options.get("n_partitions", 8)))
        self.n_users = int(options.get("n_users", 1000))
        if self.n_rows < 0:
            raise ValueError("n_rows must be >= 0")

    def partitions(self):
        per = -(-self.n_rows // self.n_partitions)  # ceil
        return [
            _RangePartition(i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_partitions)
        ]

    def read(self, partition: _RangePartition):
        for event_id in range(partition.start, partition.end):
            yield row_for(event_id, self.n_users)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> _SyntheticEventsReader:
        return _SyntheticEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)
