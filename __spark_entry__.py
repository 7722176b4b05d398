"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in ``_event_intelligence_data_warehouse_spark.contract``;
this module is a thin stable wrapper.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from _event_intelligence_data_warehouse_spark import contract

    return contract.QUERIES["kpi_events_by_category"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from _event_intelligence_data_warehouse_spark import contract

    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    from _event_intelligence_data_warehouse_spark import contract

    return dict(contract.ORACLES)
