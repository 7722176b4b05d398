from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from _event_intelligence_data_warehouse_spark.session import get_spark

    spark = get_spark(
        "eidw-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark
    spark.stop()


@pytest.fixture()
def warehouse(spark, tmp_path):
    from _event_intelligence_data_warehouse_spark.storage import Warehouse

    return Warehouse(spark, str(tmp_path / "wh"))
