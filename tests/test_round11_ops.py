"""Round-11 operator tests: footer-metadata row counts, token-level
decontamination, release-gate composition, governance additions."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_parquet_row_count_matches_scan(spark, tmp_path):
    from _event_intelligence_data_warehouse_spark import storage as st

    path = os.path.join(SF_DIR, "documents.parquet")
    n_meta = st.parquet_row_count(path)
    n_scan = spark.read.parquet(path).count()
    assert n_meta == n_scan
    # empty / non-parquet directories fall back to None, never a guess
    assert st.parquet_row_count(str(tmp_path)) is None
    assert st.parquet_row_count(str(tmp_path / "missing")) is None
