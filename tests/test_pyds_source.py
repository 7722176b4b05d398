"""Python DataSource (synthetic_events) tests: parallel splits land as
real scan partitions, generation is a pure function of event_id
(repartitioning never changes the data), and rows match the closed-form
Python reference."""

from __future__ import annotations

from _event_intelligence_data_warehouse_spark.sources import pyds


def _read(spark, n_rows, n_partitions):
    pyds.register(spark)
    return (
        spark.read.format("synthetic_events")
        .option("n_rows", n_rows)
        .option("n_partitions", n_partitions)
        .load()
    )


def test_rows_match_closed_form_reference(spark):
    df = _read(spark, 50, 4)
    got = {r.event_id: (r.user_id, r.event_type, r.value)
           for r in df.collect()}
    assert len(got) == 50
    for i in range(50):
        eid, uid, et, val = pyds.row_for(i)
        assert got[i] == (uid, et, val)


def test_partitioning_is_data_invariant(spark):
    a = sorted(map(tuple, _read(spark, 203, 3).collect()))
    b = sorted(map(tuple, _read(spark, 203, 17).collect()))
    assert a == b
    assert len(a) == 203


def test_splits_surface_as_scan_partitions(spark):
    df = _read(spark, 1000, 6)
    assert df.rdd.getNumPartitions() == 6
    # uneven split: ceil(7/3)=3 -> (3,3,1); totals still exact
    assert _read(spark, 7, 3).count() == 7


def test_generated_values_are_two_decimal_cents(spark):
    df = _read(spark, 100, 2)
    vals = [r.value for r in df.collect()]
    # values are integer cents through one IEEE division: recovering the
    # cents by rounding is lossless even though v * 100 isn't integral
    assert all(abs(v * 100 - round(v * 100)) < 1e-6 for v in vals)
    assert all(0 <= v < 100 for v in vals)
    types = {r.event_type for r in df.collect()}
    assert types <= set(pyds.EVENT_TYPES)
