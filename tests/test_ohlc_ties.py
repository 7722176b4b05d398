"""Cross-engine pin for the OHLC volume fold on half-cent TIE values.

The round-8 driver red (`timeseries_ohlc_hourly`, hash mismatch with
rows/schema green) traced to `SUM(CAST(double AS DECIMAL(18,2)))`:
Spark casts a double through its shortest decimal repr then rounds
HALF_UP, DuckDB rounds the exact binary expansion — a value whose
shortest repr lands exactly on a half cent (e.g. 2.675, whose binary
value is 2.67499…) splits the engines. The local testdata happens to
contain no such values, so this test CRAFTS them and asserts the
integer-cents fold (floor(x*100 + 0.5) in pure double, BIGINT sum)
produces bit-identical volumes in Spark and DuckDB.
"""

from __future__ import annotations

import duckdb

# shortest-repr 3-decimals-ending-in-5: the exact tie class. For each,
# floor(x*100 + 0.5) in IEEE double is deterministic and engine-free.
TIE_VALUES = [2.675, 0.125, 19.175, 1.005, 0.015, -2.675, 1234.565]
PLAIN_VALUES = [1.0, 2.33, 0.07, 100.5, -3.25]


def _events_df(spark):
    rows = []
    for i, v in enumerate(TIE_VALUES + PLAIN_VALUES):
        rows.append(
            (
                i,
                f"2024-01-01 0{i % 3}:15:{i % 60:02d}",
                i % 5,
                "tie" if i < len(TIE_VALUES) else "plain",
                float(v),
            )
        )
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, "
        "event_type string, value double"
    )
    return df.selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value"
    )


def test_ohlc_volume_ties_match_duckdb(spark, tmp_path):
    from _event_intelligence_data_warehouse_spark.operators import (
        timeseries as tso,
    )

    ev = _events_df(spark)
    pq = str(tmp_path / "events.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(pq)

    got = {
        (r.event_type, str(r.bucket_ts)): r
        for r in tso.ohlc(
            spark.read.parquet(pq), key_cols=["event_type"], bucket="hour"
        ).collect()
    }

    con = duckdb.connect()
    oracle = con.execute(
        f"""
        SELECT event_type,
               CAST(date_trunc('hour', ts) AS VARCHAR) AS bucket_ts,
               CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
                             AS BIGINT)) AS DOUBLE) / 100.0 AS volume,
               MAX(value) AS high, MIN(value) AS low,
               COUNT(*) AS n
        FROM read_parquet('{pq}/*.parquet')
        GROUP BY 1, 2
        """
    ).fetchall()
    assert oracle, "crafted corpus produced no buckets"
    for et, bts, volume, high, low, n in oracle:
        r = got[(et, bts)]
        # bit-identical double: the BIGINT cents sum and the final
        # /100.0 are the same IEEE ops in both engines
        assert r.volume == volume, (et, bts, r.volume, volume)
        assert r.high == high and r.low == low and r.n_events == n

    # and the fold genuinely exercises the tie class per row: on
    # 1.005 (binary 1.00499…) and -2.675 the pure-double floor fold
    # reads the value differently than the shortest-repr HALF_UP
    # decimal cast — if no row diverges the corpus isn't covering the
    # boundary. (Both ENGINES agree on each side individually; the
    # point is the fold is boundary-exact on the binary value, so any
    # engine that rounds the exact binary expansion still matches.)
    n_diverge = con.execute(
        f"""
        SELECT COUNT(*) FROM read_parquet('{pq}/*.parquet')
        WHERE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              <> CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)
        """
    ).fetchone()[0]
    assert n_diverge > 0, "tie corpus failed to expose the class"


def test_registry_has_no_decimal_output_columns(spark):
    """The r8 driver red was the registry's ONLY DECIMAL-typed output
    column (engine-dependent Decimal rendering + rounding-tie hazard).
    Pin the invariant on the enrichment/timeseries family — new queries
    must render decimals as double/bigint before returning."""
    from pyspark.sql.types import DecimalType

    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    df = QUERIES["timeseries_ohlc_hourly"](spark, "/root/testdata/sf0.001")
    bad = [f.name for f in df.schema.fields
           if isinstance(f.dataType, DecimalType)]
    assert not bad, f"DECIMAL output columns re-introduced: {bad}"


def test_r9_sweep_cents_paths_match_duckdb_on_ties(spark, tmp_path):
    """Round-9 registry sweep: every remaining events.value ->
    DECIMAL(18,2) site was converted to the integer-cents fold. Pin the
    three representative Spark paths (tumbling window sum, salted
    min/max/sum, winsorize rank ordering) against DuckDB on the crafted
    half-cent tie corpus — the exact inputs on which the old decimal
    cast split the engines."""
    from _event_intelligence_data_warehouse_spark.operators import skew
    from _event_intelligence_data_warehouse_spark.streaming import (
        windows as win,
    )

    ev = _events_df(spark)
    pq = str(tmp_path / "events.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{pq}/*.parquet'")

    # tumbling hourly value sums
    got = {
        (str(r.window_start), r.event_type): r.sum_value
        for r in win.tumbling_counts(
            spark.read.parquet(pq), "1 hour", extra_keys=["event_type"]
        ).collect()
    }
    for ws, et, sv in con.execute(
        """
        SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000),
               event_type,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0
        FROM events GROUP BY 1, 2
        """
    ).fetchall():
        assert got[(str(ws), et)] == sv

    # salted agg min/max/sum
    from pyspark.sql import functions as F

    e = spark.read.parquet(pq).select(
        "event_type", "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint").alias("v"),
    )
    out = skew.salted_agg(
        e, ["event_type"],
        {"n": ("*", "count"), "s": ("v", "sum"),
         "lo": ("v", "min"), "hi": ("v", "max")},
        salt_src="event_id", n_salt=8,
    )
    got2 = {r.event_type: (r.s, r.lo, r.hi) for r in out.collect()}
    for et, s, lo, hi in con.execute(
        """
        SELECT event_type,
               SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)),
               MIN(CAST(floor(value * 100 + 0.5) AS BIGINT)),
               MAX(CAST(floor(value * 100 + 0.5) AS BIGINT))
        FROM events GROUP BY 1
        """
    ).fetchall():
        assert got2[et] == (s, lo, hi)
