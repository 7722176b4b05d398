"""Source-layer tests: TM JSON flatten, bronze dedup-on-write, synthetic
generator contract (SURVEY.md §2.1 S4-S7)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.sources.api_source import (
    flatten_tm_payloads,
)
from _event_intelligence_data_warehouse_spark.sources.synthetic import (
    generate_sample_events,
)
from _event_intelligence_data_warehouse_spark.sources import bronze


TM_EVENT = {
    "id": "tm123",
    "name": "Rock Night",
    "url": "https://tm/e/tm123",
    "dates": {
        "start": {"localDate": "2026-06-05", "localTime": "20:00:00"},
        "status": {"code": "onsale"},
    },
    "classifications": [
        {"segment": {"name": "Music"}, "genre": {"name": "Rock"}}
    ],
    "priceRanges": [{"min": 30.0, "max": 90.0, "currency": "EUR"}],
    "_embedded": {
        "venues": [
            {
                "name": "Arena",
                "city": {"name": "Berlin"},
                "country": {"name": "Germany", "countryCode": "DE"},
                "location": {"latitude": "52.52", "longitude": "13.405"},
            }
        ]
    },
}


def test_flatten_tm_payload_paths(spark):
    payloads = spark.createDataFrame(
        [(json.dumps(TM_EVENT),)], "raw_payload string"
    )
    row = flatten_tm_payloads(payloads).collect()[0]
    assert row.event_id == "tm123"
    assert row.event_name == "Rock Night"
    assert row.event_date == "2026-06-05"
    assert row.event_time == "20:00:00"
    assert row.venue_name == "Arena"
    assert row.venue_city == "Berlin"
    assert row.venue_country == "Germany"
    assert row.venue_lat == "52.52"
    assert row.category == "Music"
    assert row.subcategory == "Rock"
    assert row.price_min == "30.0"
    assert row.currency == "EUR"
    assert row.status == "onsale"


def test_flatten_is_null_safe_on_missing_paths(spark):
    minimal = {"id": "x1", "name": "Bare"}
    payloads = spark.createDataFrame(
        [(json.dumps(minimal),)], "raw_payload string"
    )
    row = flatten_tm_payloads(payloads).collect()[0]
    assert row.event_id == "x1"
    assert row.venue_name is None
    assert row.price_min is None
    assert row.status is None


def test_synthetic_generator_contract(spark):
    df = generate_sample_events(spark, 100)
    assert df.count() == 100
    assert len(df.columns) == 16
    ids = [r.event_id for r in df.select("event_id").collect()]
    assert len(set(ids)) == 100 and ids[0].startswith("MOCK_")
    # deterministic: same seed -> same data
    again = generate_sample_events(spark, 100)
    assert df.exceptAll(again).count() == 0
    # prices parse and min <= max by construction
    bad = df.filter(
        F.col("price_min").cast("double") > F.col("price_max").cast("double")
    )
    assert bad.count() == 0


def test_dirty_generator_injects_defects(spark):
    df = generate_sample_events(spark, 500, dirty=True).cache()
    n = df.count()
    nulls = df.filter(F.col("event_name").isNull()).count()
    bad_dates = df.filter(
        ~F.col("event_date").rlike(r"^\d{4}-\d{2}-\d{2}$")
    ).count()
    dup_ids = n - df.select("event_id").distinct().count()
    assert 0 < nulls < 0.05 * n          # under the 5% warning threshold
    assert 0 < bad_dates < 0.10 * n      # under the 10% threshold
    assert dup_ids > 0
    df.unpersist()


def test_bronze_dedup_on_write(spark, warehouse):
    batch = generate_sample_events(spark, 50)
    r1 = bronze.land_batch(warehouse, batch, source="csv")
    assert r1["records_loaded"] == 50
    # Same batch again: all duplicates, nothing lands.
    r2 = bronze.land_batch(warehouse, batch, source="csv")
    assert r2["records_loaded"] == 0
    assert warehouse.read(bronze.RAW_TABLE).count() == 50
    # Run log carries both runs' final states.
    runs = bronze.current_runs(warehouse).collect()
    assert len(runs) == 2
    assert all(r.status == "success" for r in runs)


def test_bronze_lands_batches_with_schema_drift(spark, warehouse):
    """Landing tolerates source schema drift: missing columns land as
    NULL, unknown extra columns are dropped, and the bronze schema stays
    fixed — the contract that keeps a long-lived 100 TB landing table
    stable while upstream feeds evolve."""
    from _event_intelligence_data_warehouse_spark.sources import bronze
    from _event_intelligence_data_warehouse_spark import schemas

    # minimal batch: only ids and names (everything else missing)
    small = spark.createDataFrame(
        [("D1", "Concert A"), ("D2", "Concert B")],
        "event_id string, event_name string",
    )
    r1 = bronze.land_batch(warehouse, small, source="drifty")
    assert r1["records_loaded"] == 2

    # wider batch: adds an unknown column and overlaps one id
    wide = spark.createDataFrame(
        [("D2", "Concert B", "junk"), ("D3", "Concert C", "junk")],
        "event_id string, event_name string, not_a_raw_column string",
    )
    r2 = bronze.land_batch(warehouse, wide, source="drifty")
    assert r2["records_loaded"] == 1  # D2 deduped on write

    landed = warehouse.read(bronze.RAW_TABLE, schemas.RAW_EVENTS)
    rows = {r.raw_event_id: r for r in landed.collect()}
    assert set(rows) == {"D1", "D2", "D3"}
    assert "not_a_raw_column" not in landed.columns
    assert [f.name for f in landed.schema.fields] == [
        f.name for f in schemas.RAW_EVENTS.fields
    ]
    # missing columns landed as NULLs, present ones kept
    assert rows["D1"].event_name == "Concert A"
    assert rows["D1"].venue_city is None and rows["D1"].price_min is None


def test_jsonl_roundtrip_and_corrupt_capture(spark, tmp_path):
    """JSONL read is schema'd (no inference pass); malformed lines land
    in the corrupt channel instead of disappearing; a clean round-trip
    preserves values."""
    from pyspark.sql import types as T

    from _event_intelligence_data_warehouse_spark.sources import jsonl

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        'not json at all\n'
        '{"doc_id": 2, "text": "beta"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = jsonl.read_jsonl(spark, str(p), schema)
    clean, corrupt = jsonl.split_corrupt(df)
    got = {(r.doc_id, r.text) for r in clean.collect()}
    assert got == {(1, "alpha"), (2, "beta")}
    bad = [r.raw_line for r in corrupt.collect()]
    assert bad == ["not json at all"]


def test_jsonl_sharded_export_is_deterministic(spark, tmp_path):
    """Shard membership is a pure function of the sort key (hash
    bucket, not sampled range boundaries): re-exporting the same data
    from a differently-partitioned frame yields byte-identical shard
    contents — including with heavily skewed duplicate keys, where
    sampled boundaries are most likely to wobble."""
    import glob

    from pyspark.sql import types as T

    from _event_intelligence_data_warehouse_spark.sources import jsonl

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    # skew: 60% of rows share 3 hot keys, the rest spread out
    rows = [(i % 3 if i < 60 else i, f"doc-{i}") for i in range(100)]
    df = spark.createDataFrame(rows, schema)

    def export(frame, out):
        jsonl.write_jsonl_shards(
            frame, out, order_col="doc_id", n_shards=4,
            max_records_per_file=20,
        )
        shards = {}
        for f in glob.glob(out + "/shard=*/part-*"):
            with open(f) as fh:
                lines = fh.read().splitlines()
            idx = int(f.rsplit("/", 2)[1].split("=")[1])
            shards.setdefault(idx, []).extend(lines)
        return {k: sorted(v) for k, v in shards.items()}

    a = export(df, str(tmp_path / "a"))
    b = export(df.repartition(13), str(tmp_path / "b"))
    assert a == b, "shard contents changed with input partitioning"
    assert sum(len(v) for v in a.values()) == 100
    # round-trip: every row comes back (shard= partition dirs readable;
    # the synthetic shard column is layout, not payload)
    back = jsonl.read_jsonl(spark, str(tmp_path / "a"), schema)
    clean, corrupt = jsonl.split_corrupt(back)
    assert clean.count() == 100 and corrupt.count() == 0


def test_jsonl_contiguous_range_mode_still_exports_all_rows(spark, tmp_path):
    """The opt-in range mode (contiguous key ranges, sampled boundaries)
    keeps the old root-level part-file layout and loses no rows."""
    import glob

    from pyspark.sql import types as T

    from _event_intelligence_data_warehouse_spark.sources import jsonl

    schema = T.StructType([T.StructField("doc_id", T.LongType())])
    df = spark.createDataFrame([(i,) for i in range(50)], schema)
    out = str(tmp_path / "r")
    jsonl.write_jsonl_shards(
        df, out, order_col="doc_id", n_shards=3, contiguous_ranges=True
    )
    files = glob.glob(out + "/part-*")
    assert files, "range mode should write root-level part files"
    n = sum(len(open(f).read().splitlines()) for f in files)
    assert n == 50


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC round-trip preserves values, and a filtered read pushes the
    predicate to the ORC scan like parquet would."""
    from pyspark.sql import functions as F

    from _event_intelligence_data_warehouse_spark.sources import orc_source

    df = spark.range(100).selectExpr("id", "id % 5 as grp",
                                     "cast(id * 1.5 as double) as v")
    p = str(tmp_path / "t.orc")
    orc_source.write_orc(df, p)
    back = orc_source.read_orc(spark, p)
    assert sorted(r.id for r in back.collect()) == list(range(100))

    filtered = back.filter(F.col("grp") == 2).select("id")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "grp" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], "grp filter not pushed to the ORC scan"
    assert filtered.count() == 20


def test_jsonl_export_report_counts_every_shard(spark, tmp_path):
    from pyspark.sql import functions as F

    from _event_intelligence_data_warehouse_spark.sources import jsonl

    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("doc"), F.col("id")).alias("text")
    )
    out = str(tmp_path / "release")
    jsonl.write_jsonl_shards(df, out, order_col="id", n_shards=4)
    rep = jsonl.export_report(spark, out)
    rows = rep.collect()
    assert sum(r.n_records for r in rows) == 100
    assert {r.shard for r in rows} == {0, 1, 2, 3}
    assert all(r.n_bytes and r.n_bytes > 0 for r in rows)
