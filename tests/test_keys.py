"""Key/measure expression semantics (SURVEY.md §2.4): byte-identical md5,
Postgres || NULL propagation, canonical price_avg, FX table."""

from __future__ import annotations

import hashlib
from decimal import Decimal

from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.functions.keys import (
    event_nk,
    price_avg_expr,
    price_to_eur,
    source_type_expr,
    venue_nk,
)


def test_venue_nk_matches_reference_md5(spark):
    # MD5(COALESCE(name,'')||COALESCE(city,'')) — transform_events.sql:107
    df = spark.createDataFrame(
        [("Arena", "Berlin"), (None, "Berlin"), ("Arena", None), (None, None)],
        "name string, city string",
    )
    got = [r[0] for r in df.select(venue_nk("name", "city")).collect()]
    exp = [
        hashlib.md5(b"ArenaBerlin").hexdigest(),
        hashlib.md5(b"Berlin").hexdigest(),
        hashlib.md5(b"Arena").hexdigest(),
        hashlib.md5(b"").hexdigest(),
    ]
    assert got == exp


def test_event_nk_null_propagates_like_pg_concat(spark):
    # source || '_' || id with NULL yields NULL in Postgres (SURVEY F2).
    df = spark.createDataFrame(
        [("csv", "MOCK_1"), ("csv", None)], "source string, id string"
    )
    got = [r[0] for r in df.select(event_nk("source", "id")).collect()]
    assert got == ["csv_MOCK_1", None]


def test_price_avg_canonical_variant(spark):
    # load_facts.sql:58-62: ROUND((min+max)/2, 2) if both else COALESCE.
    df = spark.createDataFrame(
        [
            (Decimal("10.00"), Decimal("15.01")),
            (Decimal("10.00"), None),
            (None, Decimal("7.00")),
            (None, None),
        ],
        "pmin decimal(10,2), pmax decimal(10,2)",
    )
    got = [r[0] for r in df.select(price_avg_expr("pmin", "pmax")).collect()]
    assert got == [Decimal("12.51"), Decimal("10.00"), Decimal("7.00"), None]


def test_price_to_eur_fx(spark):
    # load_facts.sql:66-71 hard-coded FX.
    df = spark.createDataFrame(
        [
            (Decimal("100.00"), "EUR"),
            (Decimal("100.00"), "USD"),
            (Decimal("100.00"), "GBP"),
            (Decimal("100.00"), "JPY"),
        ],
        "p decimal(10,2), c string",
    )
    got = [r[0] for r in df.select(price_to_eur("p", "c")).collect()]
    assert got == [
        Decimal("100.00"),
        Decimal("92.00"),
        Decimal("117.00"),
        Decimal("100.00"),
    ]


def test_source_type_mapping(spark):
    df = spark.createDataFrame(
        [("ticketmaster",), ("csv",), ("scrape",)], "s string"
    )
    got = [r[0] for r in df.select(source_type_expr("s")).collect()]
    assert got == ["api", "csv", "unknown"]
