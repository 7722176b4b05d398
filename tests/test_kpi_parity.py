"""Column-level parity pins for the six reporting KPI views against
/root/reference/dashboard/kpi_queries.sql (SURVEY.md §2.10 V2).

Each test asserts (a) the exact column set *and order* of the view and
(b) the aggregation-source column, using a fixture engineered so every
drift the round-5 verdict flagged is distinguishable:

* ``price_avg`` differs from ``price_min_eur`` on every row, so an avg
  computed from the wrong measure produces a different value
  (kpi_queries.sql:19,38,61,77 all average ``f.price_avg``).
* Two venues share a ``venue_name`` within one city but have distinct
  ``venue_sk`` — ``COUNT(DISTINCT v.venue_sk)`` (kpi_queries.sql:37)
  must see 2 where a name-based count would see 1.
* ``active_events`` (onsale filter-count) belongs to kpi_monthly_trend
  (kpi_queries.sql:58-62), NOT kpi_events_by_city (kpi_queries.sql:32-46).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from _event_intelligence_data_warehouse_spark.plans import kpis


def _fact(spark):
    # price_avg = 20.0 everywhere; price_min_eur = 5.0; price_max = 40.0.
    # Any view averaging the wrong source returns 5.0 instead of 20.0.
    rows = [
        # (event_sk, category_sk, venue_sk, date_id, status, deleted)
        (1, 1, 1, 1, "onsale", False),
        (2, 1, 2, 1, "offsale", False),
        (3, 1, 3, 2, "cancelled", False),
        (4, 2, 3, 2, "onsale", False),
        (5, 2, 1, 1, "onsale", True),  # deleted -> excluded everywhere
    ]
    return spark.createDataFrame(
        [
            Row(
                event_sk=sk,
                category_sk=c,
                venue_sk=v,
                date_id=d,
                event_status=s,
                is_deleted=del_,
                price_avg=20.0,
                price_min_eur=5.0,
                price_max=40.0,
            )
            for sk, c, v, d, s, del_ in rows
        ]
    )


def _dims(spark):
    dim_category = spark.createDataFrame(
        [
            Row(category_sk=1, category_name="Music", subcategory="Rock"),
            Row(category_sk=2, category_name="Sports", subcategory="General"),
        ]
    )
    # venue_sk 1 and 2: same name, same city -> distinct venue_sk = 2.
    dim_venue = spark.createDataFrame(
        [
            Row(venue_sk=1, venue_name="Arena", city="Berlin", country="Germany"),
            Row(venue_sk=2, venue_name="Arena", city="Berlin", country="Germany"),
            Row(venue_sk=3, venue_name="Dome", city="Munich", country="Germany"),
        ]
    )
    dim_date = spark.createDataFrame(
        [
            Row(
                date_id=1,
                full_date=datetime.date(2024, 3, 2),
                year=2024,
                month_number=3,
                month_name="March",
                is_weekend=True,
            ),
            Row(
                date_id=2,
                full_date=datetime.date(2024, 4, 3),
                year=2024,
                month_number=4,
                month_name="April",
                is_weekend=False,
            ),
        ]
    )
    return dim_category, dim_venue, dim_date


def test_by_category_columns_and_price_avg_source(spark):
    fact = _fact(spark)
    dim_category, _, _ = _dims(spark)
    df = kpis.kpi_events_by_category(fact, dim_category)
    # kpi_queries.sql:11-26 — exact column order.
    assert df.columns == [
        "category_name",
        "subcategory",
        "total_events",
        "events_on_sale",
        "avg_ticket_price_eur",
        "cheapest_ticket_eur",
        "most_expensive_ticket",
    ]
    rows = {(r.category_name, r.subcategory): r for r in df.collect()}
    music = rows[("Music", "Rock")]
    assert music.total_events == 3  # event 5 is deleted
    assert music.events_on_sale == 1
    # AVG(price_avg) == 20.0; a price_min_eur-sourced avg would be 5.0.
    assert float(music.avg_ticket_price_eur) == 20.0
    assert float(music.cheapest_ticket_eur) == 5.0  # MIN(price_min_eur)
    assert float(music.most_expensive_ticket) == 40.0  # MAX(price_max)


def test_by_city_counts_distinct_venue_sk_not_name(spark):
    fact = _fact(spark)
    _, dim_venue, _ = _dims(spark)
    df = kpis.kpi_events_by_city(fact, dim_venue)
    # kpi_queries.sql:32-46 — no active_events column in this view.
    assert df.columns == [
        "city",
        "country",
        "total_events",
        "unique_venues",
        "avg_price_eur",
        "cancelled_events",
    ]
    rows = {(r.city, r.country): r for r in df.collect()}
    berlin = rows[("Berlin", "Germany")]
    # Events 1 (venue 1) and 2 (venue 2): same venue_name, two venue_sk.
    assert berlin.total_events == 2
    assert berlin.unique_venues == 2  # COUNT(DISTINCT venue_sk), sql:37
    assert float(berlin.avg_price_eur) == 20.0  # AVG(price_avg), sql:38
    munich = rows[("Munich", "Germany")]
    assert munich.cancelled_events == 1


def test_monthly_trend_has_active_events_and_price_avg(spark):
    fact = _fact(spark)
    _, _, dim_date = _dims(spark)
    df = kpis.kpi_monthly_trend(fact, dim_date)
    # kpi_queries.sql:52-67 — active_events lives HERE, in this position.
    assert df.columns == [
        "year",
        "month_number",
        "month_name",
        "total_events",
        "active_events",
        "avg_price_eur",
        "unique_venues",
    ]
    rows = {(r.year, r.month_number): r for r in df.collect()}
    march = rows[(2024, 3)]
    assert march.total_events == 2
    assert march.active_events == 1  # event 1 onsale; event 5 deleted
    assert float(march.avg_price_eur) == 20.0
    assert march.unique_venues == 2  # venue_sk 1 and 2
    april = rows[(2024, 4)]
    assert april.active_events == 1
    assert april.unique_venues == 1


def test_weekend_vs_weekday_price_avg_source(spark):
    fact = _fact(spark)
    _, _, dim_date = _dims(spark)
    df = kpis.kpi_weekend_vs_weekday(fact, dim_date)
    assert df.columns == [
        "day_type",
        "total_events",
        "avg_price_eur",
        "pct_of_total",
    ]
    rows = {r.day_type: r for r in df.collect()}
    assert rows["Weekend"].total_events == 2
    assert float(rows["Weekend"].avg_price_eur) == 20.0  # sql:77
    assert rows["Weekend"].pct_of_total == 50.0
    assert rows["Weekday"].pct_of_total == 50.0


def test_health_and_quality_view_columns(spark):
    """kpi_queries.sql:89-118 — column sets of the two ops views."""
    import datetime as dt

    runs = spark.createDataFrame(
        [
            Row(
                started_at=dt.datetime(2024, 3, 1, 6, 0, 0),
                finished_at=dt.datetime(2024, 3, 1, 6, 0, 30),
                source="csv",
                status="success",
                records_loaded=10,
            )
        ]
    )
    health = kpis.kpi_pipeline_health(runs)
    assert health.columns == [
        "run_date",
        "source",
        "total_runs",
        "successful_runs",
        "failed_runs",
        "total_records_loaded",
        "avg_duration_seconds",
    ]
    assert float(health.first().avg_duration_seconds) == 30.0

    qlog = spark.createDataFrame(
        [
            Row(
                check_name="null_event_names",
                table_name="raw.events",
                pass_rate=99.5,
                status="warning",
                checked_at=dt.datetime(2024, 3, 1, 7, 0, 0),
            )
        ]
    )
    dq = kpis.kpi_data_quality(qlog)
    assert dq.columns == [
        "check_name",
        "table_name",
        "avg_pass_rate",
        "times_failed",
        "times_warned",
        "last_checked",
    ]
    assert dq.first().times_warned == 1
