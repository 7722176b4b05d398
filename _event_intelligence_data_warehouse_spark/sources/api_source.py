"""REST API source: paginated fetch + declarative JSON flatten
(SURVEY.md §2.1 S1-S4).

The reference drills nested Ticketmaster JSON with Python dict access on
the driver (/root/reference/ingestion/api_ingestor.py:60-92). Here the
payloads land as JSON strings and the flatten is a *Spark-side*
``from_json`` + nested projection — null-safe by construction (missing
paths yield NULL), vectorized, and it scales to any payload volume because
parsing runs on executors, not the driver.

The HTTP fetch itself is driver-side (single-digit pages; no parallelism
win) and gated behind an import-try so the engine works offline.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark import schemas

API_URL = "https://app.ticketmaster.com/discovery/v2/events.json"


def flatten_tm_payloads(payloads: DataFrame, col: str = "raw_payload") -> DataFrame:
    """JSON payload column -> CSV-contract columns.

    Path-for-path port of the reference's ``parse_event``
    (api_ingestor.py:60-92): first venue, first classification, first price
    range, start date/time, status code, lat/lon strings.
    """
    ev = F.from_json(F.col(col), schemas.TM_EVENT)
    venue = F.element_at(ev["_embedded"]["venues"], 1)
    cls = F.element_at(ev["classifications"], 1)
    price = F.element_at(ev["priceRanges"], 1)

    return payloads.select(
        ev["id"].alias("event_id"),
        ev["name"].alias("event_name"),
        ev["dates"]["start"]["localDate"].alias("event_date"),
        ev["dates"]["start"]["localTime"].alias("event_time"),
        venue["name"].alias("venue_name"),
        venue["city"]["name"].alias("venue_city"),
        venue["country"]["name"].alias("venue_country"),
        venue["location"]["latitude"].alias("venue_lat"),
        venue["location"]["longitude"].alias("venue_lon"),
        cls["segment"]["name"].alias("category"),
        cls["genre"]["name"].alias("subcategory"),
        price["min"].cast("string").alias("price_min"),
        price["max"].cast("string").alias("price_max"),
        price["currency"].alias("currency"),
        ev["url"].alias("url"),
        ev["dates"]["status"]["code"].alias("status"),
        F.col(col).alias("raw_payload"),
    )


def fetch_event_pages(
    api_key: str,
    *,
    country_code: str = "DE",
    page_size: int = 100,
    max_pages: int = 5,
    timeout: int = 15,
) -> Iterator[list[str]]:
    """Yield per-page lists of raw event JSON strings.

    Control flow mirrors the reference (api_ingestor.py:46-58,134-151):
    sorted ``date,asc``, early-stop on empty page or last page, 3 retries
    with exponential backoff per request.
    """
    try:
        import requests
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError("requests not available; use offline sources") from exc

    import time

    for page in range(max_pages):
        for attempt in range(3):
            try:
                resp = requests.get(
                    API_URL,
                    params={
                        "apikey": api_key,
                        "countryCode": country_code,
                        "size": page_size,
                        "page": page,
                        "sort": "date,asc",
                    },
                    timeout=timeout,
                )
                resp.raise_for_status()
                data = resp.json()
                break
            except Exception:  # pragma: no cover - network
                if attempt == 2:
                    raise
                time.sleep(min(2 * 2**attempt, 10))
        events = data.get("_embedded", {}).get("events", [])
        if not events:
            return
        yield [json.dumps(e) for e in events]
        page_info = data.get("page", {})
        if page >= page_info.get("totalPages", 1) - 1:
            return


def ingest_api(
    spark: SparkSession,
    api_key: str,
    **fetch_kwargs,
) -> DataFrame:
    """Fetch pages and return a CSV-contract DataFrame with payloads kept."""
    rows = [(p,) for page in fetch_event_pages(api_key, **fetch_kwargs) for p in page]
    payloads = spark.createDataFrame(rows, "raw_payload string")
    return flatten_tm_payloads(payloads)
