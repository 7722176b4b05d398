"""Seeded synthetic event generator (SURVEY.md §2.1 S6).

Replicates the domains of the reference's fixture factory
(/root/reference/ingestion/csv_ingestor.py:37-82): 500 events across 5
categories and 6 German cities with fixed venues, near-future dates,
uniform prices, weighted statuses — but fully deterministic (seeded; the
reference is unseeded) and generated distributed via ``spark.range`` +
column expressions, so it scales to arbitrarily many rows without driver
memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CATEGORIES = ["Music", "Sports", "Arts & Theatre", "Comedy", "Family"]
CITIES = [
    # (city, venue, lat, lon)
    ("Berlin", "Mercedes-Benz Arena", 52.5075, 13.4437),
    ("Munich", "Olympiahalle", 48.1756, 11.5467),
    ("Hamburg", "Barclays Arena", 53.5886, 9.8989),
    ("Frankfurt", "Festhalle", 50.1109, 8.6508),
    ("Cologne", "Lanxess Arena", 50.9384, 6.9830),
    ("Leipzig", "Quarterback Arena", 51.3397, 12.3731),
]
STATUSES = ["onsale", "onsale", "onsale", "offsale", "cancelled"]


def _pick(options: list, idx_col) -> object:
    """Deterministic element pick from a literal array by an index column."""
    arr = F.array(*[F.lit(x) for x in options])
    return F.element_at(arr, (idx_col % len(options) + 1).cast("int"))


def generate_sample_events(
    spark: SparkSession,
    n: int = 500,
    *,
    seed: int = 42,
    base_date: str = "2026-01-01",
    dirty: bool = False,
) -> DataFrame:
    """CSV-contract-shaped DataFrame (16 columns, all strings like a read
    CSV would land them). ``dirty=True`` injects the FIXTURES.md defect mix
    (~3% null names, ~8% bad dates, ~2% inverted prices, ~1% duplicate ids,
    empty categories, mixed case) at deterministic row positions, for
    quality-check and cleanse tests.
    """
    df = spark.range(n).withColumnRenamed("id", "i")
    # Deterministic pseudo-randomness: hash the row index with the seed so
    # the generator is reproducible and embarrassingly parallel.
    h = F.abs(F.xxhash64(F.col("i"), F.lit(seed)))
    h2 = F.abs(F.xxhash64(F.col("i"), F.lit(seed + 1)))
    h3 = F.abs(F.xxhash64(F.col("i"), F.lit(seed + 2)))

    city_idx = h % len(CITIES)
    cat = _pick(CATEGORIES, h2)
    price_min = (F.lit(15.0) + (h % 6500) / 100.0)
    price_max = price_min + F.lit(10.0) + (h2 % 9000) / 100.0

    df = df.select(
        F.concat(F.lit("MOCK_"), F.lpad(F.col("i").cast("string"), 5, "0")).alias(
            "event_id"
        ),
        F.concat(F.lit("Event "), F.col("i").cast("string"), F.lit(" - "), cat,
                 F.lit(" Night")).alias("event_name"),
        F.date_format(
            F.date_add(F.to_date(F.lit(base_date)), ((h3 % 180) + 1).cast("int")),
            "yyyy-MM-dd",
        ).alias("event_date"),
        F.concat(F.lpad((F.lit(18) + h3 % 5).cast("string"), 2, "0"),
                 F.lit(":00:00")).alias("event_time"),
        _pick([c[1] for c in CITIES], city_idx).alias("venue_name"),
        _pick([c[0] for c in CITIES], city_idx).alias("venue_city"),
        F.lit("Germany").alias("venue_country"),
        F.format_number(
            _pick([c[2] for c in CITIES], city_idx) + ((h2 % 2000) - 1000) / 1e6, 7
        ).alias("venue_lat"),
        F.format_number(
            _pick([c[3] for c in CITIES], city_idx) + ((h3 % 2000) - 1000) / 1e6, 7
        ).alias("venue_lon"),
        cat.alias("category"),
        F.lit("General").alias("subcategory"),
        F.format_number(price_min, 2).alias("price_min"),
        F.format_number(price_max, 2).alias("price_max"),
        F.lit("EUR").alias("currency"),
        F.concat(F.lit("https://example.com/event/"), F.col("i").cast("string")).alias(
            "url"
        ),
        _pick(STATUSES, h).alias("status"),
        F.col("i"),
    )

    if dirty:
        i = F.col("i")
        df = (
            df.withColumn(
                "event_name", F.when(i % 33 == 0, None).otherwise(F.col("event_name"))
            )
            .withColumn(
                "event_date",
                F.when(i % 13 == 1, F.lit("13/01/2026"))
                .when(i % 97 == 2, F.lit(""))
                .otherwise(F.col("event_date")),
            )
            .withColumn(
                "price_min",
                F.when(i % 50 == 3, F.format_number(F.lit(999.99), 2)).otherwise(
                    F.col("price_min")
                ),
            )
            .withColumn(
                "category", F.when(i % 40 == 4, F.lit("  ")).otherwise(F.col("category"))
            )
            .withColumn(
                "venue_city",
                F.when(i % 7 == 5, F.upper(F.col("venue_city"))).otherwise(
                    F.col("venue_city")
                ),
            )
            .withColumn(
                "status",
                F.when(i % 11 == 6, F.upper(F.col("status"))).otherwise(F.col("status")),
            )
            .withColumn(
                "price_max",
                F.when(i % 61 == 7, F.lit("N/A")).otherwise(F.col("price_max")),
            )
            # ~1% duplicated event ids (collide i with i-1).
            .withColumn(
                "event_id",
                F.when(
                    i % 100 == 99,
                    F.concat(F.lit("MOCK_"),
                             F.lpad((i - 1).cast("string"), 5, "0")),
                ).otherwise(F.col("event_id")),
            )
        )

    # Remove comma thousand-separators format_number adds (prices < 1000 and
    # lat/lon are unaffected, but stay safe), then drop the index helper.
    for c in ("price_min", "price_max", "venue_lat", "venue_lon"):
        df = df.withColumn(c, F.regexp_replace(F.col(c), ",", ""))
    return df.drop("i")
