"""Driver-contract query registry.

Each entry pairs a PySpark implementation (``QUERIES[name](spark, sf_dir)``)
with an equivalent ANSI-SQL oracle (``ORACLES[name]``) that DuckDB runs on
the same parquet tables. The driver hash-compares them order-insensitively
with columns sorted by name, so:

- every computed column is aliased identically on both sides;
- ROUND happens only on DECIMAL-typed expressions (HALF_UP on both
  engines for the values involved), then casts to DOUBLE for a stable
  schema — never ROUND on raw doubles (Spark's BigDecimal-based round and
  DuckDB's scaled-multiply round disagree near ties);
- aggregation over doubles first casts to DECIMAL so sums are exact and
  independent of partition/accumulation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.plans.staging import stage_events
from _event_intelligence_data_warehouse_spark.sources.events_adapter import events_as_raw

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable + its oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Testdata columns stored as parquet TIMESTAMP(NANOS): Spark 4 has no ns
# type, so they're read as long (nanosAsLong) and truncated to microsecond
# timestamps — exactly what DuckDB/Arrow do when they surface ns to Python.
_NS_TS_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for c in _NS_TS_COLS.get(table, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer `div` keeps full int64 precision (float division
            # would corrupt epoch-nanos beyond 2^53).
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


# --------------------------------------------------------------------------
# Flagship: events-by-category KPI over the full cleanse path.
# Exercises scan -> adapter projection -> staging cleanse (regex-guarded
# casts, trim/case, default-fill) -> conditional aggregation -> sort: the
# spine of the reference's kpi_events_by_category
# (/root/reference/dashboard/kpi_queries.sql:11-26).
# --------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
WITH raw AS (
    SELECT
        event_type                                    AS category,
        lower(CASE WHEN event_type = 'purchase' THEN 'onsale'
                   WHEN event_type = 'error' THEN 'cancelled'
                   ELSE 'offsale' END)                AS event_status,
        CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR)        AS price_min_s,
        CAST(CAST(value AS DECIMAL(10,2)) * CAST(1.5 AS DECIMAL(2,1))
             AS VARCHAR)                                     AS price_max_s
    FROM events
), stg AS (
    SELECT
        category,
        event_status,
        CASE WHEN regexp_matches(price_min_s, '^\\d+(\\.\\d+)?$')
             THEN CAST(price_min_s AS DECIMAL(10,2)) END AS price_min,
        CASE WHEN regexp_matches(price_max_s, '^\\d+(\\.\\d+)?$')
             THEN CAST(price_max_s AS DECIMAL(10,2)) END AS price_max
    FROM raw
)
SELECT
    category,
    COUNT(*)                                          AS total_events,
    COUNT(*) FILTER (WHERE event_status = 'onsale')   AS events_on_sale,
    CAST(ROUND(CAST(SUM(price_min) AS DECIMAL(28,8)) / COUNT(price_min), 2)
         AS DOUBLE)                                   AS avg_ticket_price_eur,
    CAST(MIN(price_min) AS DOUBLE)                    AS cheapest_ticket_eur,
    CAST(MAX(price_max) AS DOUBLE)                    AS most_expensive_ticket
FROM stg
GROUP BY category
"""


@query("kpi_events_by_category", _FLAGSHIP_ORACLE)
def kpi_events_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = events_as_raw(load(spark, sf_dir, "events"))
    stg = stage_events(raw)
    return (
        stg.groupBy("category")
        .agg(
            F.count("*").alias("total_events"),
            F.count_if(F.col("event_status") == "onsale").alias("events_on_sale"),
            F.round(
                F.sum("price_min").cast("decimal(28,8)") / F.count("price_min"), 2
            )
            .cast("double")
            .alias("avg_ticket_price_eur"),
            F.min("price_min").cast("double").alias("cheapest_ticket_eur"),
            F.max("price_max").cast("double").alias("most_expensive_ticket"),
        )
    )
