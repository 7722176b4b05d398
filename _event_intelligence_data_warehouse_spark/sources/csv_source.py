"""CSV source (SURVEY.md §2.1 S5).

The reference funnels CSV through driver-side pandas
(/root/reference/ingestion/csv_ingestor.py:93-94); here it is a native,
parallel Spark scan with the declared 16-column contract — schema-on-read
stays all-strings so the staging cleanse owns every cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from _event_intelligence_data_warehouse_spark import schemas


def read_events_csv(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(schemas.CSV_EVENTS)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
