"""ORC source/sink — the other columnar format large warehouses hold
(Hive-lineage estates are ORC; parquet-native tools still must read
them). Spark's ORC reader is built in and gets the same pushdown/pruning
treatment as parquet, so supporting it is a format flag, not a new
engine path.

Kept deliberately thin: schema-on-read with an optional declared schema
(same rationale as the JSONL source — inference is an extra pass), and
a write helper so round-trip tests pin fidelity. Avro, by contrast,
needs the external spark-avro package, which this environment does not
ship — ``read_avro`` raises a clear error instead of half-working.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro needs the spark-avro package (not bundled with Spark, not
    present in this environment). Fail fast with the fix instead of a
    cryptic ClassNotFoundException mid-job."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - depends on environment
        raise NotImplementedError(
            "Avro requires the org.apache.spark:spark-avro package on the "
            "classpath (spark-submit --packages org.apache.spark:"
            f"spark-avro_2.13:<spark-version>); underlying error: {exc}"
        ) from exc
