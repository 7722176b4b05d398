"""JSONL (newline-delimited JSON) source and sharded export sink — the
lingua franca of LLM training corpora (one document object per line).

Read side: a native, parallel Spark text/JSON scan with a MANDATORY
schema. Schema inference on JSONL is a full extra pass over the data
(at 100 TB, a second 100 TB scan before the first real one) and can
silently widen types between batches; a declared schema makes the scan
single-pass and the contract stable. Corrupt lines are captured, not
dropped: PERMISSIVE mode routes them to ``_corrupt_record`` so a
pipeline can count/quarantine them (``split_corrupt``).

Write side: deterministic sharded export. Range-partition by the sort
key so shard N holds a contiguous, reproducible id range, sort within
partitions, and cap records per file — the layout downstream trainers
expect (stable shard membership across re-exports, bounded shard size
for shuffling/streaming loaders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema'd JSONL scan. The caller's schema is extended with the
    PERMISSIVE corrupt-record column so malformed lines surface as rows
    (NULL everywhere except ``_corrupt_record``) instead of vanishing."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt): clean rows lose the corrupt column; corrupt rows
    keep only the raw line for quarantine/inspection.

    The parsed frame is persisted (session cache registry) before the
    split: Spark forbids a query that references ONLY the corrupt column
    of a raw scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the persist
    also means the underlying JSON parse runs once for both branches."""
    from _event_intelligence_data_warehouse_spark import cache

    df = cache.persist(df)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, corrupt


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    *,
    order_col: str,
    n_shards: int,
    max_records_per_file: int | None = None,
) -> None:
    """Deterministic sharded JSONL export: ``n_shards`` range partitions
    of ``order_col`` (contiguous key ranges — shard membership is a
    function of the key, not of input partitioning), rows sorted within
    each shard, optional per-file record cap for bounded shard sizes.
    At scale the range exchange is the one shuffle an export costs; the
    write itself is embarrassingly parallel."""
    writer = (
        df.repartitionByRange(n_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.json(path)
