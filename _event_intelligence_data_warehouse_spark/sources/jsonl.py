"""JSONL (newline-delimited JSON) source and sharded export sink — the
lingua franca of LLM training corpora (one document object per line).

Read side: a native, parallel Spark text/JSON scan with a MANDATORY
schema. Schema inference on JSONL is a full extra pass over the data
(at 100 TB, a second 100 TB scan before the first real one) and can
silently widen types between batches; a declared schema makes the scan
single-pass and the contract stable. Corrupt lines are captured, not
dropped: PERMISSIVE mode routes them to ``_corrupt_record`` so a
pipeline can count/quarantine them (``split_corrupt``).

Write side: deterministic sharded export. Shard membership is a PURE
FUNCTION of the sort key — ``shard = pmod(xxhash64(key), n_shards)`` —
written as ``shard=N/`` directories, rows sorted within each shard,
optional per-file record cap. Byte-stable across re-exports regardless
of input partitioning: the layout downstream trainers expect. (A
range-partitioned mode also exists for contiguous key ranges, but its
boundaries come from Spark's sampling and are NOT guaranteed stable
between runs — it trades reproducibility for range locality.)
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


SHARD_COL = "shard"


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    *,
    order_col: str,
    n_shards: int,
    max_records_per_file: int | None = None,
    contiguous_ranges: bool = False,
    shard_of=None,
) -> None:
    """Deterministic sharded JSONL export.

    Default mode: ``shard = pmod(xxhash64(order_col), n_shards)`` — a
    pure function of the key, so shard membership is byte-stable across
    re-exports, input repartitioning, and incremental re-runs. Shards
    land as ``shard=N/`` directories (rows sorted by ``order_col``
    within each), with an optional per-file record cap. One hash
    exchange is the only shuffle; the write is embarrassingly parallel.

    ``contiguous_ranges=True`` instead range-partitions on the key so
    shard N holds a contiguous key range (part files at the root, no
    ``shard=`` dirs). Range boundaries come from Spark's reservoir
    sampling, which is documented as potentially inconsistent between
    runs — membership near boundaries is NOT a pure key function, so
    use this only when range locality matters more than reproducible
    shard membership.

    ``shard_of`` overrides the default xxhash64 shard function with a
    caller-supplied integer Column (still reduced mod ``n_shards``):
    xxhash64 is the fastest choice but Spark-specific, so a release
    whose shard membership must be auditable by OTHER engines (e.g. a
    cross-engine provenance check over the export manifest) passes an
    engine-portable hash expression instead."""
    if contiguous_ranges:
        writer = (
            df.repartitionByRange(n_shards, F.col(order_col))
            .sortWithinPartitions(order_col)
            .write.mode("overwrite")
        )
        if max_records_per_file is not None:
            writer = writer.option(
                "maxRecordsPerFile", max_records_per_file
            )
        writer.json(path)
        return
    shard = F.pmod(
        F.xxhash64(F.col(order_col)) if shard_of is None else shard_of,
        F.lit(n_shards),
    ).cast("int")
    writer = (
        df.withColumn(SHARD_COL, shard)
        .repartition(n_shards, F.col(SHARD_COL))
        .sortWithinPartitions(SHARD_COL, order_col)
        .write.mode("overwrite")
        .partitionBy(SHARD_COL)
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.json(path)


def export_report(spark, path: str) -> DataFrame:
    """Dataset-release report over a sharded JSONL export: one row per
    part file with (file, n_records, n_bytes) plus the shard value when
    the layout is ``shard=N/`` — the manifest a consumer checks before
    trusting a release. Scales: record counts come from one distributed
    text scan grouped by ``input_file_name()`` (never a driver-side
    read); byte sizes from the file listing."""
    import os

    from pyspark.sql import functions as F

    df = spark.read.text(path)
    counts = (
        df.groupBy(F.input_file_name().alias("file_uri"))
        .agg(F.count("*").cast("bigint").alias("n_records"))
    )
    sizes = []
    for root, _dirs, fs in os.walk(path):
        for f in fs:
            if f.startswith(("part-", "_")) and not f.endswith(".crc"):
                if f.startswith("_"):
                    continue
                p = os.path.join(root, f)
                sizes.append((
                    "file:///" + os.path.abspath(p).lstrip("/"),
                    os.path.getsize(p),
                ))
    sz = spark.createDataFrame(sizes, "file_uri string, n_bytes long")
    shard = F.regexp_extract(F.col("file_uri"), r"shard=(\d+)", 1)
    return (
        counts.join(sz, "file_uri", "left")
        .select(
            F.regexp_extract(F.col("file_uri"), r"([^/]+)$", 1)
            .alias("file"),
            F.when(shard != "", shard.cast("long")).alias("shard"),
            "n_records",
            "n_bytes",
        )
    )
