"""SparkSession factory.

Single place where execution-engine configuration lives so that tests,
``bench.py`` and the pipeline CLI all run with identical semantics.

Scale posture (100 TB design point):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast selection replace hand-tuned physical plans.
- Shuffle partitions default to the local core count for the test harness;
  on a real cluster this is overridden (``SPARK_SQL_SHUFFLE_PARTITIONS``) to
  ~2-3x total executor cores, and AQE coalesces downward.
- Arrow enabled so the few Pandas-UDF extension operators (similarity
  search, multimodal decode) move columnar batches, never pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "event-intelligence-dw",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    In local mode the shuffle partition count is pinned to the core count:
    tiny scale factors otherwise pay fixed per-partition scheduling cost for
    200 near-empty partitions. AQE still coalesces below that at runtime.
    """
    cpus = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", cpus)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Driver testdata parquet carries TIMESTAMP(NANOS); Spark has no
        # nanosecond type, so read as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Parquet scan tuning: 128 MiB splits keep task count sane at large
        # SF while still saturating local[32] on the bench inputs.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver's parquet tables as temp views named after the
    files (region, nation, ..., events, documents, embeddings)."""
    import glob
    import os as _os

    for path in sorted(glob.glob(_os.path.join(sf_dir, "*.parquet"))):
        name = _os.path.splitext(_os.path.basename(path))[0]
        spark.read.parquet(path).createOrReplaceTempView(name)
