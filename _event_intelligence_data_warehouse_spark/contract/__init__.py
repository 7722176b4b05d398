"""Driver-contract query registry.

Each entry pairs a PySpark implementation (``QUERIES[name](spark, sf_dir)``)
with an equivalent ANSI-SQL oracle (``ORACLES[name]``) that DuckDB runs on
the same parquet tables. The driver hash-compares them order-insensitively
with columns sorted by name, so the house rules are:

- alias every computed column identically on both sides;
- ROUND only DECIMAL-typed expressions (HALF_UP on both engines for the
  magnitudes involved), then cast to DOUBLE for a stable schema — never
  ROUND a raw double (Spark's BigDecimal round and DuckDB's scaled round
  disagree near ties);
- aggregate doubles by first casting to DECIMAL so sums are exact and
  independent of partition/accumulation order (testdata money columns are
  verified exact 2-decimal values);
- integer-ish computed columns are cast to BIGINT on both sides;
- raw timestamps pass through ``contract.load``'s ns->us truncation, and
  oracle SQL casts TIMESTAMP_NS to TIMESTAMP to match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def staging_dir(name: str, sf_dir: str) -> str:
    """Fixed per-(query, sf) scratch dir for streaming contract queries.

    Wiped on entry and (best-effort) at interpreter exit, so repeated
    bench/oracle/sweep runs reuse one path instead of leaking a fresh
    mkdtemp per invocation (round-1 ADVICE)."""
    import atexit
    import os
    import shutil
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "eidw_staging")
    base = os.path.join(
        root, f"{name}_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    if not getattr(staging_dir, "_atexit_registered", False):
        staging_dir._atexit_registered = True
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return base


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    for c in _NS_TS_COLS.get(table, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer `div` keeps full int64 precision (float division
            # would corrupt epoch-nanos beyond 2^53).
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


# Registration happens at import: each submodule decorates its queries.
from _event_intelligence_data_warehouse_spark.contract import (  # noqa: E402,F401
    analytics_queries,
    extension_queries,
    governance_queries,
    relational_queries,
    warehouse_queries,
)
