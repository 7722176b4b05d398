"""Deterministic sampling / splitting operators for training-data
pipelines: hash-bucket sampling, stratified sampling, train/holdout
splits, and per-group top-k selection.

Scale design: every operator here is a stateless projection or a single
window — no driver-side randomness, no collects. Determinism comes from
md5-derived buckets (engine-portable, so the DuckDB oracle reproduces the
exact row set), which also makes samples STABLE across runs and across
cluster sizes — the property `rand()`-based sampling loses the moment a
partition count changes. At 100 TB the hash-bucket predicate pushes into
the scan like any other filter; nothing shuffles until the caller asks
for grouping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 100


def hash_bucket(c: Column | str, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): first 8 hex chars of
    md5(value) as an int, mod buckets. Portable across engines (DuckDB:
    ``CAST(('0x' || substr(md5(v), 1, 8)) AS BIGINT) % buckets``).
    Reuses the single portability-critical md5-prefix hash definition
    (operators.text.token_hash) rather than restating it."""
    from _event_intelligence_data_warehouse_spark.operators.text import (
        token_hash,
    )

    col = F.col(c) if isinstance(c, str) else c
    return (token_hash(col.cast("string")) % buckets).alias("bucket")


def hash_sample(
    df: DataFrame, id_col: str, pct: int, buckets: int = HASH_BUCKETS
) -> DataFrame:
    """Keep rows whose id hash-bucket < pct — a deterministic ``pct``%
    sample. A pure filter: prunes at scan time, stable under re-runs,
    repartitioning, and incremental appends (a row's membership never
    changes)."""
    return df.filter(hash_bucket(id_col, buckets) < pct)


def stratified_hash_sample(
    df: DataFrame, strata_col: str, id_col: str, pct: int,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """~pct% of EACH stratum: bucket on (stratum, id) jointly so small
    strata are sampled at the same rate as large ones. Still a stateless
    filter — stratification costs nothing (no per-stratum pass). NULL
    strata coalesce to '' so they form one sampled stratum (SQL mirror:
    ``coalesce(s, '') || '|' || id`` — plain ``||`` would NULL-propagate
    and silently drop every NULL-stratum row)."""
    key = F.concat(
        F.coalesce(F.col(strata_col).cast("string"), F.lit("")),
        F.lit("|"),
        F.col(id_col).cast("string"),
    )
    return df.filter(hash_bucket(key, buckets) < pct)


def train_holdout_split(
    df: DataFrame, id_col: str, holdout_pct: int,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Label every row 'train' or 'holdout' by id hash-bucket. The split
    is a FUNCTION of the id: new data lands on the correct side without
    coordination, and no row can leak across sides between runs."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(id_col, buckets) < holdout_pct, F.lit("holdout")
        ).otherwise(F.lit("train")),
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group (e.g. k highest-quality documents per source
    for a curation pipeline): one window on the group key. Deterministic
    via the explicit tiebreak column. Spark executes this as a partial
    top-k within each shuffle partition (rank <= k prunes before the
    final sort at sink time)."""
    order = F.desc(order_col) if descending else F.asc(order_col)
    tiebreak = [F.asc(tiebreak_col)] if tiebreak_col else []
    w = Window.partitionBy(*group_cols).orderBy(order, *tiebreak)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def weighted_hash_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    base_pct: int,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Deterministic WEIGHTED sampling: a row's keep probability is
    base_pct% scaled by its weight in [0, 1] — keep iff
    hash_bucket(id) < floor(base_pct * weight). The curation move that
    upsamples high-quality documents and suppresses low-quality ones
    without an RNG: membership is a pure function of (id, weight), so
    the sample is stable across runs/repartitions and reproducible by
    the oracle.

    Still a stateless filter (threshold is per-row column arithmetic);
    floor of an exact-operand product keeps the cut engine-portable."""
    threshold = F.floor(
        F.lit(float(base_pct)) * F.col(weight_col).cast("double")
    )
    return df.filter(hash_bucket(id_col, buckets) < threshold)
