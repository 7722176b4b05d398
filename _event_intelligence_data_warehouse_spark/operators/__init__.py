"""Generic engine operators.

Pure DataFrame -> DataFrame programs (no planner hooks needed — SURVEY.md
§4): upsert/merge, SCD2 versioning, dedup families, similarity search,
text analysis, multimodal plumbing. Each is designed partition-parallel
with no driver-side collects, so the same code runs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin a frame across the session's cores IFF its current
    plan yields fewer partitions than cores (r13, guide §2.6). For
    operators whose per-row work is AMPLIFIED far past the input bytes
    (B-fold bootstrap replicates, per-row d^2/2 covariance products),
    the amplified projection executes in the stage that reads the
    input, so a small input on a wide machine runs the whole pass on a
    couple of scan-split tasks while the rest of the box idles. The
    conditional keeps it scale-safe: a production-scale input already
    carries >= cores splits and passes through untouched, so nothing
    corpus-sized is ever shuffled for this. Row placement must not
    affect the caller's result (all in-repo callers follow with a
    commutative aggregate over deterministic per-row functions)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
