"""Session-owned cache registry.

Operators that persist an intermediate (minhash signatures, n-gram sets,
projected fact FKs) return *lazy* plans, so the cache must outlive the
operator call — unpersisting inside the operator would defeat it before
the caller ever runs an action. Round 1 left those caches live forever;
in a long-lived session repeated invocations accumulated blocks until
LRU pressure.

The contract: operators register persists here via :func:`persist`, and
whoever drives materialization (bench.py, tools/check_oracle.py, the
pipeline CLI, tests) calls :func:`release_all` once results are
collected/written. Idempotent and safe to call any time — Spark
recomputes if a released plan is re-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_OWNED: list[DataFrame] = []


def persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for later :func:`release_all`."""
    _OWNED.append(df.persist())
    return df


def release_all() -> None:
    """Unpersist every registered frame (newest first)."""
    while _OWNED:
        try:
            _OWNED.pop().unpersist()
        except Exception:
            pass  # session already stopped — nothing to free
