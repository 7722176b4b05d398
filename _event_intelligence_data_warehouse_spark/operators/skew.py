"""Skew-mitigation operators: salted two-phase aggregation and salted
replicate joins.

AQE's skew-join splitting (on in session.py) handles most runtime skew,
but two cases still need explicit salting at the 100 TB design point:

- *aggregation skew*: a groupBy where one key holds a large fraction of
  all rows funnels that key's rows into one reduce task. Salting splits
  the hot key across ``n_salt`` subtasks, partially aggregates, then
  re-aggregates the tiny salted partials — the second shuffle moves
  n_groups * n_salt rows, not data.
- *join skew on a mid-size build side*: too big to broadcast, hot keys on
  the probe side. Replicating the build side ``n_salt``× and giving each
  probe row a deterministic salt spreads each hot key over n_salt tasks.

Salts are deterministic (xxhash64 of a designated column, mod n_salt), so
results are reproducible and oracle-checkable — never ``rand()``, which
breaks retries (a re-executed task would re-salt differently) as well as
determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (partial_fn, final_fn) per re-aggregatable measure: the algebra that
# makes two-phase aggregation exact.
_REAGG = {
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def salt_column(salt_src: Column | str, n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt): xxhash64 of a high-cardinality
    column (an id, not the group key)."""
    c = F.col(salt_src) if isinstance(salt_src, str) else salt_src
    return F.pmod(F.xxhash64(c), F.lit(n_salt)).cast("int")


def salted_agg(
    df: DataFrame,
    group_keys: list[str],
    measures: dict[str, tuple[str, str]],
    *,
    salt_src: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``measures`` maps output alias -> (input column or '*', fn) with fn in
    {count, sum, min, max} — the decomposable aggregates. avg is expressed
    by the caller as sum/count of the outputs (exactly, not approximately).

    Phase 1 groups by (keys, salt) — the hot key fans out over n_salt
    reduce tasks; phase 2 re-aggregates the n_groups*n_salt partials.
    Spark's own partial aggregation gives map-side combining per task; the
    salt adds *reduce-side* parallelism per key, which partial aggregation
    cannot.
    """
    for alias, (_, fn) in measures.items():
        if fn not in _REAGG:
            raise ValueError(f"{alias}: '{fn}' is not re-aggregatable")
    salted = df.withColumn("_salt", salt_column(salt_src, n_salt))
    partial = salted.groupBy(*group_keys, "_salt").agg(
        *[
            _REAGG[fn][0](F.lit(1) if col == "*" else F.col(col)).alias(alias)
            for alias, (col, fn) in measures.items()
        ]
    )
    return partial.groupBy(*group_keys).agg(
        *[
            _REAGG[fn][1](F.col(alias)).alias(alias)
            for alias, (col, fn) in measures.items()
        ]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    *,
    salt_src: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the probe side gets a deterministic salt, the
    build side is replicated across all n_salt values (explode of a
    sequence — one projection, no shuffle), and the join key becomes
    (keys + salt). Each hot probe key now lands on n_salt tasks instead of
    one. Build-side cost: n_salt× rows shuffled — use only when the build
    side is too big to broadcast and the probe side is skewed."""
    salted_probe = probe.withColumn("_salt", salt_column(salt_src, n_salt))
    replicated = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return salted_probe.join(replicated, [*on, "_salt"], how).drop("_salt")


def key_skew_profile(
    df: DataFrame, key_cols: list[str], *, top_n: int = 20,
) -> DataFrame:
    """Shuffle-key skew profile: the ``top_n`` heaviest key values with
    exact row counts and corpus share in ppm — the measurement that
    decides WHETHER a join/agg needs salting (and how many salts)
    before anyone pays for it. A key holding >> 1/parallelism of the
    rows is the straggler task at shuffle time.

    Output: (key..., n_rows, share_ppm, rnk), heaviest first; ties
    break on the key for a total, engine-stable order.

    Scale: one hash aggregate (map-side partial combine) over the key,
    a 1-row total broadcast, and a TakeOrdered top-N — the profile
    never materializes the full key histogram on the driver."""
    counts = df.groupBy(*key_cols).agg(
        F.count("*").cast("bigint").alias("n_rows")
    )
    total = counts.agg(
        F.sum("n_rows").cast("bigint").alias("_total")
    )
    keys = [F.col(c) for c in key_cols]
    ranked = (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "share_ppm",
            F.expr(
                "CAST((CAST(n_rows AS DECIMAL(38,0)) * 1000000) "
                "div _total AS BIGINT)"
            ),
        )
        .drop("_total")
        .orderBy(F.col("n_rows").desc(), *keys)
        .limit(top_n)
    )
    w = Window.orderBy(F.col("n_rows").desc(), *keys)
    return ranked.withColumn(
        "rnk", F.row_number().over(w).cast("bigint")
    )
