"""As-of join: match each left row to the latest right row whose time is
at-or-before the left row's time, per key — the temporal join every
event/run, trade/quote, metric/deploy pairing needs.

Spark has no native ASOF JOIN; a naive range join (t_r <= t_l, pick max)
explodes to O(|L|·|R|) per key. This implementation is the linear
union-sort trick: tag both sides, union on (key, time), and carry the
last right-side payload forward with a last-non-null window — one shuffle
on the key, one sort within partitions, state O(1) per row. This is the
same plan shape Flink/kdb use for temporal joins, expressed in stock
Spark windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
) -> DataFrame:
    """Left as-of join. Output: every ``left`` row plus every ``right``
    column (NULL when no right row precedes it).

    Ties (right time == left time) match, like DuckDB/pandas ``asof``
    with direction='backward': the union sorts right-side rows before
    left-side rows at equal timestamps (_side 0 < 1)."""
    rcols = [c for c in right.columns if c not in (right_on, right_by)]
    r = right.select(
        F.col(right_by).alias("_key"),
        F.col(right_on).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(F.col(right_on), *rcols).alias("_payload"),
    )
    l = left.select(  # noqa: E741
        F.col(left_by).alias("_key"),
        F.col(left_on).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *left.columns,
    )
    unioned = r.select(
        "_key", "_t", "_side", "_payload",
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
    ).unionByName(l)
    w = (
        Window.partitionBy("_key")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        *left.columns,
        *[F.col(f"_asof.{right_on}").alias(right_on)],
        *[F.col(f"_asof.{c}").alias(c) for c in rcols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof(direction='nearest')``
    shape): each left row matches the right row with the SMALLEST
    absolute time gap — before or after — optionally capped by
    ``tolerance_seconds``; equidistant candidates resolve to the
    earlier (backward) one. Output columns mirror :func:`asof_join`.

    Built as two linear as-of passes (backward, plus forward via
    time negation — "latest -t_r <= -t_l" IS "earliest t_r >= t_l"),
    then a per-row arbitration — still one shuffle per pass, no range
    join, state O(1) per row. The two passes recombine by NULL-SAFE
    equality on the full left row (``<=>`` — still a hash-joinable
    equi-key), so left rows with NULL payload fields are kept, matching
    pandas; ``left`` rows must be unique (give them an id column if
    they are not).
    """
    rcols = [c for c in right.columns if c not in (right_on, right_by)]
    back = asof_join(
        left, right, left_on=left_on, right_on=right_on,
        left_by=left_by, right_by=right_by,
    ).withColumnRenamed(right_on, "_b_t")
    for c in rcols:
        back = back.withColumnRenamed(c, f"_b_{c}")
    neg = "__neg_t"
    l_neg = left.withColumn(neg, -F.col(left_on).cast("long"))
    r_neg = right.withColumn(neg, -F.col(right_on).cast("long"))
    # The negation trick must keep the ORIGINAL right time column as
    # payload while the negated clock drives the as-of ordering.
    r2 = r_neg.select(
        F.col(right_by), F.col(neg).alias("_nt"), F.col(right_on), *rcols
    )
    fwd = asof_join(
        l_neg, r2, left_on=neg, right_on="_nt",
        left_by=left_by, right_by=right_by,
    ).drop("_nt", neg).withColumnRenamed(right_on, "_f_t")
    for c in rcols:
        fwd = fwd.withColumnRenamed(c, f"_f_{c}")
    cond = None
    for c in left.columns:
        e = back[c].eqNullSafe(fwd[c])
        cond = e if cond is None else cond & e
    joined = back.join(fwd, cond, "inner").select(
        *[back[c] for c in left.columns],
        back["_b_t"], *[back[f"_b_{c}"] for c in rcols],
        fwd["_f_t"], *[fwd[f"_f_{c}"] for c in rcols],
    )
    lt = F.col(left_on).cast("long")
    bgap = lt - F.col("_b_t").cast("long")
    fgap = F.col("_f_t").cast("long") - lt
    if tolerance_seconds is not None:
        b_ok = F.col("_b_t").isNotNull() & (bgap <= tolerance_seconds)
        f_ok = F.col("_f_t").isNotNull() & (fgap <= tolerance_seconds)
    else:
        b_ok = F.col("_b_t").isNotNull()
        f_ok = F.col("_f_t").isNotNull()
    # backward wins ties (and is preferred when both are in tolerance
    # at equal distance) — pandas-compatible determinism
    use_back = b_ok & (~f_ok | (bgap <= fgap))
    picked = [
        F.when(use_back, F.col("_b_t"))
        .when(f_ok, F.col("_f_t"))
        .alias(right_on)
    ] + [
        F.when(use_back, F.col(f"_b_{c}"))
        .when(f_ok, F.col(f"_f_{c}"))
        .alias(c)
        for c in rcols
    ]
    return joined.select(*left.columns, *picked)
