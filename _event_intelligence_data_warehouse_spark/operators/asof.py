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
