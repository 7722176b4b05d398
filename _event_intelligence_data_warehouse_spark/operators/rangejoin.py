"""Range (interval) join: match rows whose point value falls inside an
interval — price bands, time ranges, geo buckets.

A naive formulation (`lo <= v AND v < hi` with no equi-key) compiles to
BroadcastNestedLoopJoin: O(|points|·|intervals|) comparisons, which is the
classic 100 TB cliff. This implementation bins the value domain: each
interval explodes into the bins it overlaps (`sequence`), each point maps
to exactly one bin, and the join becomes an equi-join on the bin id with
the residual range predicate evaluated only inside the bin — O(points +
intervals·bins_per_interval + true_matches). Bin width should be on the
order of the median interval width: too fine multiplies the interval
replication, too coarse leaves many false candidates to the residual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with lo <= point < hi.
    Output: point columns + interval columns (names must not collide).
    ``bin_width`` buckets the value domain; correctness is independent of
    it (the residual predicate is exact), only performance depends."""
    p = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                # hi is exclusive: the hi-boundary bin is needed only when
                # hi does not land exactly on a bin edge
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / F.lit(bin_width)
                ).cast("long"),
            )
        ),
    )
    joined = p.join(
        iv,
        (p["_bin"] == iv["_bin"])
        & (F.col(lo_col) <= F.col(point_col))
        & (F.col(point_col) < F.col(hi_col)),
        how,
    )
    return joined.drop("_bin")
