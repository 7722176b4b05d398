"""Date/time expressions preserving the reference's Postgres conventions
(SURVEY.md §2.3, D1-D8)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pg_day_number(c: Column | str) -> Column:
    """Postgres ``EXTRACT(DOW)``: 0=Sunday..6=Saturday
    (transform_events.sql:88). Spark's dayofweek is 1=Sunday..7=Saturday,
    hence the -1."""
    return (F.dayofweek(_col(c)) - F.lit(1)).cast("smallint")


def weekday_name(c: Column | str) -> Column:
    """``TO_CHAR(d, 'Day')`` minus Postgres' blank padding
    (transform_events.sql:87; decision SURVEY.md §2.3 D1)."""
    return F.date_format(_col(c), "EEEE")


def is_weekend(c: Column | str) -> Column:
    """``EXTRACT(DOW) IN (0, 6)`` (transform_events.sql:94)."""
    return F.dayofweek(_col(c)).isin(1, 7)


def epoch_seconds_between(start: Column | str, end: Column | str) -> Column:
    """``EXTRACT(EPOCH FROM (end - start))`` (kpi_queries.sql:97-99)."""
    return _col(end).cast("long") - _col(start).cast("long")
