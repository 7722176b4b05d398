"""Staging cleanse expressions (SURVEY.md §2.2, P2-P10).

Semantics match the reference staging view
(/root/reference/transform/transform_events.sql:53-75): regex-guarded casts
that yield NULL instead of erroring, trim/case normalization, and
default-filling of empty categories.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
TIME_RE = r"^\d{2}:\d{2}"
DECIMAL_RE = r"^\d+(\.\d+)?$"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def guarded_date(c: Column | str) -> Column:
    """``CASE WHEN s ~ '^\\d{4}-\\d{2}-\\d{2}$' THEN s::DATE ELSE NULL``
    (transform_events.sql:59). The regex guard keeps malformed strings from
    failing the cast; Spark's ANSI-off to_date would also NULL, but the
    explicit guard matches reference semantics and documents intent."""
    c = _col(c)
    return F.when(c.rlike(DATE_RE), F.to_date(c)).otherwise(F.lit(None).cast("date"))


def guarded_time(c: Column | str) -> Column:
    """Validated ``HH:mm[:ss]`` kept as a string — Spark has no TIME type
    (transform_events.sql:60; decision SURVEY.md §1.2)."""
    c = _col(c)
    return F.when(c.rlike(TIME_RE), c).otherwise(F.lit(None).cast("string"))


def guarded_decimal(c: Column | str, precision: int = 10, scale: int = 2) -> Column:
    """``CASE WHEN s ~ '^\\d+(\\.\\d+)?$' THEN s::NUMERIC(10,2) END``
    (transform_events.sql:68-69)."""
    c = _col(c)
    return F.when(c.rlike(DECIMAL_RE), c.cast(DecimalType(precision, scale)))


def norm_text(c: Column | str, mode: str = "none") -> Column:
    """TRIM plus optional case normalization (transform_events.sql:58-72)."""
    out = F.trim(_col(c))
    if mode == "initcap":
        out = F.initcap(out)
    elif mode == "upper":
        out = F.upper(out)
    elif mode == "lower":
        out = F.lower(out)
    elif mode != "none":
        raise ValueError(f"unknown mode {mode!r}")
    return out


def default_fill(c: Column | str, default: str) -> Column:
    """``COALESCE(NULLIF(TRIM(c), ''), default)``
    (transform_events.sql:66-67)."""
    t = F.trim(_col(c))
    return F.coalesce(F.nullif(t, F.lit("")), F.lit(default))
