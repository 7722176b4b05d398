"""Natural-key, measure and mapping expressions (SURVEY.md §2.4, F1-F7)."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def venue_nk(name: Column | str, city: Column | str) -> Column:
    """``MD5(COALESCE(name,'') || COALESCE(city,''))`` — byte-identical hex
    to the reference (transform_events.sql:107, load_facts.sql:82)."""
    return F.md5(
        F.concat(
            F.coalesce(_col(name), F.lit("")),
            F.coalesce(_col(city), F.lit("")),
        )
    )


def event_nk(source: Column | str, raw_event_id: Column | str) -> Column:
    """``source || '_' || raw_event_id`` (load_facts.sql:36). Uses strict
    ``concat`` (NULL-propagating) to match Postgres ``||`` semantics rather
    than concat_ws's NULL-skipping."""
    return F.concat(_col(source), F.lit("_"), _col(raw_event_id))


def price_avg_expr(pmin: Column | str, pmax: Column | str) -> Column:
    """Canonical price_avg (load_facts.sql:58-62): ROUND((min+max)/2, 2)
    when both present, else whichever side exists."""
    pmin, pmax = _col(pmin), _col(pmax)
    # (min+max)*0.5 in the exact decimal domain (division would leave it and
    # tie-break differently across engines), then HALF_UP to cents.
    half = Decimal("0.5")
    return (
        F.when(
            pmin.isNotNull() & pmax.isNotNull(),
            F.round((pmin + pmax).cast(DecimalType(20, 2)) * F.lit(half), 2).cast(
                DecimalType(10, 2)
            ),
        )
        .otherwise(F.coalesce(pmin, pmax))
    )


def price_to_eur(price: Column | str, currency: Column | str) -> Column:
    """Hard-coded FX normalization (load_facts.sql:66-71). Kept inline for
    parity with the reference; a broadcast FX-dim join is the roadmap item."""
    price, currency = _col(price), _col(currency)
    return (
        F.when(currency == "EUR", price)
        .when(currency == "USD", F.round(price * 0.92, 2))
        .when(currency == "GBP", F.round(price * 1.17, 2))
        .otherwise(price)
        .cast(DecimalType(10, 2))
    )


def source_type_expr(source: Column | str) -> Column:
    """Source-name -> source-type mapping (transform_events.sql:132-136)."""
    s = _col(source)
    return (
        F.when(s == "ticketmaster", F.lit("api"))
        .when(s == "csv", F.lit("csv"))
        .otherwise(F.lit("unknown"))
    )
