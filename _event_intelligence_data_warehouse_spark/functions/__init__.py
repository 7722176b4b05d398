"""Row-level scalar logic, all built from native ``pyspark.sql.functions``.

Nothing in this package is a Python UDF — every expression stays JVM-side
inside whole-stage codegen so Catalyst can push, prune and fold freely.
"""

from _event_intelligence_data_warehouse_spark.functions.cleanse import (  # noqa: F401
    default_fill,
    guarded_date,
    guarded_decimal,
    guarded_time,
    norm_text,
)
from _event_intelligence_data_warehouse_spark.functions.datetime_fns import (  # noqa: F401
    epoch_seconds_between,
    pg_day_number,
    weekday_name,
)
from _event_intelligence_data_warehouse_spark.functions.keys import (  # noqa: F401
    event_nk,
    price_avg_expr,
    price_to_eur,
    source_type_expr,
    venue_nk,
)
