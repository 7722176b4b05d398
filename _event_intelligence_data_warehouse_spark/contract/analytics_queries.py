"""Analytical-surface queries beyond the reference's inventory: rollup /
grouping sets, pivot, as-of join, exact percentiles — the OLAP operators a
warehouse user reaches for next, each with a full DuckDB oracle.

House rules from contract/__init__ apply: decimal-domain aggregation,
BIGINT casts for integer-ish outputs, identical aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from _event_intelligence_data_warehouse_spark.contract import load, query

_DEC = "decimal(18,2)"


@query(
    "agg_rollup_status_priority",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals: (status, priority) -> status subtotals ->
    grand total in one pass (Spark Expand node, single shuffle). NULL
    grouping slots are normalized to 'ALL' so the oracle comparison is
    unambiguous (testdata columns are non-null)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "agg_cube_type_weekday",
    """
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS BIGINT), -1)
               AS weekday,
           COUNT(*) AS n_events
    FROM events
    GROUP BY CUBE (event_type, dayofweek(CAST(ts AS TIMESTAMP)))
    """,
)
def agg_cube_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, weekday): all four grouping-set combinations
    in one Expand pass. DuckDB dayofweek is 0=Sunday; Spark dayofweek is
    1=Sunday, so the engine subtracts 1 (the same Postgres-ism as the
    dim_date build, SURVEY.md D2)."""
    e = load(spark, sf_dir, "events")
    wd = (F.dayofweek("ts") - 1).cast("long")
    return (
        e.cube(F.col("event_type"), wd.alias("wd"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("wd", F.lit(-1)).alias("weekday"),
            "n_events",
        )
    )


@query(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): one output column per order status. Spark's
    .pivot() with explicit values compiles to the same single-pass
    conditional aggregation as the oracle's FILTER clauses — explicit
    values avoid the extra distinct-collect pass a valueless pivot runs."""
    o = load(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast(_DEC)).alias("total"),
        )
    )
    return p.select(
        "o_orderpriority",
        F.col("F_n").alias("f_orders"),
        F.col("O_n").alias("o_orders"),
        F.col("P_n").alias("p_orders"),
        F.col("F_total").cast("double").alias("f_total"),
    )


@query(
    "join_asof_event_run",
    """
    WITH runs AS (
        SELECT event_type AS source,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS run_started
        FROM events
        GROUP BY 1, 2
    ), ev AS (
        SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_id % 100 = 0
    )
    SELECT e.event_id,
           e.event_type,
           r.run_started AS active_run_started
    FROM ev e
    ASOF LEFT JOIN runs r
      ON e.event_type = r.source AND e.ts >= r.run_started
    """,
)
def join_asof_event_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each sampled event matched to the latest run of its
    source that started at-or-before the event. Spark lacks a native ASOF
    join; the engine expresses it as union + last-non-null window — one
    shuffle on (key, time), linear state, no range-join blowup. The
    oracle uses DuckDB's native ASOF JOIN."""
    from _event_intelligence_data_warehouse_spark.operators.asof import (
        asof_join,
    )

    e = load(spark, sf_dir, "events")
    runs = e.groupBy(
        F.col("event_type").alias("source"),
        F.date_trunc("hour", "ts").alias("run_started"),
    ).agg(F.count("*").alias("_n")).select("source", "run_started")
    ev = e.filter(F.col("event_id") % 100 == 0).select(
        "event_id", "event_type", "ts"
    )
    out = asof_join(
        ev,
        runs,
        left_on="ts",
        right_on="run_started",
        left_by="event_type",
        right_by="source",
    )
    return out.select(
        "event_id",
        "event_type",
        F.col("run_started").alias("active_run_started"),
    )


@query(
    "join_range_price_band",
    """
    WITH bands AS (
        SELECT band_id, CAST(band_id * 25 AS DOUBLE) AS lo,
               CAST((band_id + 1) * 25 + 5 AS DOUBLE) AS hi
        FROM (SELECT unnest(generate_series(0, 19)) AS band_id)
    )
    SELECT b.band_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT e.event_type) AS n_types
    FROM events e
    JOIN bands b
      ON b.lo <= CAST(e.value AS DOUBLE) AND CAST(e.value AS DOUBLE) < b.hi
    GROUP BY b.band_id
    """,
)
def join_range_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bin bucketing: 20 overlapping value bands (width 30,
    stride 25 — overlaps prove multi-match semantics) joined to events on
    containment. The bin equi-key turns Spark's would-be
    BroadcastNestedLoopJoin into a hash join + residual; the DuckDB
    oracle uses its native range join."""
    from _event_intelligence_data_warehouse_spark.operators.rangejoin import (
        range_join,
    )

    e = load(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    bands = spark.range(20).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 25).cast("double").alias("lo"),
        ((F.col("id") + 1) * 25 + 5).cast("double").alias("hi"),
    )
    joined = range_join(
        e, bands, point_col="v", lo_col="lo", hi_col="hi", bin_width=25.0
    )
    return joined.groupBy("band_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "agg_exact_percentiles",
    """
    WITH ranked AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY CAST(floor(value * 100 + 0.5)
                                                AS BIGINT),
                                           event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    )
    SELECT event_type,
           CAST(MAX(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                         THEN v END) AS DOUBLE) / 100.0 AS p50,
           CAST(MAX(CASE WHEN rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1
                         THEN v END) AS DOUBLE) / 100.0 AS p95
    FROM ranked
    GROUP BY event_type
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles per group: the element at sorted rank
    floor(p*(n-1))+1 — selection, not interpolation, because continuous
    quantile interpolation arithmetic is engine-specific while rank
    selection is pure integer logic. (The deterministic tie-break on
    event_id makes the picked element unique even among equal values.)
    Values quantize to integer CENTS (floor(x*100+0.5), identical IEEE
    both engines) rather than a double->DECIMAL cast — the r8
    timeseries_ohlc_hourly driver-red rounding-tie class (r9 sweep)."""
    e = load(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    w = Window.partitionBy("event_type").orderBy(v, "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        v.alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def pick(p: float):
        target = F.floor(F.lit(p) * (F.col("n") - 1)).cast("long") + 1
        return F.max(F.when(F.col("rn") == target, F.col("v")))

    return ranked.groupBy("event_type").agg(
        (pick(0.5).cast("double") / F.lit(100.0)).alias("p50"),
        (pick(0.95).cast("double") / F.lit(100.0)).alias("p95"),
    )


@query(
    "window_moving_avg_7d",
    """
    WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               COUNT(*) AS n_events,
               SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS day_value
        FROM events
        GROUP BY 1
    )
    SELECT day, n_events,
           CAST(AVG(n_events) OVER w AS DOUBLE) AS avg_events_7d,
           CAST(SUM(day_value) OVER w AS DOUBLE) / 100.0 AS sum_value_7d
    FROM daily
    WINDOW w AS (ORDER BY day - DATE '1970-01-01'
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-CALENDAR-day moving aggregates over the daily event
    series — a RANGE frame over the integer day number, so gap days
    shrink the window instead of silently stretching it (a ROWS frame
    would span >7 days across gaps). The frame runs over the AGGREGATED
    daily frame (≤ days rows), never the raw events; framed sums fold
    integer cents (floor(x*100+0.5), identical IEEE both engines — the
    r8 ohlc driver-red tie class, r9 sweep) until the final double."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .alias("day_value"),
    )
    day_num = F.datediff("day", F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(day_num).rangeBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        "n_events",
        F.avg("n_events").over(w).cast("double").alias("avg_events_7d"),
        (F.sum("day_value").over(w).cast("double") / F.lit(100.0))
        .alias("sum_value_7d"),
    )


@query(
    "window_day_over_day_delta",
    """
    WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1
    )
    SELECT day, n_events,
           n_events - lag(n_events) OVER (ORDER BY day) AS delta_prev_day,
           lead(n_events) OVER (ORDER BY day) - n_events AS delta_next_day
    FROM daily
    """,
)
def window_day_over_day_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag day-over-day deltas on the daily series (§2.8 ranking/
    offset functions). Single window ordered by day over the pre-
    aggregated frame."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n_events")
    )
    w = Window.orderBy("day")
    return daily.select(
        "day",
        "n_events",
        (F.col("n_events") - F.lag("n_events").over(w)).alias(
            "delta_prev_day"
        ),
        (F.lead("n_events").over(w) - F.col("n_events")).alias(
            "delta_next_day"
        ),
    )


@query(
    "agg_grouping_sets_mix",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def agg_grouping_sets_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent marginals ((status),
    (priority)) in ONE pass over orders (a single Expand + hash
    aggregate), where separate GROUP BYs would scan twice. Completes the
    rollup/cube/grouping-sets trio via the native DataFrame API
    (df.groupingSets, Spark 4)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_DEC))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "funnel_view_click_purchase",
    """
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view'
                        THEN CAST(ts AS TIMESTAMP) END) AS first_view,
               MIN(CASE WHEN event_type = 'click'
                        THEN CAST(ts AS TIMESTAMP) END) AS first_click,
               MIN(CASE WHEN event_type = 'purchase'
                        THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
        FROM events
        GROUP BY user_id
    ), staged AS (
        SELECT user_id,
               first_view IS NOT NULL AS s1,
               first_view IS NOT NULL AND first_click > first_view AS s2,
               first_view IS NOT NULL AND first_click > first_view
                   AND first_purchase > first_click AS s3
        FROM firsts
    )
    SELECT COUNT(*) AS n_users,
           COUNT(*) FILTER (WHERE s1) AS viewed,
           COUNT(*) FILTER (WHERE s2) AS viewed_then_clicked,
           COUNT(*) FILTER (WHERE s3) AS full_funnel,
           CAST(ROUND(CAST(100.0 * COUNT(*) FILTER (WHERE s3)
                AS DECIMAL(18,4))
                / nullif(COUNT(*) FILTER (WHERE s1), 0), 2) AS DOUBLE)
               AS conversion_pct
    FROM staged
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase) per user: one
    conditional-MIN aggregate per stage (a single groupBy over events —
    no self-joins, no window over raw events), then a one-row summary
    with the strict event-order predicate. The standard event-analytics
    conversion query, linear in events at any scale."""
    e = load(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = e.groupBy("user_id").agg(
        first_ts("view").alias("first_view"),
        first_ts("click").alias("first_click"),
        first_ts("purchase").alias("first_purchase"),
    )
    s1 = F.col("first_view").isNotNull()
    s2 = s1 & (F.col("first_click") > F.col("first_view"))
    s3 = s2 & (F.col("first_purchase") > F.col("first_click"))
    staged = firsts.select(
        s1.alias("s1"), s2.alias("s2"), s3.alias("s3")
    )
    full = F.count_if(F.col("s3"))
    viewed = F.count_if(F.col("s1"))
    return staged.agg(
        F.count("*").alias("n_users"),
        viewed.alias("viewed"),
        F.count_if(F.col("s2")).alias("viewed_then_clicked"),
        full.alias("full_funnel"),
        F.round(
            (F.lit(100.0) * full).cast("decimal(18,4)")
            / F.nullif(viewed, F.lit(0)),
            2,
        )
        .cast("double")
        .alias("conversion_pct"),
    )


@query(
    "window_rank_family",
    """
    WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               event_type,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
    )
    SELECT day, event_type, n_events,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           ntile(4)       OVER w AS quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY n_events DESC, day)
    """,
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family (rank / dense_rank / ntile /
    percent_rank — SURVEY §2.8 'built-in when needed') over the daily
    per-type event counts. One window per partition key; percent_rank's
    (r-1)/(n-1) division of ints is bit-identical across engines."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_events"), F.asc("day")
    )
    return daily.select(
        "day",
        "event_type",
        "n_events",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
    )


@query(
    "kpi_anomalous_days",
    """
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), stats AS (
        SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS m,
               CAST(SUM(n) AS DECIMAL(38,0)) AS s,
               SUM(CAST(n AS DECIMAL(38,0)) * n) AS s2
        FROM daily
    )
    SELECT d.day, d.n,
           ((d.n * t.m - t.s) * (d.n * t.m - t.s)
            > 9 * (t.m * t.s2 - t.s * t.s)) AS is_anomaly
    FROM daily d CROSS JOIN stats t
    """,
)
def kpi_anomalous_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly screen over the daily event counts: flag days more
    than 3 population standard deviations from the series mean. The
    z-test is evaluated in EXACT arithmetic —
    (n*m - s)^2 > 9*(m*s2 - s^2) is |x - mean| > 3*sigma cleared of
    divisions — so the verdict is bit-identical on every engine (float
    variance accumulates in engine-specific order and drifts in the last
    ulp; exact decimals cannot). DECIMAL(38,0), not BIGINT: at ~1e12
    events/day, sum(n^2) and the squared deviation overflow int64 while
    staying far inside 38 digits. One aggregate + a 1-row broadcast
    join; at 100 TB the daily rollup feeds this directly."""
    events = load(spark, sf_dir, "events")
    daily = events.groupBy(
        F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("bigint").alias("n"))
    dec = "decimal(38,0)"
    stats = daily.agg(
        F.count("*").cast(dec).alias("m"),
        F.sum("n").cast(dec).alias("s"),
        F.sum(F.col("n").cast(dec) * F.col("n")).alias("s2"),
    )
    dev = F.col("n").cast(dec) * F.col("m") - F.col("s")
    return daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n",
        (dev * dev > 9 * (F.col("m") * F.col("s2")
                          - F.col("s") * F.col("s"))).alias("is_anomaly"),
    )


@query(
    "join_asof_nearest_run",
    """
    WITH runs AS (
        SELECT event_type AS source,
               date_trunc('hour', CAST(ts AS TIMESTAMP)) AS run_started
        FROM events GROUP BY 1, 2
    ), ev AS (
        SELECT event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_id % 100 = 0
    ), back AS (
        SELECT e.event_id, e.event_type, e.ts,
               r.run_started AS b_t
        FROM ev e
        ASOF LEFT JOIN runs r
          ON e.event_type = r.source AND e.ts >= r.run_started
    ), fwd AS (
        SELECT e.event_id, r.run_started AS f_t
        FROM ev e
        ASOF LEFT JOIN runs r
          ON e.event_type = r.source AND e.ts <= r.run_started
    ), j AS (
        SELECT b.event_id, b.event_type, b.ts, b.b_t, f.f_t,
               DATE_DIFF('second', b.b_t, b.ts) AS bgap,
               DATE_DIFF('second', b.ts, f.f_t) AS fgap
        FROM back b JOIN fwd f USING (event_id)
    )
    SELECT event_id, event_type,
           CASE WHEN b_t IS NOT NULL AND bgap <= 1500
                     AND (f_t IS NULL OR fgap > 1500 OR bgap <= fgap)
                THEN b_t
                WHEN f_t IS NOT NULL AND fgap <= 1500 THEN f_t
           END AS nearest_run_started
    FROM j
    """,
)
def join_asof_nearest_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join with tolerance (pandas
    ``merge_asof(direction='nearest', tolerance=...)`` parity): each
    sampled event matches the run start CLOSEST in time — before or
    after — within 25 minutes, ties to the earlier side; events in the
    25-35-minute dead zone of their hour match nothing. Complements
    join_asof_event_run (backward-only): nearest needs BOTH linear
    passes (the forward one rides the same operator under time
    negation) plus per-row arbitration — still no range join.

    100 TB: two union-sort as-of passes, each one shuffle on
    (key, time) with O(1) window state, recombined by event identity.
    The oracle arbitrates DuckDB's native backward and forward ASOF
    joins with the same tie/tolerance rules."""
    from _event_intelligence_data_warehouse_spark.operators.asof import (
        asof_join_nearest,
    )

    e = load(spark, sf_dir, "events")
    runs = e.groupBy(
        F.col("event_type").alias("source"),
        F.date_trunc("hour", "ts").alias("run_started"),
    ).agg(F.count("*").alias("_n")).select("source", "run_started")
    ev = e.filter(F.col("event_id") % 100 == 0).select(
        "event_id", "event_type", "ts"
    )
    out = asof_join_nearest(
        ev, runs,
        left_on="ts", right_on="run_started",
        left_by="event_type", right_by="source",
        tolerance_seconds=1500,
    )
    return out.select(
        "event_id", "event_type",
        F.col("run_started").alias("nearest_run_started"),
    )
