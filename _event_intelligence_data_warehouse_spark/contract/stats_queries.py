"""Statistical screens over the warehouse: OLS trend, Benford first-digit
audit, A/B conversion test, autocorrelation, exact group variance,
market-basket lift, the value-navigation window family, and the
recurrence smoothers (EWMA, CUSUM, Holt) built on the bounded
array-fold operator.

The reference's analytics surface stops at KPI aggregates
(dashboard/kpi_queries.sql:11-118); these add the inferential screens a
data-platform team runs on the same tables — all expressed as exact
integer/decimal arithmetic so the DuckDB oracle matches hash-for-hash:

- sums/aggregates stay int64 until a final widening to DECIMAL(38,0)
  (Spark) / HUGEINT (DuckDB, automatic for SUM) where products can pass
  2^63;
- signed divisions go through sign(x) * (ABS(x) DIV d): both engines
  truncate integer division toward zero (verified: -7//2 = -3 on both),
  but the abs/sign form keeps the intent explicit and survives either
  convention;
- irrational-valued statistics (slope, z^2, r^2) are reported as ppm
  integers — floor(1e6 * value) — never as libm floats.

Scale notes (100 TB): every screen aggregates to a CALENDAR- or
CATEGORY-bounded frame first (days x event types, 9 digits, 2 variants),
so the post-aggregation math touches at most a few thousand rows no
matter the input size; the heavy lifting is one map-side-combinable
groupBy per screen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.contract import load, query

_PPM = 1_000_000

# floor(1e6 * log10(1 + 1/d)) for d = 1..9; sums to exactly 1_000_000.
_BENFORD_PPM = {
    1: 301_030, 2: 176_091, 3: 124_939, 4: 96_910, 5: 79_181,
    6: 66_947, 7: 57_992, 8: 51_153, 9: 45_757,
}


def _signed_floordiv(num: str, den: str) -> str:
    """SQL fragment: sign(num) * (|num| DIV den) in DECIMAL(38,0) —
    exact on both engines regardless of their signed-division rounding.
    ``num``/``den`` are SQL expressions; den must be > 0."""
    return (
        f"CAST(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END"
        f" * (CAST(ABS({num}) AS DECIMAL(38,0)) DIV ({den})) AS BIGINT)"
    )


@query(
    "stats_regression_daily_trend",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
               COUNT(*) AS y
        FROM events
        GROUP BY 1, 2
    ), sums AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(x * y) AS HUGEINT) AS sxy,
               CAST(SUM(x * x) AS HUGEINT) AS sxx
        FROM daily
        GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END
                * (ABS(n * sxy - sx * sy) * 1000000
                   // (n * sxx - sx * sx)) AS BIGINT) AS slope_ppm,
           CAST(sy AS BIGINT) AS sum_y,
           CAST(sxy AS BIGINT) AS sum_xy
    FROM sums
    WHERE n >= 2
    """,
)
def stats_regression_daily_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-event-type OLS slope of daily volume over epoch-day index,
    in ppm events/day.

    Closed-form normal equations over exact integer sums — no iteration,
    no floats: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), floor-scaled to
    ppm with an explicit sign split. 100 TB: the daily rollup bounds the
    regression input to |days| x |event types| rows; everything after is
    driver-trivial arithmetic that still runs distributed.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast(
                "bigint"
            ).alias("x"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = (
        "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"
    )
    den = (
        "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"
    )
    return (
        sums.where(F.col("n") >= 2)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            F.expr(
                _signed_floordiv(f"({num}) * 1000000", den)
            ).alias("slope_ppm"),
            F.col("sy").cast("bigint").alias("sum_y"),
            F.col("sxy").cast("bigint").alias("sum_xy"),
        )
    )


@query(
    "stats_benford_screen",
    f"""
    WITH digits AS (
        SELECT CAST(LEFT(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                   * 100 AS BIGINT) AS VARCHAR), 1)
                    AS BIGINT) AS digit
        FROM orders
    ), obs AS (
        SELECT digit, COUNT(*) AS observed
        FROM digits GROUP BY 1
    ), tot AS (SELECT SUM(observed) AS n FROM obs),
    exp AS (
        SELECT * FROM (VALUES
            {", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM.items())}
        ) AS t(digit, expected_ppm)
    )
    SELECT e.digit,
           CAST(COALESCE(o.observed, 0) AS BIGINT) AS observed,
           CAST(COALESCE(o.observed, 0) * 1000000 // t.n AS BIGINT)
               AS observed_ppm,
           CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
           CAST((COALESCE(o.observed, 0) * 1000000 // t.n - e.expected_ppm)
                * (COALESCE(o.observed, 0) * 1000000 // t.n
                   - e.expected_ppm) // e.expected_ppm
                AS BIGINT) AS chi2_contrib_ppm
    FROM exp e LEFT JOIN obs o ON o.digit = e.digit CROSS JOIN tot t
    """,
)
def stats_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals —
    the classic synthetic-data / fraud screen.

    The leading digit comes from the DECIMAL-exact integer cents
    rendered as a string (portable across engines; float formatting is
    not), the expectation from hardcoded floor(1e6*log10(1+1/d))
    constants that sum to exactly 1e6, and the chi-square contribution
    from pure integer ops. 100 TB: one 9-group aggregate; the digit
    extraction is column algebra on the scan.
    """
    cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    obs = (
        load(spark, sf_dir, "orders")
        .select(
            F.substring(cents.cast("string"), 1, 1)
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    exp = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_PPM.items()],
        "digit bigint, expected_ppm bigint",
    )
    # total via a window over the 9-row aggregate — NOT a second
    # orders scan (a crossJoin(broadcast(obs.agg(...))) re-reads the
    # table; measured 2x scan cost at sf0.1).
    joined = (
        exp.join(obs, "digit", "left")
        .withColumn("observed", F.coalesce("observed", F.lit(0)))
        .withColumn(
            "n", F.sum("observed").over(Window.partitionBy())
        )
        .withColumn(
            "observed_ppm",
            F.expr("CAST(observed * 1000000 DIV n AS BIGINT)"),
        )
    )
    return joined.select(
        "digit",
        F.col("observed").cast("bigint").alias("observed"),
        "observed_ppm",
        "expected_ppm",
        F.expr(
            "CAST((observed_ppm - expected_ppm)"
            " * (observed_ppm - expected_ppm)"
            " DIV expected_ppm AS BIGINT)"
        ).alias("chi2_contrib_ppm"),
    )


@query(
    "stats_ab_conversion",
    """
    WITH per_user AS (
        SELECT user_id % 2 AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND value > 150
                        THEN 1 ELSE 0 END) AS converted
        FROM events
        GROUP BY user_id
    ), arms AS (
        SELECT variant,
               COUNT(*) AS users,
               CAST(SUM(converted) AS BIGINT) AS converters
        FROM per_user GROUP BY 1
    ), wide AS (
        SELECT
            MAX(CASE WHEN variant = 0 THEN users END) AS n0,
            MAX(CASE WHEN variant = 0 THEN converters END) AS c0,
            MAX(CASE WHEN variant = 1 THEN users END) AS n1,
            MAX(CASE WHEN variant = 1 THEN converters END) AS c1
        FROM arms
    ), stat AS (
        SELECT
            (c0 * 1000000 // n0) - (c1 * 1000000 // n1) AS d_ppm,
            ((c0 + c1) * 1000000 // (n0 + n1)) AS pbar_ppm,
            n0, n1
        FROM wide
    )
    SELECT a.variant,
           CAST(a.users AS BIGINT) AS users,
           a.converters,
           CAST(a.converters * 1000000 // a.users AS BIGINT) AS conv_ppm,
           CAST(CASE WHEN s.pbar_ppm IN (0, 1000000) THEN 0
                ELSE CAST(s.d_ppm AS HUGEINT) * s.d_ppm * s.n0 * s.n1
                     * 1000
                     // (s.pbar_ppm * (1000000 - s.pbar_ppm)
                         * (s.n0 + s.n1)) END AS BIGINT) AS z2_milli
    FROM arms a CROSS JOIN stat s
    """,
)
def stats_ab_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B conversion test (user_id parity as the arm
    assignment, a >150-value purchase as the conversion — the plain
    any-purchase definition saturates at p=1 on this data), z^2 in
    milli-units, zero-variance-guarded.

    z^2 = d^2 * n0*n1 / (pbar*(1-pbar)*(n0+n1)) over ppm integers —
    algebraically identical to the pooled two-proportion z-test with no
    sqrt (report z^2, not z). The product passes 2^63 at billion-user
    scale, so it widens to DECIMAL(38,0)/HUGEINT first. 100 TB: one
    per-user aggregate (map-side combinable), then 2-row arithmetic.
    """
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy((F.col("user_id") % 2).alias("variant"), "user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 150),
                    1,
                ).otherwise(0)
            ).alias("converted")
        )
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("users"),
        F.sum("converted").cast("bigint").alias("converters"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("users"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("converters"))).alias(
            "c0"
        ),
        F.max(F.when(F.col("variant") == 1, F.col("users"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("converters"))).alias(
            "c1"
        ),
    )
    stat = wide.select(
        F.expr(
            "(c0 * 1000000 DIV n0) - (c1 * 1000000 DIV n1)"
        ).alias("d_ppm"),
        F.expr("(c0 + c1) * 1000000 DIV (n0 + n1)").alias("pbar_ppm"),
        "n0",
        "n1",
    )
    return (
        arms.crossJoin(F.broadcast(stat))
        .select(
            "variant",
            F.col("users").cast("bigint").alias("users"),
            "converters",
            F.expr(
                "CAST(converters * 1000000 DIV users AS BIGINT)"
            ).alias("conv_ppm"),
            F.expr(
                "CAST(CASE WHEN pbar_ppm IN (0, 1000000) THEN 0"
                " ELSE CAST(d_ppm AS DECIMAL(38,0)) * d_ppm * n0 * n1"
                " * 1000 DIV (CAST(pbar_ppm AS DECIMAL(38,0))"
                " * (1000000 - pbar_ppm) * (n0 + n1)) END AS BIGINT)"
            ).alias("z2_milli"),
        )
    )


@query(
    "stats_autocorr_daily",
    """
    WITH daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               COUNT(*) AS y
        FROM events
        GROUP BY 1
    ), lags AS (SELECT * FROM (VALUES (1), (7)) AS t(lag_days)),
    pairs AS (
        SELECT l.lag_days, a.y AS x, b.y AS y
        FROM lags l
        JOIN daily a ON TRUE
        JOIN daily b ON b.d = a.d + l.lag_days
    ), sums AS (
        SELECT lag_days,
               COUNT(*) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(x * y) AS HUGEINT) AS sxy,
               CAST(SUM(x * x) AS HUGEINT) AS sxx,
               CAST(SUM(y * y) AS HUGEINT) AS syy
        FROM pairs GROUP BY 1
    )
    SELECT CAST(lag_days AS BIGINT) AS lag_days,
           CAST(n AS BIGINT) AS n_pairs,
           CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END
                * ((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000
                   // ((n * sxx - sx * sx) * (n * syy - sy * sy)))
                AS BIGINT) AS r2_signed_ppm
    FROM sums
    WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def stats_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of daily event volume, reported as
    sign(r) * floor(1e6 * r^2) — exact (r^2 is rational in the integer
    sums; r itself needs a sqrt).

    100 TB: the daily rollup bounds everything downstream by the
    calendar; the lagged self-join runs on that tiny frame (broadcast
    by AQE), never on raw events.
    """
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).alias("y"))
    )
    lags = spark.createDataFrame([(1,), (7,)], "lag_days bigint")
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        lags.crossJoin(a)
        .join(
            b,
            F.col("b.d") == F.col("a.d") + F.col("lag_days"),
        )
        .select(
            "lag_days",
            F.col("a.y").alias("x"),
            F.col("b.y").alias("y"),
        )
    )
    sums = pairs.groupBy("lag_days").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n38 = "CAST(n AS DECIMAL(38,0))"
    num = f"({n38} * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"
    vx = f"({n38} * sxx - CAST(sx AS DECIMAL(38,0)) * sx)"
    vy = f"({n38} * syy - CAST(sy AS DECIMAL(38,0)) * sy)"
    return (
        sums.where(
            (F.col("n") >= 2)
            & (F.expr(vx) > 0)
            & (F.expr(vy) > 0)
        )
        .select(
            F.col("lag_days").cast("bigint").alias("lag_days"),
            F.col("n").cast("bigint").alias("n_pairs"),
            F.expr(
                f"CAST(CASE WHEN {num} < 0 THEN -1 ELSE 1 END"
                f" * (({num} * {num} * 1000000) DIV ({vx} * {vy}))"
                " AS BIGINT)"
            ).alias("r2_signed_ppm"),
        )
    )


@query(
    "timeseries_ewma_daily",
    """
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               COUNT(*) AS y
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, d, y,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
                   AS rn
        FROM daily
    ), rec AS (
        SELECT event_type, rn, d, y,
               CAST(y AS HUGEINT) * 1000000000 AS s
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT n.event_type, n.rn, n.d, n.y,
               (CAST(n.y AS HUGEINT) * 1000000000 + 3 * r.s) // 4
        FROM seq n JOIN rec r
          ON n.event_type = r.event_type AND n.rn = r.rn + 1
    )
    SELECT event_type, d AS day_idx, CAST(y AS BIGINT) AS y,
           CAST(s // 1000000 AS BIGINT) AS ewma_milli
    FROM rec
    """,
)
def timeseries_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (alpha = 1/4) of daily event volume per event type, in exact
    milli-units via the bounded array-fold recurrence operator
    (operators/timeseries.py::ewma — see its scale contract).

    The oracle replays the identical floor-divided recurrence as a
    recursive CTE, so the match is bit-exact. 100 TB: one daily rollup
    bounds the series length by the calendar; series count (event types
    here, any key in general) scales out.
    """
    from _event_intelligence_data_warehouse_spark.operators import (
        timeseries as ts,
    )

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    out = ts.ewma(daily, ["event_type"], "d", "y")
    return out.select(
        "event_type",
        F.col("d").alias("day_idx"),
        F.col("y").cast("bigint").alias("y"),
        "ewma_milli",
    )


@query(
    "timeseries_cusum_total",
    """
    WITH RECURSIVE daily AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               COUNT(*) AS y
        FROM events GROUP BY 1
    ), m AS (
        SELECT CAST(SUM(y) AS HUGEINT) * 1000000000 // COUNT(*)
                   AS mean_ppb
        FROM daily
    ), seq AS (
        SELECT d, y, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM daily
    ), rec AS (
        SELECT rn, d, y,
               GREATEST(CAST(0 AS HUGEINT),
                        CAST(y AS HUGEINT) * 1000000000 - m.mean_ppb
                        - (m.mean_ppb * 5 // 100)) AS hi,
               GREATEST(CAST(0 AS HUGEINT),
                        m.mean_ppb - CAST(y AS HUGEINT) * 1000000000
                        - (m.mean_ppb * 5 // 100)) AS lo
        FROM seq CROSS JOIN m WHERE rn = 1
        UNION ALL
        SELECT n.rn, n.d, n.y,
               GREATEST(CAST(0 AS HUGEINT),
                        r.hi + CAST(n.y AS HUGEINT) * 1000000000
                        - m.mean_ppb - (m.mean_ppb * 5 // 100)),
               GREATEST(CAST(0 AS HUGEINT),
                        r.lo + m.mean_ppb
                        - CAST(n.y AS HUGEINT) * 1000000000
                        - (m.mean_ppb * 5 // 100))
        FROM seq n JOIN rec r ON n.rn = r.rn + 1 CROSS JOIN m
    )
    SELECT rec.d AS day_idx, CAST(rec.y AS BIGINT) AS y,
           CAST(rec.hi // 1000000 AS BIGINT) AS cusum_hi_milli,
           CAST(rec.lo // 1000000 AS BIGINT) AS cusum_lo_milli,
           CAST(CASE WHEN rec.hi > m.mean_ppb OR rec.lo > m.mean_ppb
                     THEN 1 ELSE 0 END AS BIGINT) AS drift_flag
    FROM rec CROSS JOIN m
    """,
)
def timeseries_cusum_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM drift screen on total daily event volume
    (operators/timeseries.py::cusum): cumulated deviations beyond a 5%
    slack around the series mean, flagged past one mean-day — the
    page-view-collapse / ingestion-stall detector.

    Exact ppb integers end-to-end; the oracle unrolls the same max(0,.)
    recurrence as a recursive CTE. 100 TB: identical shape to the EWMA
    entry — calendar-bounded fold, corpus touched once.
    """
    from _event_intelligence_data_warehouse_spark.operators import (
        timeseries as ts,
    )

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).alias("y"))
        .withColumn("series_id", F.lit("all"))
    )
    out = ts.cusum(daily, ["series_id"], "d", "y")
    return out.select(
        F.col("d").alias("day_idx"),
        F.col("y").cast("bigint").alias("y"),
        "cusum_hi_milli",
        "cusum_lo_milli",
        F.col("drift_flag").cast("bigint").alias("drift_flag"),
    )


@query(
    "basket_part_pair_lift",
    """
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n12
        FROM li a
        JOIN li b ON a.l_orderkey = b.l_orderkey
                 AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ), marg AS (
        SELECT l_partkey, COUNT(*) AS n FROM li GROUP BY 1
    ), tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li)
    SELECT p.part_a, p.part_b, CAST(p.n12 AS BIGINT) AS n12,
           CAST(p.n12 * 1000000 // t.n_orders AS BIGINT) AS support_ppm,
           CAST(CAST(p.n12 AS HUGEINT) * t.n_orders * 1000000
                // (CAST(ma.n AS HUGEINT) * mb.n) AS BIGINT) AS lift_ppm
    FROM pairs p
    JOIN marg ma ON ma.l_partkey = p.part_a
    JOIN marg mb ON mb.l_partkey = p.part_b
    CROSS JOIN tot t
    WHERE p.n12 >= 2
    ORDER BY lift_ppm DESC, part_a, part_b
    LIMIT 100
    """,
)
def basket_part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over order contents: co-occurrence
    count, support and lift (in exact ppm — lift = N*n12/(n1*n2) is
    rational, no floats) for the top-100 part pairs by lift.

    100 TB: the within-order self-join fans out by lines-per-order
    (bounded, ~7) — NEVER corpus x corpus; marginals and the order
    count are map-side-combinable; the ranking is a heap over
    min-support survivors.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        "l_orderkey", F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        "l_orderkey", F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n12"))
        .where(F.col("n12") >= 2)
    )
    marg = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    tot = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    return (
        pairs.join(
            marg.select(
                F.col("l_partkey").alias("part_a"),
                F.col("n").alias("na"),
            ),
            "part_a",
        )
        .join(
            marg.select(
                F.col("l_partkey").alias("part_b"),
                F.col("n").alias("nb"),
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            F.col("n12").cast("bigint").alias("n12"),
            F.expr(
                "CAST(n12 * 1000000 DIV n_orders AS BIGINT)"
            ).alias("support_ppm"),
            F.expr(
                "CAST(CAST(n12 AS DECIMAL(38,0)) * n_orders * 1000000"
                " DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("lift_ppm").desc(), "part_a", "part_b")
        .limit(100)
    )


@query(
    "stats_group_variance",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST((COUNT(*) * SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                     * 100 AS BIGINT)
                                * CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                       * 100 AS BIGINT))
                 - CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                 AS BIGINT)) AS HUGEINT)
                   * SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT)))
                // (CAST(COUNT(*) AS HUGEINT) * (COUNT(*) - 1))
                AS BIGINT) AS var_cents2
    FROM orders
    GROUP BY 1
    HAVING COUNT(*) >= 2
    """,
)
def stats_group_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority sample variance of order totals in exact integer
    cents^2: var = (n*Sxx - Sx^2) / (n*(n-1)) over exact-cent sums —
    the one-pass numerically-exact form (no mean subtraction, no
    catastrophic cancellation because nothing ever leaves integers).

    100 TB: sums of squares pass 2^63 (cents^2 ~ 1e13 per row), so the
    aggregate accumulates in DECIMAL(38,0)/HUGEINT; still one
    map-side-combinable pass.
    """
    cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    agg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("sx"),
            F.sum(
                cents.cast("decimal(38,0)") * cents
            ).alias("sxx"),
        )
        .where(F.col("n") >= 2)
    )
    return agg.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n"),
        F.col("sx").cast("bigint").alias("sum_cents"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * sxx"
            " - CAST(sx AS DECIMAL(38,0)) * sx)"
            " DIV (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT)"
        ).alias("var_cents2"),
    )


@query(
    "window_value_family",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               COUNT(*) AS y
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, d AS day, CAST(y AS BIGINT) AS y,
           CAST(FIRST_VALUE(y) OVER w AS BIGINT) AS first_y,
           CAST(LAST_VALUE(y) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING
           ) AS BIGINT) AS last_y,
           CAST(NTH_VALUE(y, 2) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING
           ) AS BIGINT) AS second_y,
           CAST(LEAD(y, 1) OVER w AS BIGINT) AS next_y,
           CAST(LAG(y, 1) OVER w AS BIGINT) AS prev_y
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY d)
    """,
)
def window_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The value-navigation window family (first_value / last_value /
    nth_value / lead / lag) over per-type daily series — completing the
    W-surface next to the ranking family. last/nth use an explicit
    unbounded-following frame (the default frame stops at CURRENT ROW,
    where last_value degenerates to the current value — the classic
    trap, pinned identically on both engines)."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    w = W.partitionBy("event_type").orderBy("day")
    w_full = w.rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return daily.select(
        "event_type",
        "day",
        F.col("y").cast("bigint").alias("y"),
        F.first("y").over(w).cast("bigint").alias("first_y"),
        F.last("y").over(w_full).cast("bigint").alias("last_y"),
        F.nth_value("y", 2).over(w_full).cast("bigint").alias("second_y"),
        F.lead("y", 1).over(w).cast("bigint").alias("next_y"),
        F.lag("y", 1).over(w).cast("bigint").alias("prev_y"),
    )


@query(
    "timeseries_holt_forecast",
    """
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(CAST(ts AS TIMESTAMP) AS DATE)
                   - DATE '1970-01-01' AS d0,
               COUNT(*) AS y
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, CAST(d0 AS BIGINT) AS d, y,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d0)
                   AS rn
        FROM daily
    ), rec AS (
        SELECT event_type, rn, d, y,
               CAST(y AS HUGEINT) * 1000000000 AS l,
               CAST(0 AS HUGEINT) AS b
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT n.event_type, n.rn, n.d, n.y,
               (CAST(n.y AS HUGEINT) * 1000000000 + 3 * (r.l + r.b))
                   // 4 AS l,
               (((CAST(n.y AS HUGEINT) * 1000000000
                  + 3 * (r.l + r.b)) // 4 - r.l) + 7 * r.b) // 8 AS b
        FROM seq n JOIN rec r
          ON n.event_type = r.event_type AND n.rn = r.rn + 1
    )
    SELECT event_type, d AS day_idx, CAST(y AS BIGINT) AS y,
           CAST(l // 1000000 AS BIGINT) AS level_milli,
           CAST(b // 1000000 AS BIGINT) AS trend_milli,
           CAST((l + b) // 1000000 AS BIGINT) AS forecast_milli
    FROM rec
    """,
)
def timeseries_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear smoothing (alpha=1/4, beta=1/8) of daily volume per
    event type with the one-step-ahead forecast, via the two-component
    integer fold (operators/timeseries.py::holt_linear).

    Signed-truncating integer division is identical on both engines
    (verified for BIGINT and HUGEINT: -7//2 = -3), so the
    possibly-negative trend recurrence stays bit-exact against the
    recursive-CTE oracle. Same calendar-bounded scale contract as the
    EWMA entry.
    """
    from _event_intelligence_data_warehouse_spark.operators import (
        timeseries as ts,
    )

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    out = ts.holt_linear(daily, ["event_type"], "d", "y")
    return out.select(
        "event_type",
        F.col("d").alias("day_idx"),
        F.col("y").cast("bigint").alias("y"),
        "level_milli",
        "trend_milli",
        "forecast_milli",
    )


@query(
    "streaming_ewma_daily",
    """
    WITH RECURSIVE daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               COUNT(*) AS y
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, d, y,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
                   AS rn
        FROM daily
    ), rec AS (
        SELECT event_type, rn, d, y,
               CAST(y AS HUGEINT) * 1000000000 AS s
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT n.event_type, n.rn, n.d, n.y,
               (CAST(n.y AS HUGEINT) * 1000000000 + 3 * r.s) // 4
        FROM seq n JOIN rec r
          ON n.event_type = r.event_type AND n.rn = r.rn + 1
    )
    SELECT event_type, d AS day_idx, CAST(y AS BIGINT) AS y,
           CAST(s // 1000000 AS BIGINT) AS ewma_milli
    FROM rec
    """,
)
def streaming_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EWMA recurrence as a STATEFUL STREAMING operator
    (streaming/stateful.py::ewma_stream, applyInPandasWithState with
    two int64s of state per key), drained with Trigger.AvailableNow
    over the day-sorted daily rollup — and checked against the SAME
    recursive-CTE oracle as the batch fold (timeseries_ewma_daily):
    batch/streaming equivalence is the correctness claim, enforced by
    the gate itself.

    100 TB: state is O(keys) x 16 bytes; each micro-batch moves one
    Arrow batch per key — the continuously-updating form of the
    calendar-bounded fold.
    """
    from _event_intelligence_data_warehouse_spark.contract import staging_dir
    from _event_intelligence_data_warehouse_spark.streaming import stateful

    tmp = staging_dir("stream_ewma", sf_dir)
    src, out, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    (
        daily.repartition(1)
        .sortWithinPartitions("event_type", "d")
        .write.mode("overwrite")
        .parquet(src)
    )
    stateful.run_stateful_ewma(spark, src, out, ckpt)
    return spark.read.parquet(out).select(
        "event_type",
        "day_idx",
        F.col("y").cast("bigint").alias("y"),
        "ewma_milli",
    )


@query(
    "stats_ks_two_sample",
    """
    WITH pts AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS ca,
               COUNT(*) FILTER (WHERE event_type = 'click') AS cb
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY 1
    ), tot AS (
        SELECT SUM(ca) AS na, SUM(cb) AS nb FROM pts
    ), cum AS (
        SELECT cents,
               SUM(ca) OVER (ORDER BY cents) AS cum_a,
               SUM(cb) OVER (ORDER BY cents) AS cum_b
        FROM pts
    ), dev AS (
        SELECT cents,
               abs(CAST(cum_a AS HUGEINT) * nb
                   - CAST(cum_b AS HUGEINT) * na) AS dnum
        FROM cum, tot
    ), mx AS (
        SELECT MAX(dnum) AS dmax FROM dev
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(dmax AS BIGINT) AS d_num_max,
           CAST(dmax * 1000000 // (CAST(na AS HUGEINT) * nb) AS BIGINT)
               AS d_ppm,
           (SELECT CAST(MIN(cents) AS BIGINT) FROM dev
            WHERE dnum = (SELECT dmax FROM mx)) AS ks_at_cents
    FROM tot, mx
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the purchase and
    click value distributions, computed EXACTLY in integers: at each
    observed value x, the deviation |cumA(x)*nB - cumB(x)*nA| (the KS
    statistic scaled by nA*nB — no floating ECDF), its max, the max in
    ppm, and the value (cents) where the distributions diverge most
    (min cents on ties). Products run in DECIMAL(38,0)/HUGEINT — at
    1e11-row samples cum*n passes int64.

    100 TB: the per-value (cents, ca, cb) aggregate is combinable and
    bounded by the value DOMAIN (price points), not event count; the
    cumulative sums use the two-level prefix pattern (per-bucket totals
    -> O(#buckets) single-partition prefix -> within-bucket window
    partitioned by bucket) so no global ordered window ever sees the
    per-value rows in one task; the max and argmax are combinable
    aggregates of the deviation frame.
    """
    e = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    pts = e.groupBy(
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        )
    ).agg(
        F.count_if(F.col("event_type") == "purchase").alias("ca"),
        F.count_if(F.col("event_type") == "click").alias("cb"),
    ).withColumn("_bucket", F.expr("cents div 1000"))
    bucket_tot = pts.groupBy("_bucket").agg(
        F.sum("ca").alias("_ba"), F.sum("cb").alias("_bb")
    )
    wb = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_prefix = bucket_tot.select(
        "_bucket",
        F.coalesce(F.sum("_ba").over(wb), F.lit(0)).alias("_pa"),
        F.coalesce(F.sum("_bb").over(wb), F.lit(0)).alias("_pb"),
    )
    wi = Window.partitionBy("_bucket").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        pts.join(bucket_prefix, "_bucket")
        .select(
            "cents",
            (F.col("_pa") + F.sum("ca").over(wi)).alias("cum_a"),
            (F.col("_pb") + F.sum("cb").over(wi)).alias("cum_b"),
        )
    )
    tot = pts.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    dev = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        "na",
        "nb",
        F.abs(
            F.expr(
                "CAST(cum_a AS DECIMAL(38,0)) * nb"
                " - CAST(cum_b AS DECIMAL(38,0)) * na"
            )
        ).alias("dnum"),
    )
    mx = dev.agg(F.max("dnum").alias("dmax"))
    arg = (
        dev.crossJoin(F.broadcast(mx))
        .where(F.col("dnum") == F.col("dmax"))
        .agg(
            F.min("cents").cast("bigint").alias("ks_at_cents"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
            F.first("dmax").alias("dmax"),
        )
    )
    return arg.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("dmax").cast("bigint").alias("d_num_max"),
        F.expr(
            "CAST(dmax * 1000000 div (CAST(na AS DECIMAL(38,0)) * nb)"
            " AS BIGINT)"
        ).alias("d_ppm"),
        "ks_at_cents",
    )


_CONC_SESS_CTE = """
WITH ordered AS (
    SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN CAST(ts AS TIMESTAMP)
                     - lag(CAST(ts AS TIMESTAMP))
                       OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     IS NULL
                THEN 1 ELSE 0 END AS is_new
    FROM events
), numbered AS (
    SELECT user_id, ts,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_no
    FROM ordered
), sessions AS (
    SELECT user_id, sess_no, MIN(ts) AS start_ts,
           MAX(ts) + INTERVAL 60 SECOND AS end_ts
    FROM numbered GROUP BY 1, 2
)
"""


@query(
    "timeseries_peak_concurrency",
    _CONC_SESS_CTE
    + """
, sweep AS (
    SELECT start_ts AS ts, 1 AS delta FROM sessions
    UNION ALL
    SELECT end_ts AS ts, -1 AS delta FROM sessions
), net AS (
    SELECT ts, SUM(delta) AS net FROM sweep GROUP BY ts
), cum AS (
    SELECT ts, SUM(net) OVER (ORDER BY ts) AS conc FROM net
)
SELECT CAST(ts AS DATE) AS day,
       CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
       CAST(MIN(conc) AS BIGINT) AS min_concurrency
FROM cum GROUP BY 1
""",
)
def timeseries_peak_concurrency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sweep-line interval stabbing: per day, the peak (and trough)
    number of simultaneously-open user sessions. Sessions are 30-min
    gap splits with a 60 s tail; each becomes a half-open [start, end)
    interval contributing +1/-1 sweep events; collapsing deltas per
    distinct timestamp BEFORE the cumulative sum gives exactly the
    "ends release before starts at the same instant" semantics, and
    the running sum at each event instant is the live concurrency —
    the O(n log n) alternative to the O(n^2) overlapping-pairs
    self-join.

    100 TB: sessionization windows partition by user (parallel); the
    sweep frame is 2 rows per SESSION (already gap-collapsed), its
    per-instant net is a combinable aggregate, and the global running
    sum uses the two-level prefix pattern — per-hour bucket totals,
    O(#hours) single-partition prefix, within-bucket windows — so no
    task ever sorts the full sweep stream. Peaks per day are
    combinable maxima.
    """
    e = load(spark, sf_dir, "events").select("user_id", "ts")
    w_u = Window.partitionBy("user_id").orderBy("ts")
    numbered = (
        e.withColumn("_prev", F.lag("ts").over(w_u))
        .withColumn(
            "_new",
            (
                F.col("_prev").isNull()
                | (
                    F.col("ts").cast("long") - F.col("_prev").cast("long")
                    > 1800
                )
            ).cast("int"),
        )
        .withColumn(
            "sess_no",
            F.sum("_new").over(
                w_u.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    sessions = numbered.groupBy("user_id", "sess_no").agg(
        F.min("ts").alias("start_ts"),
        (F.max("ts") + F.expr("INTERVAL 60 SECOND")).alias("end_ts"),
    )
    sweep = sessions.select(
        F.col("start_ts").alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        sessions.select(
            F.col("end_ts").alias("ts"), F.lit(-1).alias("delta")
        )
    )
    net = sweep.groupBy("ts").agg(F.sum("delta").alias("net")).withColumn(
        "_bucket", F.expr("CAST(ts AS LONG) div 3600")
    )
    bucket_tot = net.groupBy("_bucket").agg(F.sum("net").alias("_bn"))
    wb = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_prefix = bucket_tot.select(
        "_bucket",
        F.coalesce(F.sum("_bn").over(wb), F.lit(0)).alias("_pn"),
    )
    wi = Window.partitionBy("_bucket").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = net.join(bucket_prefix, "_bucket").select(
        "ts", (F.col("_pn") + F.sum("net").over(wi)).alias("conc")
    )
    return cum.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.max("conc").cast("bigint").alias("peak_concurrency"),
        F.min("conc").cast("bigint").alias("min_concurrency"),
    )


@query(
    "agg_quantiles_interpolated",
    """
    WITH pts AS (
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, cents,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents)
                   AS cum_n
        FROM pts
    ), tot AS (
        SELECT event_type, SUM(cnt) AS n FROM pts GROUP BY 1
    ), pos AS (
        SELECT t.event_type, q.q, t.n,
               1 + (t.n - 1) * q.q // 100 AS lo_rn,
               (t.n - 1) * q.q % 100 AS frac_pct
        FROM tot t, (SELECT unnest([25, 50, 75]) AS q) q
    ), lo AS (
        SELECT p.event_type, p.q, p.n, p.frac_pct,
               (SELECT MIN(cents) FROM cum c
                WHERE c.event_type = p.event_type
                  AND c.cum_n >= p.lo_rn) AS v_lo
        FROM pos p
    ), hi AS (
        SELECT l.*,
               CASE WHEN l.frac_pct = 0 THEN l.v_lo ELSE
                   (SELECT MIN(cents) FROM cum c
                    WHERE c.event_type = l.event_type
                      AND c.cum_n >= (SELECT lo_rn + 1 FROM pos p2
                                      WHERE p2.event_type = l.event_type
                                        AND p2.q = l.q))
               END AS v_hi
        FROM lo l
    )
    SELECT event_type, CAST(q AS BIGINT) AS q,
           CAST(n AS BIGINT) AS n,
           CAST(v_lo * 100 + (v_hi - v_lo) * frac_pct AS BIGINT)
               AS quantile_hundredth_cents
    FROM hi
    """,
)
def agg_quantiles_interpolated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Type-7 linearly-interpolated quantiles (the NumPy/pandas/R
    default) per event type, EXACT in integers: position (n-1)q/100
    splits into a lower rank and a 0-99 fractional percent, and the
    interpolated value v_lo*100 + (v_hi-v_lo)*frac lands in
    hundredth-cents with no float anywhere — so a Spark curation
    pipeline reproduces a pandas notebook's quantiles digit-for-digit.

    Complements agg_exact_percentiles (nearest-rank/type-1): the
    interpolated definition needs TWO order statistics per quantile and
    exact fractional arithmetic.

    100 TB: no per-row global sort — events collapse to distinct
    (type, cents) counts (combinable, bounded by the price domain);
    the cumulative count runs per type over those distinct values; the
    two order statistics come from min-over-threshold aggregates of
    the cumulative frame (combinable), joined back to the O(types x 3)
    position frame.
    """
    e = load(spark, sf_dir, "events")
    pts = e.groupBy(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = pts.select(
        "event_type", "cents", F.sum("cnt").over(w).alias("cum_n")
    )
    tot = pts.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    qs = F.explode(F.array(F.lit(25), F.lit(50), F.lit(75))).alias("q")
    pos = tot.select("event_type", "n", qs).select(
        "event_type",
        "q",
        "n",
        (F.lit(1) + F.expr("(n - 1) * q div 100")).alias("lo_rn"),
        F.expr("(n - 1) * q % 100").alias("frac_pct"),
    )
    lo = (
        cum.join(pos, "event_type")
        .where(F.col("cum_n") >= F.col("lo_rn"))
        .groupBy("event_type", "q", "n", "frac_pct")
        .agg(F.min("cents").alias("v_lo"))
    )
    hi = (
        cum.join(pos, "event_type")
        .where(F.col("cum_n") >= F.col("lo_rn") + 1)
        .groupBy("event_type", "q")
        .agg(F.min("cents").alias("v_hi_raw"))
    )
    return (
        lo.join(hi, ["event_type", "q"], "left")
        .select(
            "event_type",
            F.col("q").cast("bigint").alias("q"),
            F.col("n").cast("bigint").alias("n"),
            (
                F.col("v_lo") * 100
                + (
                    F.when(F.col("frac_pct") == 0, F.lit(0)).otherwise(
                        F.coalesce(F.col("v_hi_raw"), F.col("v_lo"))
                        - F.col("v_lo")
                    )
                )
                * F.col("frac_pct")
            ).cast("bigint").alias("quantile_hundredth_cents"),
        )
    )


@query(
    "stats_mann_whitney_u",
    """
    WITH pts AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS ca,
               COUNT(*) FILTER (WHERE event_type = 'click') AS cb
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY 1
    ), cum AS (
        SELECT cents, ca, cb,
               SUM(ca + cb) OVER (ORDER BY cents) AS cum_n
        FROM pts
    ), ranked AS (
        -- doubled midrank of a tie group is integral:
        -- 2*avg(lo..hi) = lo + hi = (prev_cum + 1) + cum
        SELECT cents, ca, cb,
               (cum_n - (ca + cb) + 1) + cum_n AS rank2
        FROM cum
    ), tot AS (
        SELECT SUM(ca) AS na, SUM(cb) AS nb,
               SUM(CAST(rank2 AS HUGEINT) * ca) AS r2a
        FROM ranked
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(r2a - na * (na + 1) AS BIGINT) AS u2_a,
           CAST(2 * CAST(na AS HUGEINT) * nb
                - (r2a - na * (na + 1)) AS BIGINT) AS u2_b,
           CAST((r2a - na * (na + 1)) * 1000000
                // (2 * CAST(na AS HUGEINT) * nb) AS BIGINT)
               AS auc_ppm
    FROM tot
    """,
)
def stats_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test between the purchase and click
    value samples, EXACT: tie groups get integral DOUBLED midranks
    (2*midrank = lo+hi of the group's rank range), so U is computed in
    integers with no float ranking — u2_* are 2U, and auc_ppm =
    U/(nA*nB) is the rank-biserial AUC in exact ppm (the probability a
    random purchase value exceeds a random click value, ties half-
    weighted). Distribution-free companion to stats_ks_two_sample:
    KS finds WHERE distributions diverge, U tests whether one
    stochastically dominates.

    100 TB: identical shape to the KS screen — events collapse to
    per-value counts bounded by the price domain; the cumulative rank
    runs over distinct values (two-level prefix swap-in at extreme
    domains); U is one combinable weighted sum.
    """
    e = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    pts = e.groupBy(
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        )
    ).agg(
        F.count_if(F.col("event_type") == "purchase").alias("ca"),
        F.count_if(F.col("event_type") == "click").alias("cb"),
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = pts.withColumn("cum_n", F.sum(F.col("ca") + F.col("cb")).over(w))
    ranked = cum.select(
        "ca",
        (
            (F.col("cum_n") - (F.col("ca") + F.col("cb")) + 1)
            + F.col("cum_n")
        ).alias("rank2"),
    )
    tot = ranked.agg(
        F.sum("ca").alias("na"),
        F.sum(F.expr("CAST(rank2 AS DECIMAL(38,0)) * ca")).alias("r2a"),
    ).crossJoin(
        F.broadcast(
            pts.agg(F.sum("cb").alias("nb"))
        )
    )
    return tot.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.expr("CAST(r2a - na * (na + 1) AS BIGINT)").alias("u2_a"),
        F.expr(
            "CAST(2 * CAST(na AS DECIMAL(38,0)) * nb"
            " - (r2a - na * (na + 1)) AS BIGINT)"
        ).alias("u2_b"),
        F.expr(
            "CAST((r2a - na * (na + 1)) * 1000000"
            " div (2 * CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
        ).alias("auc_ppm"),
    )


@query(
    "stats_runs_test",
    """
    WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                   AS rev_c
        FROM events GROUP BY 1
    ), moves AS (
        SELECT day,
               CASE WHEN rev_c > LAG(rev_c) OVER (ORDER BY day) THEN 1
                    WHEN rev_c < LAG(rev_c) OVER (ORDER BY day) THEN -1
               END AS sgn
        FROM daily
    ), signs AS (
        SELECT day, sgn,
               LAG(sgn) OVER (ORDER BY day) AS prev_sgn
        FROM moves WHERE sgn IS NOT NULL
    ), agg AS (
        SELECT COUNT(*) AS n_moves,
               COUNT(*) FILTER (WHERE sgn = 1) AS n_up,
               COUNT(*) FILTER (WHERE sgn = -1) AS n_down,
               1 + COUNT(*) FILTER (WHERE prev_sgn IS NOT NULL
                                      AND sgn <> prev_sgn) AS n_runs
        FROM signs
    )
    SELECT CAST(n_moves AS BIGINT) AS n_moves,
           CAST(n_up AS BIGINT) AS n_up,
           CAST(n_down AS BIGINT) AS n_down,
           CAST(n_runs AS BIGINT) AS n_runs,
           CAST(1000000 + 2000000 * CAST(n_up AS HUGEINT) * n_down
                // n_moves AS BIGINT) AS expected_runs_ppm
    FROM agg
    """,
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on the direction of day-over-day
    revenue moves: observed runs of consecutive same-sign moves vs the
    randomness expectation 1 + 2·n_up·n_down/n in exact ppm (one floor
    division) — the trend/mean-reversion screen that catches a metric
    whose wiggles are too streaky (regime shifts, smoothing bugs) or
    too alternating (overcorrection). Flat days drop (classic
    treatment); both engines see identical integer daily totals so the
    sign sequence is bit-identical.

    100 TB: daily totals are combinable; every window runs over the
    calendar-bounded daily frame.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
        ).alias("rev_c")
    )
    w = Window.orderBy("day")
    moves = daily.select(
        "day",
        F.when(F.col("rev_c") > F.lag("rev_c").over(w), 1)
        .when(F.col("rev_c") < F.lag("rev_c").over(w), -1)
        .alias("sgn"),
    ).where(F.col("sgn").isNotNull())
    signs = moves.select(
        "sgn", F.lag("sgn").over(Window.orderBy("day")).alias("prev_sgn")
    )
    agg = signs.agg(
        F.count(F.lit(1)).alias("n_moves"),
        F.count_if(F.col("sgn") == 1).alias("n_up"),
        F.count_if(F.col("sgn") == -1).alias("n_down"),
        (
            F.lit(1)
            + F.count_if(
                F.col("prev_sgn").isNotNull()
                & (F.col("sgn") != F.col("prev_sgn"))
            )
        ).alias("n_runs"),
    )
    return agg.select(
        F.col("n_moves").cast("bigint").alias("n_moves"),
        F.col("n_up").cast("bigint").alias("n_up"),
        F.col("n_down").cast("bigint").alias("n_down"),
        F.col("n_runs").cast("bigint").alias("n_runs"),
        F.expr(
            "CAST(1000000 + 2000000 * CAST(n_up AS DECIMAL(38,0))"
            " * n_down div n_moves AS BIGINT)"
        ).alias("expected_runs_ppm"),
    )


@query(
    "stats_theil_sen_trend",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events
        GROUP BY 1, 2
    ), slopes AS (
        SELECT i.event_type,
               CAST((j.y - i.y) * 1000000 // (j.x - i.x) AS BIGINT) AS s
        FROM daily i JOIN daily j
          ON j.event_type = i.event_type AND j.x > i.x
    ), ranked AS (
        SELECT event_type, s,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY s)
                   AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM slopes
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN s ELSE 0 END)
                + SUM(CASE WHEN rn = n // 2 + 1 THEN s ELSE 0 END)
                AS BIGINT) AS slope_micro_x2
    FROM ranked
    GROUP BY event_type
    """,
)
def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily volume per event type: the
    median of all pairwise day-over-day slopes — the 29%-breakdown
    estimator that one anomalous day cannot drag the way it drags the
    OLS slope (stats_regression_daily_trend, its fragile companion).

    Exactness: each pairwise slope is an integer micro-slope
    ((yj-yi)*1e6 intdiv (xj-xi); signed integer division truncates
    toward zero on BOTH engines), and the median is reported DOUBLED
    (lower-mid + upper-mid) so even pair counts never leave the
    integers. Scale: the pairwise join is O(D^2) in DAYS, not in rows
    — the daily rollup bounds it to |days| x |types| inputs no matter
    how many events a day holds; selection rides a per-type window
    over slope values (types partition the work)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint").alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    i, j = daily.alias("i"), daily.alias("j")
    slopes = (
        i.join(
            j,
            (F.col("j.event_type") == F.col("i.event_type"))
            & (F.col("j.x") > F.col("i.x")),
        )
        .select(
            F.col("i.event_type").alias("event_type"),
            F.expr(
                "CAST(CASE WHEN j.y < i.y THEN -1 ELSE 1 END"
                " * (ABS(j.y - i.y) * 1000000 DIV (j.x - i.x))"
                " AS BIGINT)"
            ).alias("s"),
        )
    )
    w = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type", "s",
        F.row_number().over(w.orderBy("s")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_pairs"),
        (
            F.sum(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("s"))
                  .otherwise(F.lit(0)))
            + F.sum(F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("s"))
                    .otherwise(F.lit(0)))
        ).cast("bigint").alias("slope_micro_x2"),
    )


@query(
    "stats_changepoint_daily",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events
        GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, x, y,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x)
                   AS t,
               CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY x)
                    AS HUGEINT) AS p,
               CAST(SUM(y) OVER (PARTITION BY event_type) AS HUGEINT)
                   AS s,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
    ), scored AS (
        SELECT event_type, x, t, p, s, n,
               ((n * p - t * s) * (n * p - t * s) * 1000)
                   // (t * (n - t)) AS stat
        FROM seq WHERE t < n
    ), best AS (
        SELECT event_type, x, t, p, s, n, stat,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY stat DESC, t) AS rk
        FROM scored
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           x AS split_day,
           CAST(t AS BIGINT) AS split_t,
           CAST(stat AS BIGINT) AS stat_milli,
           CAST(p * 1000000 // t AS BIGINT) AS mean_left_ppm,
           CAST((s - p) * 1000000 // (n - t) AS BIGINT)
               AS mean_right_ppm
    FROM best WHERE rk = 1
    """,
)
def stats_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single most-likely level-shift changepoint per event type
    (binary-segmentation scan statistic): the split t maximizing the
    between-segment scatter ((n*P(t) - t*S)^2) / (t*(n-t)) over the
    daily count series — the localization companion to the CUSUM drift
    SCREEN (timeseries_cusum_total says "something moved"; this says
    WHERE). Exact integers end-to-end: prefix sums, a milli-scaled
    floor-divided statistic (DECIMAL(38,0) holds the square), earliest-t
    tiebreak. 100 TB: the daily rollup bounds the scan to calendar
    length per type; the argmax is one bounded window."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint").alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    wt = Window.partitionBy("event_type")
    seq = daily.select(
        "event_type", "x", "y",
        F.row_number().over(wt.orderBy("x")).cast("bigint").alias("t"),
        F.sum("y").over(wt.orderBy("x")).cast("decimal(38,0)").alias("p"),
        F.sum("y").over(wt).cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).over(wt).cast("bigint").alias("n"),
    )
    scored = seq.filter(F.col("t") < F.col("n")).withColumn(
        "stat",
        F.expr(
            "((n * p - t * s) * (n * p - t * s) * 1000)"
            " div (t * (n - t))"
        ),
    )
    best = scored.withColumn(
        "rk",
        F.row_number().over(
            wt.orderBy(F.col("stat").desc(), F.col("t"))
        ),
    ).filter(F.col("rk") == 1)
    return best.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("x").alias("split_day"),
        F.col("t").cast("bigint").alias("split_t"),
        F.col("stat").cast("bigint").alias("stat_milli"),
        F.expr("CAST(p * 1000000 div t AS BIGINT)").alias("mean_left_ppm"),
        F.expr("CAST((s - p) * 1000000 div (n - t) AS BIGINT)")
            .alias("mean_right_ppm"),
    )


@query(
    "stats_hodges_lehmann",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events
        GROUP BY 1, 2
    ), walsh AS (
        SELECT i.event_type, i.y + j.y AS w
        FROM daily i JOIN daily j
          ON j.event_type = i.event_type AND j.x >= i.x
    ), ranked AS (
        SELECT event_type, w,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY w)
                   AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM walsh
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_walsh,
           CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN w ELSE 0 END)
                + SUM(CASE WHEN rn = n // 2 + 1 THEN w ELSE 0 END)
                AS BIGINT) AS pseudo_median_x4
    FROM ranked
    GROUP BY event_type
    """,
)
def stats_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudo-median of daily volume per event type —
    the location companion to Theil-Sen's slope (same 29% breakdown
    point; the estimator behind the Wilcoxon signed-rank confidence
    interval): the median of all Walsh averages (y_i + y_j)/2 over
    unordered day pairs INCLUDING i = j. Exactness: Walsh values are
    kept as integer SUMS (y_i + y_j) and the median is reported doubled
    (lower-mid + upper-mid), so the output is pseudo-median x4 in pure
    integers. Scale: O(days^2) per type, bounded by the calendar like
    the Theil-Sen join."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint").alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    i, j = daily.alias("i"), daily.alias("j")
    walsh = i.join(
        j,
        (F.col("j.event_type") == F.col("i.event_type"))
        & (F.col("j.x") >= F.col("i.x")),
    ).select(
        F.col("i.event_type").alias("event_type"),
        (F.col("i.y") + F.col("j.y")).alias("w"),
    )
    wt = Window.partitionBy("event_type")
    ranked = walsh.select(
        "event_type", "w",
        F.row_number().over(wt.orderBy("w")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_walsh"),
        (
            F.sum(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("w"))
                  .otherwise(F.lit(0)))
            + F.sum(F.when(F.col("rn") == F.expr("n div 2 + 1"), F.col("w"))
                    .otherwise(F.lit(0)))
        ).cast("bigint").alias("pseudo_median_x4"),
    )


_HSEL_B = 32
_HSEL_LO, _HSEL_HI = 2_000_000, 4_500_000  # cents: $20,000 .. $45,000


@query(
    "stats_histogram_selectivity",
    f"""
    WITH pts AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1
    ), tot AS (SELECT CAST(SUM(c) AS HUGEINT) AS n FROM pts),
    cum AS (
        SELECT v, c,
               CAST(SUM(c) OVER (ORDER BY v) AS HUGEINT) AS cm
        FROM pts
    ), bkt AS (
        SELECT v, c,
               CAST((cm - 1) * {_HSEL_B} // n AS BIGINT) + 1 AS b
        FROM cum CROSS JOIN tot
    ), hist AS (
        SELECT b, CAST(SUM(c) AS BIGINT) AS cnt,
               MIN(v) AS lo, MAX(v) AS hi
        FROM bkt GROUP BY b
    ), est AS (
        SELECT CAST(SUM(CASE WHEN least({_HSEL_HI}, hi)
                                  >= greatest({_HSEL_LO}, lo)
                 THEN CAST(cnt AS HUGEINT)
                      * (least({_HSEL_HI}, hi)
                         - greatest({_HSEL_LO}, lo) + 1)
                      // (hi - lo + 1)
                 ELSE 0 END) AS BIGINT) AS est_rows
        FROM hist
    ), exact AS (
        SELECT CAST(SUM(c) AS BIGINT) AS exact_rows
        FROM pts WHERE v BETWEEN {_HSEL_LO} AND {_HSEL_HI}
    )
    SELECT est_rows, exact_rows,
           CAST((SELECT COUNT(*) FROM hist) AS BIGINT) AS n_buckets,
           CAST((SELECT n FROM tot) AS BIGINT) AS n_total
    FROM est CROSS JOIN exact
    """,
)
def stats_histogram_selectivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ANALYZE-style equi-depth histogram + range-predicate selectivity
    estimation — the cost-based-optimizer statistic that prices a scan
    filter BEFORE running it (row-count estimates drive join order and
    broadcast decisions). 32 equal-mass buckets over exact price cents
    (bucket of a value = its cumulative-count quantile — heavy values
    keep all their rows in one bucket, the standard equi-depth
    compromise), then the estimate for a range interpolates each
    bucket's overlap fraction uniformly, in pure integer floor
    arithmetic — bit-identical estimates on both engines, with the
    exact count alongside so estimate quality is part of the contract.

    Scale: the cumulative counts run the two-level bucketed prefix-sum
    pattern (per-coarse-bucket totals -> O(#buckets) global prefix ->
    within-bucket window), so no global ordered window ever sees the
    distinct-value rows in one task; the histogram is 32 rows."""
    li = load(spark, sf_dir, "lineitem")
    # NO persist on pts despite its four consumers (coarse bucket
    # totals, cumulative join, grand total, exact range count): all
    # four live in the ONE final plan, where the groupBy's exchange is
    # already shared via ReusedExchange — an r12 A/B measured the
    # persisted variant consistently SLOWER (5.1 vs 4.1 s at sf0.1,
    # order-balanced), the same single-plan reuse that keeps
    # fact_build_star's window dedup unpersisted.
    pts = li.groupBy(
        F.expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    pts = pts.withColumn("_cb", F.expr("v div 100000"))
    bucket_tot = pts.groupBy("_cb").agg(F.sum("c").alias("_bc"))
    wb = Window.orderBy("_cb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_prefix = bucket_tot.select(
        "_cb", F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_pc")
    )
    wi = Window.partitionBy("_cb").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = pts.join(bucket_prefix, "_cb").select(
        "v", "c",
        (F.col("_pc") + F.sum("c").over(wi))
        .cast("decimal(38,0)").alias("cm"),
    )
    tot = pts.agg(F.sum("c").cast("decimal(38,0)").alias("n"))
    bkt = cum.crossJoin(F.broadcast(tot)).select(
        "v", "c",
        (F.expr(f"CAST((cm - 1) * {_HSEL_B} div n AS BIGINT)") + 1)
        .alias("b"),
    )
    hist = bkt.groupBy("b").agg(
        F.sum("c").cast("bigint").alias("cnt"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    est = hist.agg(
        F.sum(
            F.expr(
                f"CASE WHEN least({_HSEL_HI}, hi)"
                f" >= greatest({_HSEL_LO}, lo)"
                f" THEN CAST(cnt AS DECIMAL(38,0))"
                f" * (least({_HSEL_HI}, hi) - greatest({_HSEL_LO}, lo) + 1)"
                f" div (hi - lo + 1) ELSE 0 END"
            )
        ).cast("bigint").alias("est_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    exact = pts.filter(
        F.col("v").between(_HSEL_LO, _HSEL_HI)
    ).agg(F.sum("c").cast("bigint").alias("exact_rows"))
    return (
        est.crossJoin(exact)
        .crossJoin(tot.select(F.col("n").cast("bigint").alias("n_total")))
        .select("est_rows", "exact_rows", "n_buckets", "n_total")
    )


@query(
    "stats_mann_kendall",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events
        GROUP BY 1, 2
    ), s AS (
        SELECT i.event_type,
               CAST(SUM(CASE WHEN j.y > i.y THEN 1
                             WHEN j.y < i.y THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM daily i JOIN daily j
          ON j.event_type = i.event_type AND j.x > i.x
        GROUP BY 1
    ), n AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1
    ), ties AS (
        SELECT event_type,
               CAST(coalesce(SUM(t * (t - 1) * (2 * t + 5)), 0)
                    AS BIGINT) AS tie_term
        FROM (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
            FROM daily GROUP BY event_type, y
        ) GROUP BY 1
    )
    SELECT s.event_type, s.s_stat, s.n_pairs, n.n_days,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - t.tie_term AS BIGINT) AS var_s_x18,
           CAST(CASE WHEN s.s_stat = 0 THEN 0
                WHEN (ABS(s.s_stat) - 1) * (ABS(s.s_stat) - 1)
                     * 18 * 10000
                     > 38416
                       * (n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                          - t.tie_term)
                THEN CASE WHEN s.s_stat > 0 THEN 1 ELSE -1 END
                ELSE 0 END AS BIGINT) AS trend_direction
    FROM s JOIN n USING (event_type) JOIN ties t USING (event_type)
    """,
)
def stats_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per event type — the SIGNIFICANCE
    companion to Theil-Sen's slope (the pairing hydrology standardized):
    S = sum of sign(y_j - y_i) over time-ordered day pairs, tie-corrected
    variance Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)]/18, and the
    two-sided 5% decision taken MULTIPLIED THROUGH so no square root or
    float enters: |S|-1 squared x 18 x 10^4 > 1.96^2 x 10^4 x
    (18 Var(S)) — trend_direction is +1/-1/0, exactly reproducible on
    both engines. Scale: the pairwise join is O(days^2) per type,
    calendar-bounded like its Theil-Sen companion; the continuity
    correction uses |S|-1 per the standard normal approximation."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint").alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    i, j = daily.alias("i"), daily.alias("j")
    s = (
        i.join(
            j,
            (F.col("j.event_type") == F.col("i.event_type"))
            & (F.col("j.x") > F.col("i.x")),
        )
        .groupBy(F.col("i.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("j.y") > F.col("i.y"), 1)
                .when(F.col("j.y") < F.col("i.y"), -1)
                .otherwise(0)
            ).cast("bigint").alias("s_stat"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).cast("bigint").alias("tie_term")
        )
    )
    out = s.join(n, "event_type").join(ties, "event_type")
    var18 = (
        "n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"
    )
    return out.select(
        "event_type", "s_stat", "n_pairs", "n_days",
        F.expr(f"CAST({var18} AS BIGINT)").alias("var_s_x18"),
        F.expr(
            "CAST(CASE WHEN s_stat = 0 THEN 0"
            " WHEN (ABS(s_stat) - 1) * (ABS(s_stat) - 1) * 18 * 10000"
            f" > 38416 * ({var18})"
            " THEN CASE WHEN s_stat > 0 THEN 1 ELSE -1 END"
            " ELSE 0 END AS BIGINT)"
        ).alias("trend_direction"),
    )


# Chi-square 95th-percentile critical values in milli-units, df 1..30
# (standard published table). df outside the table makes the CASE — and
# therefore significant_5pct — NULL on BOTH engines: "no critical value
# available" must surface as unknown, never as a silent FALSE that masks
# a real significant H (round-6 ADVICE).
_KW_CRIT_MILLI = (
    "CASE df WHEN 1 THEN 3841 WHEN 2 THEN 5991 WHEN 3 THEN 7815"
    " WHEN 4 THEN 9488 WHEN 5 THEN 11070 WHEN 6 THEN 12592"
    " WHEN 7 THEN 14067 WHEN 8 THEN 15507 WHEN 9 THEN 16919"
    " WHEN 10 THEN 18307 WHEN 11 THEN 19675 WHEN 12 THEN 21026"
    " WHEN 13 THEN 22362 WHEN 14 THEN 23685 WHEN 15 THEN 24996"
    " WHEN 16 THEN 26296 WHEN 17 THEN 27587 WHEN 18 THEN 28869"
    " WHEN 19 THEN 30144 WHEN 20 THEN 31410 WHEN 21 THEN 32671"
    " WHEN 22 THEN 33924 WHEN 23 THEN 35172 WHEN 24 THEN 36415"
    " WHEN 25 THEN 37652 WHEN 26 THEN 38885 WHEN 27 THEN 40113"
    " WHEN 28 THEN 41337 WHEN 29 THEN 42557 WHEN 30 THEN 43773 END"
)


@query(
    "stats_kruskal_wallis",
    f"""
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ), pts AS (
        SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM daily GROUP BY 1
    ), ranked AS (
        SELECT y, c,
               (SUM(c) OVER (ORDER BY y) - c + 1)
                 + SUM(c) OVER (ORDER BY y) AS rank2
        FROM pts
    ), grp AS (
        SELECT d.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_i,
               CAST(SUM(r.rank2) AS HUGEINT) AS s2_i
        FROM daily d JOIN ranked r ON r.y = d.y
        GROUP BY 1
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_i) AS HUGEINT) AS n,
               CAST(SUM(s2_i * s2_i // n_i) AS HUGEINT) AS g
        FROM grp
    ), ties AS (
        SELECT CAST(coalesce(SUM(c * c * c - c), 0) AS HUGEINT) AS t
        FROM pts
    ), h AS (
        SELECT k, n,
               CAST(3 AS HUGEINT) * g * 1000000 // (n * (n + 1))
                 - CAST(3 AS HUGEINT) * (n + 1) * 1000000 AS h_ppm,
               (n * n * n - n) AS n3n, t
        FROM agg CROSS JOIN ties
    ), hc AS (
        SELECT k, n, h_ppm,
               CASE WHEN n3n - t > 0
                    THEN h_ppm * n3n // (n3n - t)
                    ELSE h_ppm END AS hc_ppm,
               CAST(k - 1 AS BIGINT) AS df
        FROM h
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           CAST(n AS BIGINT) AS n_total,
           CAST(h_ppm AS BIGINT) AS h_ppm,
           CAST(hc_ppm AS BIGINT) AS h_tie_corrected_ppm,
           df,
           hc_ppm > CAST(({_KW_CRIT_MILLI}) AS HUGEINT) * 1000
               AS significant_5pct
    FROM hc
    """,
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across ALL event types' daily-volume samples —
    the k-group extension of Mann-Whitney (one-way ANOVA on ranks,
    distribution-free): do the event types draw their daily volumes
    from the same distribution?

    Exactness: pooled tie groups get integral DOUBLED midranks
    (2*midrank = lo+hi, the stats_mann_whitney_u construction), the
    per-group term S2_i^2/n_i floors once per group (mirrored on both
    engines; error < k absolute on a ~1e12 quantity), H lands in exact
    ppm, and the tie correction (N^3-N)/((N^3-N)-T) multiplies through
    in integers. The 5% decision compares against chi-square critical
    values hardcoded in milli-units per df (1..30) — no distribution
    functions at query time; df beyond the table yields a NULL
    decision (unknown), never a silent FALSE. Scale: ranks live on the DISTINCT daily
    values (domain-bounded), groups aggregate once; everything after is
    k-row arithmetic."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint").alias("x"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    pts = daily.groupBy("y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wv = Window.orderBy("y").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = pts.select(
        "y", "c",
        (
            (F.sum("c").over(wv) - F.col("c") + 1) + F.sum("c").over(wv)
        ).alias("rank2"),
    )
    grp = (
        daily.join(ranked.select("y", "rank2"), "y")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
            F.sum("rank2").cast("decimal(38,0)").alias("s2_i"),
        )
    )
    agg = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_i").cast("decimal(38,0)").alias("n"),
        F.sum(F.expr("s2_i * s2_i div n_i")).cast("decimal(38,0)")
        .alias("g"),
    )
    ties = pts.agg(
        F.coalesce(
            F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")),
            F.lit(0),
        ).cast("decimal(38,0)").alias("t")
    )
    h = agg.crossJoin(ties).selectExpr(
        "k", "n", "t",
        "CAST(3 AS DECIMAL(38,0)) * g * 1000000 div (n * (n + 1))"
        " - CAST(3 AS DECIMAL(38,0)) * (n + 1) * 1000000 AS h_ppm",
        "(n * n * n - n) AS n3n",
    )
    hc = h.selectExpr(
        "k", "n", "h_ppm",
        "CASE WHEN n3n - t > 0 THEN h_ppm * n3n div (n3n - t)"
        " ELSE h_ppm END AS hc_ppm",
        "CAST(k - 1 AS BIGINT) AS df",
    )
    return hc.selectExpr(
        "CAST(k AS BIGINT) AS n_groups",
        "CAST(n AS BIGINT) AS n_total",
        "CAST(h_ppm AS BIGINT) AS h_ppm",
        "CAST(hc_ppm AS BIGINT) AS h_tie_corrected_ppm",
        "df",
        f"hc_ppm > CAST(({_KW_CRIT_MILLI}) AS DECIMAL(38,0))"
        " * 1000 AS significant_5pct",
    )


@query(
    "stats_spearman_daily",
    """
    WITH va AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'view' GROUP BY 1
    ), vb AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), ab AS (
        SELECT va.d, va.y AS ya, vb.y AS yb FROM va JOIN vb USING (d)
    ), ra AS (
        -- doubled midranks (lo+hi of each tie run) of the A series
        SELECT y, (SUM(c) OVER (ORDER BY y) - c + 1)
                    + SUM(c) OVER (ORDER BY y) AS rank2
        FROM (SELECT ya AS y, CAST(COUNT(*) AS BIGINT) AS c
              FROM ab GROUP BY 1)
    ), rb AS (
        SELECT y, (SUM(c) OVER (ORDER BY y) - c + 1)
                    + SUM(c) OVER (ORDER BY y) AS rank2
        FROM (SELECT yb AS y, CAST(COUNT(*) AS BIGINT) AS c
              FROM ab GROUP BY 1)
    ), rr AS (
        SELECT ab.d, ra.rank2 AS r2a, rb.rank2 AS r2b
        FROM ab JOIN ra ON ra.y = ab.ya JOIN rb ON rb.y = ab.yb
    ), agg AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(r2a * r2b) AS HUGEINT) AS sab,
               CAST(SUM(r2a) AS HUGEINT) AS sa,
               CAST(SUM(r2b) AS HUGEINT) AS sb,
               CAST(SUM(r2a * r2a) AS HUGEINT) AS saa,
               CAST(SUM(r2b * r2b) AS HUGEINT) AS sbb
        FROM rr
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           CAST(n * sab - sa * sb AS BIGINT) AS spearman_num,
           CAST(n * saa - sa * sa AS BIGINT) AS den_a,
           CAST(n * sbb - sb * sb AS BIGINT) AS den_b,
           CAST(CASE WHEN (n * saa - sa * sa) * (n * sbb - sb * sb) > 0
                THEN ((n * sab - sa * sb) * (n * sab - sa * sb) * 1000000)
                     // ((n * saa - sa * sa) * (n * sbb - sb * sb))
                ELSE NULL END AS BIGINT) AS rho_sq_ppm,
           CAST(CASE WHEN n * sab - sa * sb > 0 THEN 1
                     WHEN n * sab - sa * sb < 0 THEN -1
                     ELSE 0 END AS BIGINT) AS direction
    FROM agg
    """,
)
def stats_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the daily-volume series of two
    event types ('view' vs 'click', aligned on shared days) — the
    distribution-free monotone-association screen (Pearson on RANKS):
    are busy view days also busy click days, without assuming
    linearity or normality?

    Exactness: each series gets integral DOUBLED midranks (2*midrank =
    lo+hi of the tie run — the stats_mann_whitney_u construction, so
    ties cost no fractions), and Spearman = Pearson over those integer
    ranks: num = n*S(ra*rb) - S(ra)*S(rb) and the two denominator
    terms are exact integers; rho^2 lands as an exact ppm ratio
    (num^2*1e6 floor-div den_a*den_b) with the sign reported
    separately — no sqrt, no floats, same multiplied-through decision
    discipline as stats_mann_kendall. Accumulation in HUGEINT /
    DECIMAL(38,0): num^2*1e6 passes int64 around ~1 year of data.

    Scale: two day-grain aggregates, rank windows over the DISTINCT
    daily values (calendar-bounded), then one 1-row fold."""
    ev = load(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("bigint")

    def _daily(etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy(day.alias("d"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        )

    from _event_intelligence_data_warehouse_spark import cache

    # day-grain frame, reused by both rank derivations and the final
    # join-back: persist so the events aggregate runs once, not thrice
    ab = cache.persist(
        _daily("view").select("d", F.col("y").alias("ya"))
        .join(_daily("click").select("d", F.col("y").alias("yb")), "d")
    )

    def _rank2(col: str) -> DataFrame:
        pts = ab.groupBy(F.col(col).alias("y")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        w = Window.orderBy("y").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return pts.select(
            "y",
            (
                (F.sum("c").over(w) - F.col("c") + 1) + F.sum("c").over(w)
            ).alias("rank2"),
        )

    rr = (
        ab.join(
            _rank2("ya").select(F.col("y").alias("ya"),
                                F.col("rank2").alias("r2a")), "ya")
        .join(
            _rank2("yb").select(F.col("y").alias("yb"),
                                F.col("rank2").alias("r2b")), "yb")
    )
    agg = rr.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("r2a") * F.col("r2b")).cast("decimal(38,0)").alias("sab"),
        F.sum("r2a").cast("decimal(38,0)").alias("sa"),
        F.sum("r2b").cast("decimal(38,0)").alias("sb"),
        F.sum(F.col("r2a") * F.col("r2a")).cast("decimal(38,0)").alias("saa"),
        F.sum(F.col("r2b") * F.col("r2b")).cast("decimal(38,0)").alias("sbb"),
    )
    return agg.selectExpr(
        "CAST(n AS BIGINT) AS n_days",
        "CAST(n * sab - sa * sb AS BIGINT) AS spearman_num",
        "CAST(n * saa - sa * sa AS BIGINT) AS den_a",
        "CAST(n * sbb - sb * sb AS BIGINT) AS den_b",
        "CAST(CASE WHEN (n * saa - sa * sa) * (n * sbb - sb * sb) > 0"
        " THEN ((n * sab - sa * sb) * (n * sab - sa * sb) * 1000000)"
        " div ((n * saa - sa * sa) * (n * sbb - sb * sb))"
        " ELSE NULL END AS BIGINT) AS rho_sq_ppm",
        "CAST(CASE WHEN n * sab - sa * sb > 0 THEN 1"
        " WHEN n * sab - sa * sb < 0 THEN -1 ELSE 0 END AS BIGINT)"
        " AS direction",
    )


@query(
    "stats_wilcoxon_signed_rank",
    """
    WITH va AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'view' GROUP BY 1
    ), vb AS (
        SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), dif AS (
        SELECT va.d, va.y - vb.y AS diff, abs(va.y - vb.y) AS ad
        FROM va JOIN vb USING (d)
        WHERE va.y <> vb.y
    ), pts AS (
        SELECT ad, CAST(COUNT(*) AS BIGINT) AS c FROM dif GROUP BY 1
    ), rk AS (
        SELECT ad, (SUM(c) OVER (ORDER BY ad) - c + 1)
                     + SUM(c) OVER (ORDER BY ad) AS rank2, c
        FROM pts
    ), agg AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(CASE WHEN f.diff > 0 THEN r.rank2 ELSE 0 END)
                    AS HUGEINT) AS w2p,
               CAST(SUM(CASE WHEN f.diff < 0 THEN r.rank2 ELSE 0 END)
                    AS HUGEINT) AS w2m
        FROM dif f JOIN rk r USING (ad)
    ), ties AS (
        SELECT CAST(coalesce(SUM(c * c * c - c), 0) AS HUGEINT) AS t
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(w2p AS BIGINT) AS w2_plus,
           CAST(w2m AS BIGINT) AS w2_minus,
           CAST((n * (n + 1)) // 2 AS BIGINT) AS mean2,
           CAST(2 * n * (n + 1) * (2 * n + 1) - t AS BIGINT) AS var12,
           (2 * w2p - n * (n + 1)) * (2 * w2p - n * (n + 1)) * 30000
               > CAST(38416 AS HUGEINT)
                 * (2 * n * (n + 1) * (2 * n + 1) - t)
               AS significant_5pct
    FROM agg CROSS JOIN ties
    """,
)
def stats_wilcoxon_signed_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED daily volumes (view vs click
    on shared days) — the paired companion to Mann-Whitney: do the two
    series differ in level day-by-day, without assuming normality of
    the differences? Zero differences drop (standard practice); |diff|
    gets integral DOUBLED midranks (the house tie construction), W2+/
    W2- are the doubled signed-rank sums (W2+ + W2- = n(n+1), null
    mean of W2+ is n(n+1)/2), and the 5% two-sided normal decision is
    multiplied through to exact integers:
    z^2 > 1.96^2 <=> (2*W2+ - n(n+1))^2 * 3 * 10^4 >
    38416 * (2n(n+1)(2n+1) - T), with T = S(t^3 - t) the tie
    correction — no sqrt, no floats, the stats_mann_kendall
    discipline. (Derivation: center W2+ at n(n+1)/2, Var(W2+) =
    (2n(n+1)(2n+1) - T)/12; multiply the squared deviation by 4 to
    clear the half, then by 12/4=3 and 10^4 for 1.96^2 = 38416/10^4.) Scale: day-grain aggregates, a rank window over
    DISTINCT |diff| values, one 1-row fold."""
    from _event_intelligence_data_warehouse_spark import cache

    ev = load(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("bigint")

    def _daily(etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy(day.alias("d"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
        )

    dif = cache.persist(
        _daily("view").select("d", F.col("y").alias("ya"))
        .join(_daily("click").select("d", F.col("y").alias("yb")), "d")
        .filter(F.col("ya") != F.col("yb"))
        .select(
            "d",
            (F.col("ya") - F.col("yb")).alias("diff"),
            F.abs(F.col("ya") - F.col("yb")).alias("ad"),
        )
    )
    pts = dif.groupBy("ad").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wv = Window.orderBy("ad").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rk = pts.select(
        "ad",
        (
            (F.sum("c").over(wv) - F.col("c") + 1) + F.sum("c").over(wv)
        ).alias("rank2"),
        "c",
    )
    agg = dif.join(rk.select("ad", "rank2"), "ad").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(
            F.when(F.col("diff") > 0, F.col("rank2")).otherwise(F.lit(0))
        ).cast("decimal(38,0)").alias("w2p"),
        F.sum(
            F.when(F.col("diff") < 0, F.col("rank2")).otherwise(F.lit(0))
        ).cast("decimal(38,0)").alias("w2m"),
    )
    ties = pts.agg(
        F.coalesce(
            F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")),
            F.lit(0),
        ).cast("decimal(38,0)").alias("t")
    )
    return agg.crossJoin(ties).selectExpr(
        "CAST(n AS BIGINT) AS n_pairs",
        "CAST(w2p AS BIGINT) AS w2_plus",
        "CAST(w2m AS BIGINT) AS w2_minus",
        "CAST((n * (n + 1)) div 2 AS BIGINT) AS mean2",
        "CAST(2 * n * (n + 1) * (2 * n + 1) - t AS BIGINT) AS var12",
        "(2 * w2p - n * (n + 1)) * (2 * w2p - n * (n + 1)) * 30000"
        " > CAST(38416 AS DECIMAL(38,0))"
        " * (2 * n * (n + 1) * (2 * n + 1) - t) AS significant_5pct",
    )


@query(
    "basket_frequent_itemsets",
    """
    WITH li AS (
        SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS i
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), ms AS (
        SELECT COUNT(DISTINCT b) * 21000 // 1000000 AS m FROM li
    ), l1 AS (
        SELECT i, COUNT(*) AS c FROM li GROUP BY 1
        HAVING COUNT(*) >= (SELECT m FROM ms)
    ), fb AS (
        SELECT li.b, li.i FROM li JOIN l1 USING (i)
    ), l2 AS (
        SELECT a.i AS i1, b2.i AS i2, COUNT(*) AS c
        FROM fb a JOIN fb b2 ON a.b = b2.b AND a.i < b2.i
        GROUP BY 1, 2 HAVING COUNT(*) >= (SELECT m FROM ms)
    ), l3 AS (
        SELECT a.i AS i1, b2.i AS i2, c3.i AS i3, COUNT(*) AS c
        FROM fb a
        JOIN fb b2 ON a.b = b2.b AND a.i < b2.i
        JOIN fb c3 ON b2.b = c3.b AND b2.i < c3.i
        GROUP BY 1, 2, 3 HAVING COUNT(*) >= (SELECT m FROM ms)
    )
    SELECT i AS itemset, CAST(1 AS BIGINT) AS k, CAST(c AS BIGINT) AS support
    FROM l1
    UNION ALL
    SELECT i1 || '|' || i2, CAST(2 AS BIGINT), CAST(c AS BIGINT) FROM l2
    UNION ALL
    SELECT i1 || '|' || i2 || '|' || i3, CAST(3 AS BIGINT), CAST(c AS BIGINT)
    FROM l3
    """,
)
def basket_frequent_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori frequent itemsets (operators/mining.py) up to size 3
    over order baskets of part BRANDS, support threshold = 2.1% of
    baskets (scale-relative, integer floor both engines). The oracle
    counts each level directly — by support monotonicity that equals
    the level-wise Apriori output, so the prune is a physical
    optimization the gate verifies doesn't change semantics. At this
    support the 3-itemset level legitimately empties on uniform TPC-H
    baskets (triple co-occurrence tops out ~0.6% — same
    self-emptying-fraction pattern as TPC-H Q11); levels 1-2 carry the
    non-vacuous output, and the crafted-corpus tests pin non-empty L3
    behavior. 100 TB: within-basket joins fan out by items-per-basket
    (bounded ~4), frequent sets are threshold-bounded broadcasts,
    support counts are map-side-combinable."""
    from _event_intelligence_data_warehouse_spark import cache
    from _event_intelligence_data_warehouse_spark.operators import (
        mining as mn,
    )

    # Persisted: the distinct (order, brand) frame feeds the basket
    # count below, the L1 support aggregate AND the frequent-item
    # restriction join inside frequent_itemsets — unpersisted, the
    # lineitem-part join + distinct ran three times (guide §1.2).
    li = cache.persist(
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(
            load(spark, sf_dir, "part").select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = li.select("l_orderkey").distinct().count()
    minsup = n_orders * 21000 // 1000000
    return mn.frequent_itemsets(
        li, min_support=minsup, max_k=3,
        basket_col="l_orderkey", item_col="p_brand",
    )
