"""Time-series shaping operators: calendar gap-filling.

A daily aggregate silently DROPS days with no rows — dashboards then
interpolate across the hole and anomaly screens (kpi_anomalous_days)
under-count the population. Gap-filling materializes one row per
(key, day) over the table's full span with zeroed measures and an
explicit is_gap flag: the dense-spine contract every downstream
moving-average / day-over-day / z-score consumer assumes.

Scale shape: the spine is |keys| x |days| — microscopic next to the
event table (a year is 366 rows per key). The span comes from ONE 1-row
aggregate, the day sequence explodes from that single row, the key list
is a distinct over the aggregate's own grouping column, and the final
left join attaches the daily aggregate to the spine — every frame but
the aggregate is broadcast-sized, so the corpus is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gapfill_daily(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    user_col: str | None = "user_id",
) -> DataFrame:
    """One row per (key, day) for EVERY day in [min(ts), max(ts)] —
    days with no rows appear with n_events = 0 (and n_users = 0 when
    ``user_col`` is given) and is_gap = true.

    Returns (key_col, day, n_events, [n_users,] is_gap) with exact
    integer measures (engine-stable for oracle comparison)."""
    day = F.to_date(F.col(ts_col)).alias("day")
    aggs = [F.count("*").cast("bigint").alias("n_events")]
    if user_col is not None:
        aggs.append(
            F.countDistinct(F.col(user_col)).cast("bigint").alias("n_users")
        )
    daily = df.groupBy(F.col(key_col), day).agg(*aggs)
    span = df.agg(
        F.min(F.to_date(F.col(ts_col))).alias("d0"),
        F.max(F.to_date(F.col(ts_col))).alias("d1"),
    )
    days = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    keys = daily.select(key_col).distinct()
    spine = keys.crossJoin(F.broadcast(days))
    out_cols = [
        F.col(key_col),
        F.col("day"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
    ]
    if user_col is not None:
        out_cols.append(
            F.coalesce("n_users", F.lit(0)).cast("bigint").alias("n_users")
        )
    out_cols.append(F.col("n_events").isNull().alias("is_gap"))
    return spine.join(daily, [key_col, "day"], "left").select(*out_cols)


def ohlc(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    bucket: str = "hour",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """OHLC candle rollup — the hypertable/financial downsampling
    primitive: per (keys, time bucket) the Opening value (first by time,
    tiebroken deterministically), High, Low, Close (last), event count
    and exact cent-quantized volume.

    Open/close use the min/max of a (ts, tiebreak, value) STRUCT — a
    single aggregate pass with map-side partial combine (struct ordering
    is lexicographic), no row_number window over the raw events. That is
    the scale difference: one wordcount-shaped groupBy versus a
    per-bucket sort; at 100 TB the events stream through partial
    aggregates and only O(#buckets) rows survive."""
    keys = key_cols or []
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    v = F.col(value_col)
    # a NULL timestamp has no bucket: drop it rather than emit a
    # meaningless NULL-bucket candle
    df = df.filter(F.col(ts_col).isNotNull())
    pick = F.struct(
        F.col(ts_col).alias("t"),
        F.col(tiebreak_col).alias("tb"),
        v.alias("v"),
    )
    return (
        df.select(*keys, b, F.col(ts_col), F.col(tiebreak_col), v)
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.min(pick).getField("v").alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max(pick).getField("v").alias("close"),
            F.count("*").cast("bigint").alias("n_events"),
            # volume folds as integer CENTS (floor(x*100 + 0.5), pure
            # double floor: identical IEEE arithmetic on every engine)
            # in BIGINT, rendered once as double at the end. The
            # previous SUM(CAST(double AS DECIMAL(18,2))) carried the
            # Spark-shortest-repr-HALF_UP vs DuckDB-exact-binary
            # rounding tie AND was the registry's only DECIMAL-typed
            # output column (engine-dependent Decimal rendering) —
            # both hazards the round-8 driver red exposed.
            (
                F.sum(
                    F.floor(v * F.lit(100.0) + F.lit(0.5)).cast("bigint")
                ).cast("double")
                / F.lit(100.0)
            ).alias("volume"),
        )
    )


def growth_accounting(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    id_col: str = "user_id",
) -> DataFrame:
    """Daily growth accounting: per day the active entities, the
    first-ever-seen entities, and the running cumulative entity count —
    the DAU/new/total triple every product and corpus dashboard leads
    with. "New" is min(day) per entity (wordcount shape, no distinct
    window); the cumulative sum windows over O(#days) rows only."""
    from pyspark.sql.window import Window

    day = F.to_date(F.col(ts_col)).alias("day")
    active = (
        df.select(day, F.col(id_col).alias("eid"))
        .groupBy("day")
        .agg(F.count_distinct("eid").cast("bigint").alias("active"))
    )
    new = (
        df.select(F.col(id_col).alias("eid"), day)
        .groupBy("eid")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("new_entities"))
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        active.join(new, "day", "left")
        .select(
            "day",
            "active",
            F.coalesce(F.col("new_entities"), F.lit(0)).cast("bigint")
            .alias("new_entities"),
        )
        .withColumn(
            "cum_entities",
            F.sum("new_entities").over(w).cast("bigint"),
        )
    )


def _fold_series(
    df: DataFrame,
    key_cols: list[str],
    ord_col: str,
    val_col: str,
    *,
    acc_fields: str,
    init_expr: str,
    step_expr: str,
) -> DataFrame:
    """Exact-integer left fold over each key's ordered series.

    Spark has no native recurrence operator; a window can express
    prefix SUMS but not a feedback like s_t = f(s_{t-1}, y_t). This
    collects each series into a sorted array and folds it with the
    higher-order `aggregate` — pure JVM column algebra, no Python.

    Scale contract: series LENGTH must be bounded (calendar-bounded
    daily rollups: <= a few thousand points), while the NUMBER of
    series scales out across executors — the right decomposition for
    per-key state recurrences at 100 TB. Accumulator math runs in
    DECIMAL(38,0), so int64 overflow inside the fold is impossible for
    ppb-scaled daily counts.

    ``acc_fields`` declares extra accumulator struct fields (beyond
    d/y), ``init_expr``/``step_expr`` are SQL fragments producing the
    struct for the first element (`e`) and a subsequent element
    (`e`, previous struct `p`).
    """
    arr = F.array_sort(
        F.collect_list(F.struct(F.col(ord_col).alias("d"),
                                F.col(val_col).alias("y")))
    )
    fold = f"""
        aggregate(
            series,
            CAST(array() AS ARRAY<STRUCT<d: BIGINT, y: BIGINT,
                                         {acc_fields}>>),
            (acc, e) -> array_append(
                acc,
                CASE WHEN size(acc) = 0 THEN {init_expr}
                     ELSE {step_expr} END)
        )
    """
    folded = (
        df.groupBy(*key_cols)
        .agg(arr.alias("series"))
        .select(*key_cols, F.expr(fold).alias("folded"))
    )
    return folded.select(*key_cols, F.inline("folded"))


def ewma(
    df: DataFrame,
    key_cols: list[str],
    ord_col: str,
    val_col: str,
    *,
    alpha_num: int = 1,
    alpha_den: int = 4,
) -> DataFrame:
    """Exponentially weighted moving average in exact ppb integers:

        s_0 = y_0 * 1e9
        s_t = (alpha_num * y_t * 1e9 + (alpha_den - alpha_num) * s_{t-1})
              DIV alpha_den

    Every engine replays the identical floor-divided recurrence, so the
    result is bit-stable across partitionings, retries and the DuckDB
    oracle (which unrolls it as a recursive CTE). Output grain = input
    grain with `ewma_milli` = s DIV 1e6 (milli-units keep the final
    column in int64 at any realistic daily volume).
    """
    rest = alpha_den - alpha_num
    init = (
        "named_struct('d', e.d, 'y', e.y,"
        " 's', CAST(e.y AS DECIMAL(38,0)) * 1000000000)"
    )
    step = (
        "named_struct('d', e.d, 'y', e.y,"
        f" 's', (CAST(e.y AS DECIMAL(38,0)) * 1000000000 * {alpha_num}"
        f" + {rest} * element_at(acc, -1).s) DIV {alpha_den})"
    )
    out = _fold_series(
        df, key_cols, ord_col, val_col,
        acc_fields="s: DECIMAL(38,0)",
        init_expr=init, step_expr=step,
    )
    return out.select(
        *key_cols,
        F.col("d").alias(ord_col),
        F.col("y").alias(val_col),
        F.expr("CAST(s DIV 1000000 AS BIGINT)").alias("ewma_milli"),
    )


def cusum(
    df: DataFrame,
    key_cols: list[str],
    ord_col: str,
    val_col: str,
    *,
    slack_pct: int = 5,
) -> DataFrame:
    """Two-sided CUSUM drift screen against the per-series mean:

        hi_t = max(0, hi_{t-1} + (y_t - mean - k))     k = slack
        lo_t = max(0, lo_{t-1} + (mean - y_t - k))

    in exact ppb integers (mean_ppb = sum*1e9 DIV n, k = slack_pct% of
    the mean), flagged when either side exceeds one mean-day of
    cumulated deviation — a sqrt-free threshold that stays rational.
    The per-series mean rides INTO the fold via the series struct, so
    the whole screen is one aggregate + one fold.
    """
    w_mean = (
        df.groupBy(*key_cols)
        .agg(
            F.expr(
                f"CAST(SUM({val_col}) AS DECIMAL(38,0)) * 1000000000"
                f" DIV COUNT(*)"
            ).alias("mean_ppb")
        )
    )
    joined = df.join(F.broadcast(w_mean), key_cols)
    k = f"(mean_ppb * {slack_pct} DIV 100)"
    dev = f"(CAST(e.y AS DECIMAL(38,0)) * 1000000000 - mean_ppb)"
    init = (
        "named_struct('d', e.d, 'y', e.y,"
        f" 'hi', GREATEST(CAST(0 AS DECIMAL(38,0)), {dev} - {k}),"
        f" 'lo', GREATEST(CAST(0 AS DECIMAL(38,0)), -({dev}) - {k}))"
    )
    step = (
        "named_struct('d', e.d, 'y', e.y,"
        " 'hi', GREATEST(CAST(0 AS DECIMAL(38,0)),"
        f" element_at(acc, -1).hi + {dev} - {k}),"
        " 'lo', GREATEST(CAST(0 AS DECIMAL(38,0)),"
        f" element_at(acc, -1).lo + (-({dev})) - {k}))"
    )
    # mean_ppb must be visible inside the lambda: fold over a struct
    # series carrying it is overkill — it is constant per group, so
    # aggregate() resolves it from the grouping scope directly.
    folded = (
        joined.groupBy(*key_cols, "mean_ppb")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ord_col).alias("d"),
                        F.col(val_col).alias("y"),
                    )
                )
            ).alias("series")
        )
        .select(
            *key_cols,
            "mean_ppb",
            F.expr(
                f"""
                aggregate(
                    series,
                    CAST(array() AS ARRAY<STRUCT<d: BIGINT, y: BIGINT,
                        hi: DECIMAL(38,0), lo: DECIMAL(38,0)>>),
                    (acc, e) -> array_append(
                        acc,
                        CASE WHEN size(acc) = 0 THEN {init}
                             ELSE {step} END)
                )
                """
            ).alias("folded"),
        )
    )
    out = folded.select(*key_cols, "mean_ppb", F.inline("folded"))
    return out.select(
        *key_cols,
        F.col("d").alias(ord_col),
        F.col("y").alias(val_col),
        F.expr("CAST(hi DIV 1000000 AS BIGINT)").alias("cusum_hi_milli"),
        F.expr("CAST(lo DIV 1000000 AS BIGINT)").alias("cusum_lo_milli"),
        F.expr(
            "CAST(hi > mean_ppb OR lo > mean_ppb AS BOOLEAN)"
        ).alias("drift_flag"),
    )


def holt_linear(
    df: DataFrame,
    key_cols: list[str],
    ord_col: str,
    val_col: str,
    *,
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 8,
) -> DataFrame:
    """Holt's linear (double exponential) smoothing in exact ppb
    integers — level + trend recurrence:

        l_0 = y_0 * 1e9                 b_0 = 0
        l_t = (a_n*y_t*1e9 + (a_d-a_n)*(l_{t-1}+b_{t-1})) DIV a_d
        b_t = (b_n*(l_t - l_{t-1}) + (b_d-b_n)*b_{t-1}) DIV b_d

    using the same signed-truncating integer division both engines
    share (the trend difference can be negative). One-step-ahead
    forecast = l_t + b_t. Same bounded-series fold contract as ewma();
    the two-component state rides one struct.
    """
    a_rest = alpha_den - alpha_num
    b_rest = beta_den - beta_num
    init = (
        "named_struct('d', e.d, 'y', e.y,"
        " 'l', CAST(e.y AS DECIMAL(38,0)) * 1000000000,"
        " 'b', CAST(0 AS DECIMAL(38,0)))"
    )
    prev = "element_at(acc, -1)"
    new_l = (
        f"CAST((CAST(e.y AS DECIMAL(38,0)) * 1000000000 * {alpha_num}"
        f" + {a_rest} * ({prev}.l + {prev}.b)) DIV {alpha_den}"
        " AS DECIMAL(38,0))"
    )
    step = (
        "named_struct('d', e.d, 'y', e.y,"
        f" 'l', {new_l},"
        f" 'b', CAST(({beta_num} * ({new_l} - {prev}.l)"
        f" + {b_rest} * {prev}.b) DIV {beta_den} AS DECIMAL(38,0)))"
    )
    out = _fold_series(
        df, key_cols, ord_col, val_col,
        acc_fields="l: DECIMAL(38,0), b: DECIMAL(38,0)",
        init_expr=init, step_expr=step,
    )
    return out.select(
        *key_cols,
        F.col("d").alias(ord_col),
        F.col("y").alias(val_col),
        F.expr("CAST(l DIV 1000000 AS BIGINT)").alias("level_milli"),
        F.expr("CAST(b DIV 1000000 AS BIGINT)").alias("trend_milli"),
        F.expr(
            "CAST((l + b) DIV 1000000 AS BIGINT)"
        ).alias("forecast_milli"),
    )


def lttb_downsample(
    df: DataFrame,
    *,
    x_col: str = "x",
    y_col: str = "y",
    n_buckets: int = 8,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling of an integer series
    — the standard perceptual decimator for dashboard rendering (keep
    the ~2B points that preserve the line's visual shape: peaks,
    troughs, trend breaks — where a per-bucket mean would flatten every
    spike).

    This is the PARALLEL variant: both triangle anchors are the
    neighboring buckets' MEAN points (the classic formulation anchors
    on the previously SELECTED point, a sequential dependency no
    engine parallelizes). First and last points are always kept and
    serve as the edge buckets' outer anchors. With integer x/y the
    triangle area comparison is multiplied through by cl*cr^2 (the
    anchor means' denominators), so selection is EXACT integer
    arithmetic — no float area, no engine drift — and ties break
    toward the smaller x.

    Output: (x, y, bucket) for the selected points; bucket -1 is the
    first point, ``n_buckets`` the last. Interior points split into
    ``n_buckets`` equal-COUNT ranges by rank, per the original
    algorithm.

    Precondition: one point per x (pre-aggregate to the series grain,
    as every contract caller does). Duplicate x values are still
    handled deterministically — the rank orders on (x, y) — but the
    bucket layout then depends on how many duplicates precede each
    point, which is rarely the series the caller meant to decimate.

    Scale: one global rank window over the series (bounded by the
    calendar/grain, same contract as the Theil-Sen / Mann-Kendall
    screens), one 3-way join of O(B)-row bucket aggregates, one argmax
    per bucket."""
    from pyspark.sql.window import Window

    from _event_intelligence_data_warehouse_spark import cache

    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    pts = df.select(
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    # Rank on (x, y), not x alone: the algorithm expects one point per
    # x (callers pre-aggregate to the series grain), but if duplicate
    # x values DO arrive, a bare orderBy("x") would make idx — hence
    # first/last/bucket assignment — nondeterministic across runs.
    # With y as tiebreaker the rank is a deterministic total order over
    # distinct (x, y) points, and fully identical rows are
    # interchangeable (same bucket arithmetic, same area, same
    # tie-break), so the output multiset is stable either way.
    w = Window.orderBy("x", "y")
    # The ranked frame feeds FOUR consumers (first/last/interior/anchor
    # union); it is grain-bounded (one row per series point after the
    # caller's aggregate), so persist it instead of re-running the
    # upstream aggregate + rank per branch — collapses the plan from
    # ~20 exchanges to the handful the algebra actually needs.
    idx = cache.persist(
        pts.withColumn("idx", F.row_number().over(w)).withColumn(
            "n", F.count("*").over(Window.partitionBy())
        )
    )
    first = idx.filter(F.col("idx") == 1).select(
        "x", "y", F.lit(-1).cast("bigint").alias("bucket")
    )
    last = idx.filter(F.col("idx") == F.col("n")).select(
        "x", "y", F.lit(n_buckets).cast("bigint").alias("bucket")
    )
    # Effective bucket count clamps to the interior size: with more
    # buckets than interior points the rank map leaves EMPTY buckets
    # between occupied ones, and the bucket+-1 anchor joins below would
    # silently drop those points (caught by the hypothesis property).
    # With eff <= n-2 the equal-count map is monotone surjective onto
    # 0..eff-1, so every anchor exists.
    eff = f"least({n_buckets}, greatest(n - 2, 1))"
    interior = idx.filter(
        (F.col("idx") > 1) & (F.col("idx") < F.col("n"))
    ).withColumn(
        "bucket",
        F.expr(f"CAST((idx - 2) * ({eff}) div (n - 2) AS BIGINT)"),
    )
    # anchor frame: per-bucket integer sums, plus the first/last points
    # as single-point pseudo-buckets -1 and eff (the last OUTPUT row
    # still reports bucket = n_buckets; eff only shapes the anchor
    # layout so the top occupied bucket's right anchor exists)
    bsum = interior.groupBy("bucket").agg(
        F.count("*").alias("c"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    last_anchor = idx.filter(F.col("idx") == F.col("n")).select(
        F.expr(f"CAST(({eff}) AS BIGINT)").alias("bucket"),
        F.lit(1).alias("c"),
        F.col("x").alias("sx"), F.col("y").alias("sy"),
    )
    anchors = bsum.unionByName(
        first.select("bucket", F.lit(1).alias("c"),
                     F.col("x").alias("sx"), F.col("y").alias("sy"))
    ).unionByName(last_anchor)
    lft = anchors.select(
        (F.col("bucket") + 1).alias("bucket"),
        F.col("c").alias("cl"), F.col("sx").alias("sxl"),
        F.col("sy").alias("syl"),
    )
    rgt = anchors.select(
        (F.col("bucket") - 1).alias("bucket"),
        F.col("c").alias("cr"), F.col("sx").alias("sxr"),
        F.col("sy").alias("syr"),
    )
    scored = interior.join(lft, "bucket").join(rgt, "bucket").withColumn(
        "area2",
        F.abs(
            (F.col("sxl") * F.col("cr") - F.col("sxr") * F.col("cl"))
            * (F.col("y") * F.col("cr") - F.col("syr"))
            - (F.col("x") * F.col("cr") - F.col("sxr"))
            * (F.col("syl") * F.col("cr") - F.col("syr") * F.col("cl"))
        ),
    )
    pick = Window.partitionBy("bucket").orderBy(
        F.desc("area2"), F.asc("x")
    )
    chosen = (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("x", "y", "bucket")
    )
    return (
        first.unionByName(chosen).unionByName(last)
        .select(
            F.col("x").cast("bigint").alias("x"),
            F.col("y").cast("bigint").alias("y"),
            F.col("bucket").cast("bigint").alias("bucket"),
        )
    )
