"""Relational operator inventory (SURVEY.md §2) expressed over the driver's
TPC-H-ish tables, each with a DuckDB oracle.

Coverage map (operator ids from SURVEY.md §2):
- A1-A7  agg_orders_by_priority, agg_distinct_counts
- A8     agg_duplicate_groups
- A9/A11 quality_whole_table_check
- A10    agg_pct_scalar_subquery
- J1-J7  join_star_revenue, join_left_unmatched
- J8     join_semi_exists / join_anti_not_exists
- U1     dedup_distinct_pairs
- U2/W2  dedup_latest_per_key
- U4     upsert_merge_latest_state
- U5     scd2_change_intervals
- U6     surrogate_keys_dense
- W1     window_pct_of_total
- O1-O3  topk_recent_events (+ sorts inside other queries)
- D1-D6  dim_date_attributes
- D7-D8  daily_event_stats
- F1-F3  keys_md5_concat_split
- F6-F7  fx_case_mapping
- F4/F8  round_nullif_guard
- S4     json_extract_props
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from _event_intelligence_data_warehouse_spark.contract import load, query
from _event_intelligence_data_warehouse_spark.functions.datetime_fns import (
    pg_day_number,
    weekday_name,
)

DEC = "decimal(18,2)"


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

@query(
    "agg_orders_by_priority",
    """
    SELECT o_orderpriority,
           COUNT(*) AS total_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS finished_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS open_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS avg_price,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A4-A7: multi-key hash agg with conditional counts. Partial
    aggregation (map-side combine) is automatic; no shuffle beyond the
    group-by exchange."""
    o = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast(DEC)
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("total_orders"),
        F.count_if(F.col("o_orderstatus") == "F").alias("finished_orders"),
        F.count_if(F.col("o_orderstatus") == "O").alias("open_orders"),
        F.sum(dec).cast("double").alias("sum_price"),
        (F.sum(dec).cast("double") / F.count("*")).alias("avg_price"),
        F.min(dec).cast("double").alias("min_price"),
        F.max(dec).cast("double").alias("max_price"),
    )


@query(
    "agg_distinct_counts",
    """
    SELECT n.n_name,
           COUNT(*) AS customers,
           COUNT(DISTINCT c.c_mktsegment) AS segments
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: exact COUNT(DISTINCT) after a broadcast dim join."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("customers"),
            F.countDistinct("c_mktsegment").alias("segments"),
        )
    )


@query(
    "agg_duplicate_groups",
    """
    SELECT user_id, event_type, COUNT(*) AS dup_count
    FROM events
    GROUP BY user_id, event_type
    HAVING COUNT(*) > 1
    """,
)
def agg_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: duplicate detection, the engine's data_quality check 4 shape
    (/root/reference/transform/data_quality.sql:78-92)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


@query(
    "quality_whole_table_check",
    """
    SELECT 'high_value_orders' AS check_name,
           COUNT(*) AS records_checked,
           COUNT(*) FILTER (WHERE o_totalprice > 400000) AS records_failed,
           100.0 * COUNT(*) FILTER (WHERE o_totalprice > 400000) / COUNT(*)
               AS fail_rate,
           CASE WHEN COUNT(*) FILTER (WHERE o_totalprice > 400000) = 0
                THEN 'passed'
                WHEN COUNT(*) FILTER (WHERE o_totalprice > 400000)
                     < 0.05 * COUNT(*) THEN 'warning'
                ELSE 'failed' END AS status
    FROM orders
    """,
)
def quality_whole_table_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/A11: one-row whole-table aggregate with tiered status — the shape
    of every reference quality check (data_quality.sql:10-24)."""
    o = load(spark, sf_dir, "orders")
    failed = F.count_if(F.col("o_totalprice") > 400000)
    return o.agg(
        F.lit("high_value_orders").alias("check_name"),
        F.count("*").alias("records_checked"),
        failed.alias("records_failed"),
        (F.lit(100.0) * failed / F.count("*")).alias("fail_rate"),
        F.when(failed == 0, "passed")
        .when(failed < 0.05 * F.count("*"), "warning")
        .otherwise("failed")
        .alias("status"),
    )


@query(
    "agg_pct_scalar_subquery",
    """
    SELECT o_orderstatus,
           COUNT(*) AS orders,
           100.0 * COUNT(*) / (SELECT COUNT(*) FROM orders) AS pct_of_all
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_pct_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: scalar-subquery denominator -> 1-row crossJoin (broadcast
    nested-loop; no driver collect)."""
    o = load(spark, sf_dir, "orders")
    total = o.agg(F.count("*").alias("_total"))
    return (
        o.groupBy("o_orderstatus")
        .agg(F.count("*").alias("orders"))
        .crossJoin(F.broadcast(total))
        .select(
            "o_orderstatus",
            "orders",
            (F.lit(100.0) * F.col("orders") / F.col("_total")).alias("pct_of_all"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@query(
    "join_star_revenue",
    """
    SELECT r.r_name, n.n_name,
           COUNT(*) AS line_count,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J7 composition: the canonical star join. Fact side (lineitem)
    streams; customer/nation/region broadcast so the only shuffle is the
    final group-by. Revenue math in exact decimals."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("line_count"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@query(
    "join_left_unmatched",
    """
    SELECT p.p_partkey, p.p_name,
           COUNT(l.l_orderkey) AS n_lineitems
    FROM part p
    LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey
    GROUP BY p.p_partkey, p.p_name
    """,
)
def join_left_unmatched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J4 left-join semantics: unmatched keys survive with zero counts
    (COUNT(col) skips the NULLs the left join introduces)."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    return (
        p.join(l, p.p_partkey == l.l_partkey, "left")
        .groupBy("p_partkey", "p_name")
        .agg(F.count("l_orderkey").alias("n_lineitems"))
    )


@query(
    "join_semi_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: semi join — one output row per match, no fan-out, probe side
    never materializes the right columns."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti_not_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)
def join_anti_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3's engine primitive: left-anti join (insert-if-absent is
    new.join(existing, key, 'left_anti') before append). Anti-joins
    against the FINISHED-order subset, not all orders: at every
    testdata SF each customer has some order, so the all-orders anti
    set is empty and a gate row over it verifies nothing (round-6
    VERDICT "vacuous oracle"); customers whose orders are all still
    open make the expected result provably non-empty."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Dedup / upsert / SCD
# ---------------------------------------------------------------------------

@query(
    "dedup_distinct_pairs",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def dedup_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: projection dedup."""
    return load(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


@query(
    "dedup_latest_per_key",
    """
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_totalprice
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/W2: top-1-per-group, the reference's DISTINCT ON ... ORDER BY
    (load_facts.sql:12-17) with a deterministic tiebreak added."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


@query(
    "upsert_merge_latest_state",
    """
    WITH base AS (
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        ) WHERE rn = 1
    ), incoming AS (
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        ) WHERE rn = 1
    )
    SELECT * FROM incoming
    UNION ALL
    SELECT b.* FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM incoming i
                      WHERE i.o_custkey = b.o_custkey)
    """,
)
def upsert_merge_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: upsert = incoming wins on key collision, absent keys keep the
    base row — the anti-join+union mechanics behind the reference's
    ON CONFLICT DO UPDATE (load_facts.sql:92-98), as one logical plan."""
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")

    def latest(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("o_custkey").orderBy(
            F.desc("o_orderdate"), F.desc("o_orderkey")
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_custkey", "o_orderkey", "o_totalprice")
        )

    base = latest(o.filter(F.col("o_orderdate") < cutoff))
    incoming = latest(o.filter(F.col("o_orderdate") >= cutoff))
    kept = base.join(incoming, "o_custkey", "left_anti")
    return incoming.unionByName(kept)


@query(
    "scd2_change_intervals",
    """
    WITH changes AS (
        SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), versions AS (
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM changes
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM versions
    """,
)
def scd2_change_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5: SCD2 semantics as a query — collapse consecutive identical
    states per key into validity intervals; open interval = current."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    # event_id tie-break: two type-changing events at one ts would
    # otherwise get an arbitrary valid_to (shuffle-order flaky).
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


@query(
    "join_scd2_point_in_time",
    """
    WITH changes AS (
        SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), versions AS (
        SELECT user_id, event_type AS state_type, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM changes
        WHERE prev_type IS NULL OR prev_type <> event_type
    ), purchases AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.event_id, p.purchase_ts,
           v.state_type AS v_state_type,
           v.valid_from AS v_valid_from
    FROM purchases p LEFT JOIN versions v
      ON p.user_id = v.user_id
     AND p.purchase_ts >= v.valid_from
     AND (v.valid_to IS NULL OR p.purchase_ts < v.valid_to)
    """,
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 resolution: each purchase event joined to the
    per-user state VERSION valid at its timestamp (validity intervals
    derived by the scd2_change_intervals logic) — historical facts
    resolve historical attributes, the defining SCD2 warehouse query.
    Every purchase matches exactly one interval by construction."""
    from _event_intelligence_data_warehouse_spark.operators.scd2 import (
        point_in_time_join,
    )

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    # event_id tie-break: two type-changing events at one ts would
    # otherwise get an arbitrary valid_to (shuffle-order flaky).
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = changes.select(
        "user_id",
        F.col("event_type").alias("state_type"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.col("ts").alias("purchase_ts")
    )
    return point_in_time_join(
        purchases, versions, key="user_id", ts_col="purchase_ts"
    ).drop("v_valid_to")


@query(
    "surrogate_keys_dense",
    """
    SELECT row_number() OVER (ORDER BY event_type) AS type_sk, event_type
    FROM (SELECT DISTINCT event_type FROM events)
    """,
)
def surrogate_keys_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U6: deterministic surrogate keys — row_number over an explicit
    natural-key ordering (never monotonically_increasing_id, which is
    nondeterministic across runs and breaks oracle parity)."""
    e = load(spark, sf_dir, "events")
    w = Window.orderBy("event_type")
    return (
        e.select("event_type")
        .distinct()
        .withColumn("type_sk", F.row_number().over(w))
        .select("type_sk", "event_type")
    )


# ---------------------------------------------------------------------------
# Windows / sorts / limits
# ---------------------------------------------------------------------------

@query(
    "window_pct_of_total",
    """
    SELECT event_type, COUNT(*) AS total,
           100.0 * COUNT(*) / SUM(COUNT(*)) OVER () AS pct_of_total
    FROM events GROUP BY event_type
    """,
)
def window_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: grand-total window over an aggregate
    (kpi_queries.sql:78). Empty partitionBy = whole-frame window."""
    e = load(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(F.count("*").alias("total"))
    w = Window.partitionBy()
    return agg.select(
        "event_type",
        "total",
        (F.lit(100.0) * F.col("total") / F.sum("total").over(w)).alias(
            "pct_of_total"
        ),
    )


@query(
    "topk_recent_events",
    """
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 20
    """,
)
def topk_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: top-k — Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge), never a global sort. Deterministic tiebreak on id."""
    e = load(spark, sf_dir, "events")
    return (
        e.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(20)
        .select("event_id", "ts", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Date / time
# ---------------------------------------------------------------------------

@query(
    "dim_date_attributes",
    """
    SELECT CAST(o_orderdate AS DATE) AS full_date,
           dayname(CAST(o_orderdate AS DATE)) AS day_of_week,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS day_number,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS week_number,
           CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT) AS month_number,
           monthname(CAST(o_orderdate AS DATE)) AS month_name,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS quarter,
           CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS year,
           dayofweek(CAST(o_orderdate AS DATE)) IN (0, 6) AS is_weekend
    FROM (SELECT DISTINCT o_orderdate FROM orders)
    """,
)
def dim_date_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1-D6: the dim_date derivation (transform_events.sql:81-97),
    preserving Postgres conventions: DOW 0=Sunday (Spark's dayofweek-1),
    ISO week, trimmed names."""
    o = load(spark, sf_dir, "orders")
    d = F.col("full_date")
    return (
        o.select(F.to_date("o_orderdate").alias("full_date"))
        .distinct()
        .select(
            "full_date",
            weekday_name(d).alias("day_of_week"),
            pg_day_number(d).cast("long").alias("day_number"),
            F.weekofyear(d).cast("long").alias("week_number"),
            F.month(d).cast("long").alias("month_number"),
            F.date_format(d, "MMMM").alias("month_name"),
            F.quarter(d).cast("long").alias("quarter"),
            F.year(d).cast("long").alias("year"),
            F.dayofweek(d).isin(1, 7).alias("is_weekend"),
        )
    )


@query(
    "daily_event_stats",
    """
    SELECT CAST(ts AS DATE) AS run_date,
           COUNT(*) AS n_events,
           (epoch_us(CAST(MAX(ts) AS TIMESTAMP)) // 1000000
            - epoch_us(CAST(MIN(ts) AS TIMESTAMP)) // 1000000) AS span_seconds
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
)
def daily_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7/D8: DATE_TRUNC-day grouping + epoch-seconds interval arithmetic
    (kpi_queries.sql:91,97-99)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date("ts").alias("run_date"))
        .agg(
            F.count("*").alias("n_events"),
            (F.max("ts").cast("long") - F.min("ts").cast("long")).alias(
                "span_seconds"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------

@query(
    "keys_md5_concat_split",
    """
    SELECT s.s_suppkey,
           md5(concat(coalesce(s.s_name, ''), coalesce(n.n_name, '')))
               AS supplier_nk,
           concat(s.s_name, '_', CAST(s.s_suppkey AS VARCHAR)) AS compound_nk,
           split_part(concat(s.s_name, '_', CAST(s.s_suppkey AS VARCHAR)),
                      '_', 2) AS id_back
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def keys_md5_concat_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F3: md5 natural key (byte-identical hex), || concat key, and
    split_part extraction (load_facts.sql:36,82,108)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    compound = F.concat(
        F.col("s_name"), F.lit("_"), F.col("s_suppkey").cast("string")
    )
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey",
        F.md5(
            F.concat(
                F.coalesce(F.col("s_name"), F.lit("")),
                F.coalesce(F.col("n_name"), F.lit("")),
            )
        ).alias("supplier_nk"),
        compound.alias("compound_nk"),
        F.split(compound, "_").getItem(1).alias("id_back"),
    )


@query(
    "fx_case_mapping",
    """
    SELECT c_custkey,
           CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'api'
                             WHEN 'BUILDING' THEN 'csv'
                             ELSE 'unknown' END AS segment_type,
           CAST(CASE c_mktsegment
                WHEN 'AUTOMOBILE' THEN
                    ROUND(CAST(c_acctbal AS DECIMAL(12,2))
                          * CAST(0.92 AS DECIMAL(3,2)), 2)
                WHEN 'BUILDING' THEN
                    ROUND(CAST(c_acctbal AS DECIMAL(12,2))
                          * CAST(1.17 AS DECIMAL(3,2)), 2)
                ELSE CAST(c_acctbal AS DECIMAL(12,2)) END AS DOUBLE)
               AS acctbal_eur
    FROM customer
    """,
)
def fx_case_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6/F7: chained CASE mapping + hard-coded FX normalization
    (load_facts.sql:66-71, transform_events.sql:132-136), decimal-domain."""
    from decimal import Decimal

    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    seg = F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        F.when(seg == "AUTOMOBILE", "api")
        .when(seg == "BUILDING", "csv")
        .otherwise("unknown")
        .alias("segment_type"),
        F.when(seg == "AUTOMOBILE", F.round(bal * F.lit(Decimal("0.92")), 2))
        .when(seg == "BUILDING", F.round(bal * F.lit(Decimal("1.17")), 2))
        .otherwise(bal)
        .cast("double")
        .alias("acctbal_eur"),
    )


@query(
    "round_nullif_guard",
    """
    SELECT l_returnflag,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / nullif(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                             AS DOUBLE), 0) AS price_per_unit
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def round_nullif_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4/F8: decimal ROUND + NULLIF division guard
    (data_quality.sql:17,37; kpi_queries.sql:19-21)."""
    l = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * (
        F.lit(1) - F.col("l_discount").cast("decimal(4,2)")
    )
    return l.groupBy("l_returnflag").agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        (
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
            / F.nullif(
                F.sum(F.col("l_quantity").cast(DEC)).cast("double"), F.lit(0.0)
            )
        ).alias("price_per_unit"),
    )


@query(
    "json_extract_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4's engine primitive: semi-structured JSON field extraction, the
    Spark-side replacement for the reference's driver-side dict drilling
    (api_ingestor.py:60-92)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "setop_customer_cohorts",
    """
    WITH with_open AS (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderstatus = 'O'
    ), with_filled AS (
        SELECT DISTINCT o_custkey AS custkey FROM orders
        WHERE o_orderstatus = 'F'
    ), never_ordered AS (
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey FROM orders
    )
    SELECT 'open_and_filled' AS cohort, COUNT(*) AS n FROM (
        SELECT custkey FROM with_open INTERSECT SELECT custkey FROM with_filled
    )
    UNION ALL
    SELECT 'open_only' AS cohort, COUNT(*) AS n FROM (
        SELECT custkey FROM with_open EXCEPT SELECT custkey FROM with_filled
    )
    UNION ALL
    SELECT 'never_ordered' AS cohort, COUNT(*) AS n FROM never_ordered
    """,
)
def setop_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators (INTERSECT / EXCEPT / UNION ALL — absent from the
    reference, SURVEY.md §2.9) as customer cohort analysis. Spark rewrites
    intersect/except to left-semi/left-anti hash joins on the distinct
    key sets; the three 1-row aggregates union for one output."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    with_open = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    with_filled = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    # subtract = EXCEPT DISTINCT -> left-anti hash join on the key sets;
    # exceptAll would compile to the signed-count replicate/aggregate plan
    # over all of orders, far heavier for identical results here.
    never = customer.select(F.col("c_custkey").alias("custkey")).subtract(
        orders.select(F.col("o_custkey").alias("custkey"))
    )

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("cohort"), F.count("*").alias("n")
        )

    return (
        one("open_and_filled", with_open.intersect(with_filled))
        .unionByName(one("open_only", with_open.subtract(with_filled)))
        .unionByName(one("never_ordered", never))
    )


@query(
    "join_null_safe",
    """
    WITH e AS (
        SELECT event_id,
               CASE WHEN event_type = 'error' THEN NULL
                    ELSE event_type END AS etype
        FROM events
    ), d AS (
        SELECT * FROM (VALUES
            ('view', 'engagement'), ('click', 'engagement'),
            ('purchase', 'revenue'), ('signup', 'growth'),
            (NULL, 'unattributed')
        ) AS t(etype, category)
    )
    SELECT d.category, COUNT(*) AS n_events
    FROM e JOIN d ON e.etype IS NOT DISTINCT FROM d.etype
    GROUP BY 1
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    the dimension's NULL row instead of silently dropping — the lookup
    semantics a 'route unknowns to a catch-all bucket' mapping needs.
    A plain equi-join would lose every NULL-keyed event; the null-safe
    operator keeps the join hash-able (it is still an equi-join to
    Catalyst, broadcast-able as usual)."""
    e = load(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("etype"),
    )
    d = spark.createDataFrame(
        [
            ("view", "engagement"), ("click", "engagement"),
            ("purchase", "revenue"), ("signup", "growth"),
            (None, "unattributed"),
        ],
        "etype string, category string",
    )
    return (
        e.join(F.broadcast(d), e.etype.eqNullSafe(d.etype))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "setop_multiset_ops",
    """
    WITH a AS (
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    ), b AS (
        SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    ), ex AS (
        SELECT k, 'except_all' AS op FROM (SELECT k FROM a EXCEPT ALL
                                           SELECT k FROM b)
        UNION ALL
        SELECT k, 'intersect_all' AS op FROM (SELECT k FROM a INTERSECT ALL
                                              SELECT k FROM b)
    )
    SELECT op, k AS custkey, COUNT(*) AS multiplicity
    FROM ex GROUP BY 1, 2
    """,
)
def setop_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL) over
    customer keys of two order populations: multiplicities are
    per-element min/difference of occurrence counts — semantics a
    DISTINCT-based setop silently destroys (a customer with 3 'F'
    orders and 1 urgent order keeps 2 copies in the difference).
    Both compile to aggregate+join under Catalyst, no sort."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    b = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    ex = a.exceptAll(b).select("k", F.lit("except_all").alias("op"))
    inter = b.intersectAll(a).select(
        "k", F.lit("intersect_all").alias("op")
    )
    # intersectAll is symmetric; b-first keeps the build side the
    # smaller population at scale.
    return (
        ex.unionByName(inter)
        .groupBy("op", F.col("k").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )


@query(
    "trending_types_weekly",
    """
    WITH daily AS (
        SELECT event_type,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
               COUNT(*) AS y
        FROM events GROUP BY 1, 2
    ), days AS (SELECT DISTINCT d FROM daily),
    rolled AS (
        SELECT days.d AS day, a.event_type,
               CAST(SUM(a.y) AS BIGINT) AS n_7d
        FROM days
        JOIN daily a ON a.d BETWEEN days.d - 6 AND days.d
        GROUP BY 1, 2
    )
    SELECT day, event_type, n_7d,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY day ORDER BY n_7d DESC, event_type
           ) AS BIGINT) AS rk
    FROM rolled
    QUALIFY rk <= 3
    """,
)
def trending_types_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending event types: per day, the top-3 types by trailing-7-day
    volume — the rolling-leaderboard composite (daily rollup -> bounded
    range self-join -> per-day rank).

    100 TB: identical scale shape to analytics_rolling_wau — the range
    join and ranking run on the calendar-bounded daily frame, the
    corpus is touched once by the rollup."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    days = daily.select("d").distinct().withColumnRenamed("d", "day")
    rolled = (
        days.join(
            daily,
            (F.col("d") >= F.date_sub(F.col("day"), 6))
            & (F.col("d") <= F.col("day")),
        )
        .groupBy("day", "event_type")
        .agg(F.sum("y").cast("bigint").alias("n_7d"))
    )
    w = W.partitionBy("day").orderBy(
        F.col("n_7d").desc(), F.col("event_type")
    )
    return (
        rolled.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 3)
    )


@query(
    "sql_frontend_daily_mix",
    """
    WITH daily AS (
        SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ), tot AS (
        SELECT day, SUM(n) AS day_total FROM daily GROUP BY 1
    )
    SELECT d.day, d.event_type, CAST(d.n AS BIGINT) AS n,
           CAST(d.n * 1000000 // t.day_total AS BIGINT) AS mix_ppm,
           CAST(DENSE_RANK() OVER (
               PARTITION BY d.day ORDER BY d.n DESC, d.event_type
           ) AS BIGINT) AS rnk
    FROM daily d JOIN tot t USING (day)
    """,
)
def sql_frontend_daily_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME query class as the KPI views but issued as raw SQL TEXT
    over registered temp views — pinning the spark.sql front-end
    (parser -> Catalyst) as a first-class entry point, not just the
    DataFrame DSL. A user of the reference's SQL scripts
    (transform_events.sql:53-171 style) can port statements verbatim.

    The view registration is per-query-scoped (createOrReplaceTempView
    on the driver-loaded frame); Catalyst sees the identical plan the
    DSL would build — one rollup, a per-day total, a window rank.
    """
    load(spark, sf_dir, "events").createOrReplaceTempView(
        "events_sqlfe"
    )
    return spark.sql(
        """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
            FROM events_sqlfe GROUP BY 1, 2
        ), tot AS (
            SELECT day, SUM(n) AS day_total FROM daily GROUP BY 1
        )
        SELECT d.day, d.event_type, CAST(d.n AS BIGINT) AS n,
               CAST(d.n * 1000000 DIV t.day_total AS BIGINT) AS mix_ppm,
               CAST(DENSE_RANK() OVER (
                   PARTITION BY d.day ORDER BY d.n DESC, d.event_type
               ) AS BIGINT) AS rnk
        FROM daily d JOIN tot t USING (day)
        """
    )


@query(
    "sql_recursive_event_chains",
    """
    WITH RECURSIVE nxt AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               lead(event_id) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt_id,
               lead(CAST(ts AS TIMESTAMP)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS nxt_ts
        FROM events
    ), e AS (
        SELECT event_id AS src, nxt_id AS dst FROM nxt
        WHERE nxt_id IS NOT NULL
          AND epoch_us(nxt_ts) - epoch_us(CAST(ts AS TIMESTAMP))
              <= 1800000000
    ), chain AS (
        SELECT event_id AS seed_id, event_id, 0 AS hop
        FROM events WHERE event_id % 101 = 0
        UNION ALL
        SELECT c.seed_id, e.dst AS event_id, c.hop + 1
        FROM chain c JOIN e ON e.src = c.event_id
        WHERE c.hop < 8
    )
    SELECT CAST(seed_id AS BIGINT) AS seed_id,
           CAST(event_id AS BIGINT) AS event_id,
           CAST(hop AS BIGINT) AS hop
    FROM chain
    """,
)
def sql_recursive_event_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE recursive CTE (Spark 4's WITH RECURSIVE / UnionLoop
    operator) walking successor chains: each event's successor is the
    same user's next event within 30 minutes (lead() edge, ties broken
    by event_id), seeds are the deterministic event_id % 101 sample,
    recursion emits (seed_id, event_id, hop) to depth 8. The successor
    relation is FUNCTIONAL (<= 1 out-edge per node, time-increasing),
    so UNION ALL recursion cannot multiply rows or cycle — each level
    is a bounded equi-join, exactly the shape khop_min_hops hand-rolls
    with DataFrame loops; this query pins the engine's built-in
    recursion against the same semantics (DuckDB's recursive CTE is
    the oracle). 100 TB: per-level work is one hash join keyed on
    event_id; depth is contract-bounded at 8."""
    load(spark, sf_dir, "events").createOrReplaceTempView(
        "events_chain_src"
    )
    return spark.sql(
        """
        WITH RECURSIVE nxt AS (
            SELECT event_id, user_id, ts,
                   lead(event_id) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt_id,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt_ts
            FROM events_chain_src
        ), e AS (
            SELECT event_id AS src, nxt_id AS dst FROM nxt
            WHERE nxt_id IS NOT NULL
              AND unix_micros(nxt_ts) - unix_micros(ts) <= 1800000000
        ), chain AS (
            SELECT event_id AS seed_id, event_id,
                   CAST(0 AS BIGINT) AS hop
            FROM events_chain_src WHERE event_id % 101 = 0
            UNION ALL
            SELECT c.seed_id, e.dst AS event_id, c.hop + 1
            FROM chain c JOIN e ON e.src = c.event_id
            WHERE c.hop < 8
        )
        SELECT CAST(seed_id AS BIGINT) AS seed_id,
               CAST(event_id AS BIGINT) AS event_id,
               CAST(hop AS BIGINT) AS hop
        FROM chain
        """
    )
