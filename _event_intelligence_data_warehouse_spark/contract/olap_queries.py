"""Canonical OLAP join/aggregation topologies (TPC-H-adapted).

The reference warehouse (dashboard/kpi_queries.sql:11-118) exercises
star-join KPIs over its own fact table; these queries extend the same
relational surface to six canonical decision-support shapes every
warehouse engine is judged on — full-scan aggregate (Q1), selective
3-way join + top-k (Q3), multi-path snowflake join with a co-location
predicate (Q5), agg-then-max-view (Q15), decorrelated correlated-AVG
filter (Q17) and HAVING-join-back top-k (Q18) — re-expressed
Spark-first on the driver's TPC-H-ish testdata.

Numeric portability (house rules + memory notes):
- money doubles are exact 2-decimal values -> cast to DECIMAL before any
  product/sum; cast the final aggregate to DOUBLE;
- averages use HUGEINT/DECIMAL(38,0) floor division in ppm (DuckDB
  ``//`` on HUGEINT and Spark ``div`` on DECIMAL are both exact), never
  float division;
- top-k cutoffs order by the exact DECIMAL revenue with an integer key
  tiebreak so both engines select the same rows.

Scale notes (100 TB):
- Q1 is a pure map-side-combinable scan: 6 output groups, no join.
- Q3/Q5 let AQE pick the join strategy; only provably tiny sides
  (region: 5 rows, nation: 25) carry an explicit broadcast hint.
- Q15's max-revenue view reuses one aggregate for both the max and the
  filter via a window over an empty frame (no second scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.contract import load, query

_DEC = "decimal(18,2)"
_D4 = "decimal(4,2)"


@query(
    "olap_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
               AS sum_charge,
           CAST(SUM(CAST(l_quantity AS BIGINT)) * 1000000 // COUNT(*)
                AS BIGINT) AS avg_qty_ppm,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) * 10000 // COUNT(*)
                AS BIGINT) AS avg_price_ppm,
           CAST(SUM(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100
                         AS BIGINT)) * 10000 // COUNT(*)
                AS BIGINT) AS avg_disc_ppm,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def olap_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-scan pricing summary with exact-decimal
    sums and integer-ppm averages.

    100 TB: no join, no wide shuffle — partial aggregation reduces each
    scan task to at most |returnflag| x |linestatus| (= 6) rows before
    the exchange, so the final shuffle moves kilobytes regardless of
    input size. The ppm averages divide once per output group.
    """
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast(_DEC)
    disc = F.col("l_discount").cast(_D4)
    tax = F.col("l_tax").cast(_D4)
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.sum(price).alias("_sum_base"),
        F.sum(price * (F.lit(1) - disc)).alias("_sum_disc"),
        F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)).alias(
            "_sum_charge"
        ),
        F.sum((price * 100).cast("bigint")).alias("_sum_cents"),
        F.sum((disc * 100).cast("bigint")).alias("_sum_disc_c"),
        F.count(F.lit(1)).alias("count_order"),
    )
    # DECIMAL(38,0) `div` is exact integral division on both engines
    # (int64 would overflow: sum_cents * 1e4 passes 9.2e18 near sf100).
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        F.col("_sum_base").cast("double").alias("sum_base_price"),
        F.col("_sum_disc").cast("double").alias("sum_disc_price"),
        F.col("_sum_charge").cast("double").alias("sum_charge"),
        F.expr(
            "CAST(CAST(sum_qty AS DECIMAL(38,0)) * 1000000"
            " div count_order AS BIGINT)"
        ).alias("avg_qty_ppm"),
        F.expr(
            "CAST(CAST(_sum_cents AS DECIMAL(38,0)) * 10000"
            " div count_order AS BIGINT)"
        ).alias("avg_price_ppm"),
        F.expr(
            "CAST(CAST(_sum_disc_c AS DECIMAL(38,0)) * 10000"
            " div count_order AS BIGINT)"
        ).alias("avg_disc_ppm"),
        "count_order",
    )


@query(
    "olap_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-06-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) DESC,
             l.l_orderkey
    LIMIT 10
    """,
)
def olap_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective customer->orders->lineitem join, top-10
    unshipped orders by revenue.

    The segment filter and both date filters are plain column
    predicates, so they push to the parquet scans; the top-k sorts the
    EXACT decimal revenue (ties broken by orderkey) and compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort.
    100 TB: AQE sizes the two joins (filtered customer is ~1/5 of the
    table — broadcast at low SF, shuffle join beyond); the aggregate
    keys on l_orderkey, which lineitem is already clustered by.
    """
    cutoff = F.lit("1998-06-15 00:00:00").cast("timestamp")
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1) - F.col("l_discount").cast(_D4))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("_rev").cast("double").alias("revenue"),
            "o_orderdate",
        )
    )


@query(
    "olap_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS revenue,
           COUNT(*) AS line_count
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def olap_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake join where the supplier must share the
    customer's nation — a join predicate that spans two dimension paths.

    100 TB: nation (25 rows) and region (5) carry explicit broadcast
    hints — provably bounded. Supplier and customer go through AQE.
    The s_nationkey = c_nationkey residual rides on the supplier join
    (equi-key l_suppkey) instead of forcing an extra shuffle.
    """
    year = (
        F.col("o_orderdate")
        >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ) & (
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        load(spark, sf_dir, "orders")
        .where(year)
        .select("o_orderkey", "o_custkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(
        load(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
    )
    r = F.broadcast(
        load(spark, sf_dir, "region")
        .where(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1) - F.col("l_discount").cast(_D4))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev).alias("_rev"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .select(
            "n_name",
            F.col("_rev").cast("double").alias("revenue"),
            "line_count",
        )
    )


@query(
    "olap_top_supplier_share",
    """
    WITH srev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(v.total_rev AS DOUBLE) AS total_revenue
    FROM srev v
    JOIN supplier s ON s.s_suppkey = v.l_suppkey
    WHERE v.total_rev = (SELECT MAX(total_rev) FROM srev)
    """,
)
def olap_top_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue view, then the supplier(s)
    achieving the maximum.

    The max and the filter reuse ONE aggregate: a whole-table max window
    over the grouped result instead of a second scan + scalar subquery.
    Exact DECIMAL revenue makes the `= max` comparison deterministic
    across engines (doubles would make ties engine-dependent).
    100 TB: the view aggregate is map-side-combinable on l_suppkey; the
    window over an unpartitioned frame sees one row per supplier (the
    grouped result), not per lineitem.
    """
    li = load(spark, sf_dir, "lineitem").where(
        (
            F.col("l_shipdate")
            >= F.lit("1997-01-01 00:00:00").cast("timestamp")
        )
        & (
            F.col("l_shipdate")
            < F.lit("1997-04-01 00:00:00").cast("timestamp")
        )
    )
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1) - F.col("l_discount").cast(_D4))
    )
    srev = li.groupBy("l_suppkey").agg(F.sum(rev).alias("total_rev"))
    w = Window.partitionBy()
    top = srev.withColumn("_mx", F.max("total_rev").over(w)).where(
        F.col("total_rev") == F.col("_mx")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        top.join(s, top.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@query(
    "olap_small_order_revenue",
    """
    WITH a AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
               COUNT(*) AS c
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS small_lot_revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#13'
    JOIN a ON l.l_partkey = a.l_partkey
    WHERE CAST(l.l_quantity AS BIGINT) * 5 * a.c < a.s
    """,
)
def olap_small_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-lot lines — quantity below
    20% of the part's own average — for one brand.

    The correlated AVG decorrelates into a self-aggregate + equi-join,
    and the fractional threshold becomes the EXACT integer predicate
    qty * 5 * count < sum (avg = sum/count; no division at all).
    100 TB: the per-part aggregate is map-side-combinable on the join
    key itself; the brand filter broadcasts through the part join so
    AQE can prune the fact scan side early.
    """
    li = load(spark, sf_dir, "lineitem")
    a = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("s"),
        F.count(F.lit(1)).alias("c"),
    )
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(a, "l_partkey")
        .where(
            F.col("l_quantity").cast("bigint") * 5 * F.col("c")
            < F.col("s")
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC))
            .cast("double")
            .alias("small_lot_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "olap_large_orders",
    """
    WITH q AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(l_quantity AS BIGINT)) > 180
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
               AS o_totalprice,
           q.sum_qty
    FROM orders o
    JOIN q ON q.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY CAST(o.o_totalprice AS DECIMAL(18,2)) DESC, o.o_orderkey
    LIMIT 20
    """,
)
def olap_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the 20 priciest orders whose total quantity
    exceeds 180 units — HAVING on a fact self-aggregate joined back to
    its header and dimension.

    100 TB: the quantity rollup keys on l_orderkey (lineitem's natural
    clustering); the HAVING prunes before any join; the top-20 sorts
    the exact DECIMAL price with an orderkey tiebreak and compiles to
    TakeOrderedAndProject.
    """
    li = load(spark, sf_dir, "lineitem")
    q = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("sum_qty")
        )
        .where(F.col("sum_qty") > 180)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    price = F.col("o_totalprice").cast(_DEC)
    return (
        o.join(q, o.o_orderkey == q.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .withColumn("_p", price)
        .orderBy(F.col("_p").desc(), F.col("o_orderkey"))
        .limit(20)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("_p").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


@query(
    "olap_promo_revenue_share",
    """
    SELECT
        CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
            AS promo_revenue,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
            AS total_revenue,
        CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                           * 10000 AS BIGINT) ELSE 0 END) * 1000000
             // SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                         * 10000 AS BIGINT)) AS BIGINT)
            AS promo_share_ppm
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def olap_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo parts' share of one month's revenue.

    The share divides two exact integer sums (revenue in ten-thousandth
    units — DECIMAL(18,4) is exact there, and scaling to integers
    sidesteps DuckDB's DECIMAL//-through-DOUBLE path) with a
    DECIMAL(38,0)/HUGEINT floor division. 100 TB: month filter pushes
    to the scan; part is the only join (AQE decides broadcast); one
    global aggregate.
    """
    li = load(spark, sf_dir, "lineitem").where(
        (
            F.col("l_shipdate")
            >= F.lit("1997-03-01 00:00:00").cast("timestamp")
        )
        & (
            F.col("l_shipdate")
            < F.lit("1997-04-01 00:00:00").cast("timestamp")
        )
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1) - F.col("l_discount").cast(_D4))
    )
    rev_i = (rev * 10000).cast("bigint")
    is_promo = F.col("p_type") == "PROMO"
    agg = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(
                F.when(is_promo, rev).otherwise(
                    F.lit("0.00").cast(_DEC)
                )
            ).alias("_promo"),
            F.sum(rev).alias("_total"),
            F.sum(F.when(is_promo, rev_i).otherwise(0)).alias("_pi"),
            F.sum(rev_i).alias("_ti"),
        )
    )
    return agg.select(
        F.col("_promo").cast("double").alias("promo_revenue"),
        F.col("_total").cast("double").alias("total_revenue"),
        F.expr(
            "CAST(CAST(_pi AS DECIMAL(38,0)) * 1000000 DIV _ti"
            " AS BIGINT)"
        ).alias("promo_share_ppm"),
    )


@query(
    "olap_single_late_supplier",
    """
    WITH lat AS (
        SELECT l.l_orderkey, l.l_suppkey,
               MAX(CASE WHEN date_diff('day',
                                       CAST(o.o_orderdate AS TIMESTAMP),
                                       CAST(l.l_shipdate AS TIMESTAMP))
                             > 100
                        THEN 1 ELSE 0 END) AS late
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ), po AS (
        SELECT l_orderkey,
               COUNT(*) AS n_supp,
               SUM(late) AS n_late,
               MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
        FROM lat GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           COUNT(*) AS numwait
    FROM po
    JOIN supplier s ON s.s_suppkey = po.late_supp
    WHERE po.n_supp >= 2 AND po.n_late = 1
    GROUP BY 1, 2
    ORDER BY numwait DESC, s.s_suppkey
    LIMIT 10
    """,
)
def olap_single_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper in
    multi-supplier orders (late = shipped >100 days after order date).

    The classic double-EXISTS/NOT-EXISTS decorrelates into two stacked
    aggregates on (order, supplier) then (order): per-order supplier
    counts, late counts and the single late supplier fall out of one
    pass — no correlated subqueries, no rescans. 100 TB: both
    aggregates key on l_orderkey (lineitem's clustering); the top-10 is
    a heap.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                    > 100,
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    po = lat.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("late_supp"),
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        po.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(s, po.late_supp == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey"))
        .limit(10)
    )


@query(
    "olap_share_of_parent",
    """
    WITH rev AS (
        SELECT r.r_name, n.n_name,
               CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                             * 100 AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    )
    SELECT r_name, n_name,
           CAST(cents AS DOUBLE) / 100 AS revenue,
           CAST(CAST(cents AS HUGEINT) * 1000000
                // SUM(cents) OVER (PARTITION BY r_name) AS BIGINT)
               AS share_of_region_ppm,
           CAST(CAST(SUM(cents) OVER (PARTITION BY r_name) AS HUGEINT)
                * 1000000 // SUM(cents) OVER () AS BIGINT)
               AS region_share_ppm
    FROM rev
    """,
)
def olap_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical percent-of-parent rollup: each nation's share of
    its region's supplier revenue, and the region's share of the world
    — both in exact ppm over integer cents (revenue itself is
    cents/100, exact in a double far below 2^53).

    100 TB: one star aggregate to |nations| rows, then two windows over
    that tiny frame — the share arithmetic never touches the fact
    table.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(
        load(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
    )
    r = F.broadcast(
        load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    )
    cents = (
        F.col("l_extendedprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(cents).cast("bigint").alias("cents"))
    )
    return rev.select(
        "r_name",
        "n_name",
        (F.col("cents").cast("double") / 100).alias("revenue"),
        F.expr(
            "CAST(CAST(cents AS DECIMAL(38,0)) * 1000000"
            " DIV (SUM(cents) OVER (PARTITION BY r_name)) AS BIGINT)"
        ).alias("share_of_region_ppm"),
        F.expr(
            "CAST(CAST(SUM(cents) OVER (PARTITION BY r_name)"
            " AS DECIMAL(38,0)) * 1000000"
            " DIV (SUM(cents) OVER ()) AS BIGINT)"
        ).alias("region_share_ppm"),
    )


@query(
    "olap_customer_order_histogram",
    """
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '5-LOW'
        GROUP BY 1
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM per_cust
    GROUP BY 1
    """,
)
def olap_customer_order_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count, with
    the join predicate INSIDE the left join so zero-order customers
    stay in the histogram (moving the filter to WHERE would silently
    drop them — the classic outer-join bug this query pins).

    100 TB: two stacked aggregates — (custkey) then (n_orders) — both
    map-side-combinable; COUNT(o_orderkey) counts only matched rows by
    NULL semantics, no CASE needed.
    """
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@query(
    "olap_dormant_rich_customers",
    """
    WITH pos AS (
        SELECT CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS bal_c,
               c_custkey, c_nationkey
        FROM customer
        WHERE c_acctbal > 0
    ), avg_ AS (
        SELECT CAST(SUM(bal_c) AS HUGEINT) AS s, COUNT(*) AS n FROM pos
    )
    SELECT p.c_nationkey,
           COUNT(*) AS n_customers,
           CAST(SUM(p.bal_c) AS DOUBLE) / 100 AS total_balance
    FROM pos p CROSS JOIN avg_ a
    WHERE CAST(p.bal_c AS HUGEINT) * a.n > a.s
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = p.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY 1
    """,
)
def olap_dormant_rich_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape: per-nation count and total balance of customers
    with an above-average positive balance and no orders since
    2000-01-01 (dormant high-value accounts; the unrestricted
    no-orders-ever set is empty on this data, which would make the
    oracle a trivial 0-row match).

    The 'balance > avg(balance)' comparison is the exact integer cross
    product bal*N > SUM (avg = SUM/N; no division, no floats); the NOT
    EXISTS is a left-anti join against order custkeys. 100 TB: the
    1-row average broadcasts; the anti join is the only wide exchange
    and AQE sizes it.
    """
    pos = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(
            (F.col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("bal_c"),
            "c_custkey",
            "c_nationkey",
        )
    )
    avg_ = pos.agg(
        F.sum("bal_c").cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(
            F.col("o_orderdate")
            >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    rich = pos.crossJoin(F.broadcast(avg_)).where(
        F.expr("CAST(bal_c AS DECIMAL(38,0)) * n > s")
    )
    dormant = rich.join(
        o, rich.c_custkey == o.o_custkey, "left_anti"
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("bal_c").cast("double") / 100).alias("total_balance"),
    )


@query(
    "olap_disjunctive_promo_revenue",
    """
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12'
           AND l.l_quantity BETWEEN 1 AND 11 AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23'
           AND l.l_quantity BETWEEN 10 AND 20 AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#34'
           AND l.l_quantity BETWEEN 20 AND 30 AND p.p_size BETWEEN 1 AND 15)
    """,
)
def olap_disjunctive_promo_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q19 shape: revenue under a DISJUNCTION of conjunctive
    (brand, size, quantity-band) triples spanning both join sides — the
    predicate class that breaks naive pushdown (no single conjunct
    filters either side alone).

    Catalyst still extracts the COMMON implications: each disjunct
    bounds l_quantity in [1,30] and p_size in [1,15], so derived range
    filters reach both scans while the full disjunction evaluates on
    the joined rows. 100 TB: the part side prunes hard on the derived
    size filter; AQE sizes the join.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q = F.col("l_quantity")
    s = F.col("p_size")
    b = F.col("p_brand")
    pred = (
        ((b == "Brand#12") & q.between(1, 11) & s.between(1, 5))
        | ((b == "Brand#23") & q.between(10, 20) & s.between(1, 10))
        | ((b == "Brand#34") & q.between(20, 30) & s.between(1, 15))
    )
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1) - F.col("l_discount").cast(_D4))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .where(pred)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@query(
    "olap_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 25
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2
    """,
)
def olap_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type) for
    small parts, EXCLUDING a supplier blacklist via NOT IN — which is a
    null-safe anti join, not a plain one (NOT IN with any NULL in the
    subquery yields empty; s_suppkey is non-null here, and the
    DataFrame side uses an explicit anti join on the non-null keys to
    pin the same semantics).

    100 TB: the blacklist aggregates to a broadcastable key set; the
    count-distinct is one partial-agg pass over the joined frame.
    """
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_size") <= 25)
        .select("p_partkey", "p_brand", "p_type")
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad, "l_suppkey", "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").cast("bigint").alias(
                "supplier_cnt"
            )
        )
    )


@query(
    "olap_forecast_revenue_change",
    """
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS forgone_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND CAST(l_discount AS DECIMAL(4,2))
              BETWEEN CAST(0.05 AS DECIMAL(4,2))
                  AND CAST(0.07 AS DECIMAL(4,2))
      AND l_quantity < 24
    """,
)
def olap_forecast_revenue_change(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q6 shape: the pure filter-scan aggregate (revenue forgone
    by a discount band in one year). All three predicates are plain
    column comparisons — every one reaches the parquet scan as a pushed
    filter, which tests/test_olap.py asserts; the discount band
    compares DECIMAL-exact values (a raw-double BETWEEN on 0.05/0.07
    would be representation-dependent).
    """
    li = load(spark, sf_dir, "lineitem")
    d = F.col("l_discount").cast(_D4)
    return (
        li.where(
            (
                F.col("l_shipdate")
                >= F.lit("1997-01-01 00:00:00").cast("timestamp")
            )
            & (
                F.col("l_shipdate")
                < F.lit("1998-01-01 00:00:00").cast("timestamp")
            )
            & (d >= F.lit("0.05").cast(_D4))
            & (d <= F.lit("0.07").cast(_D4))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast(_DEC) * d)
            .cast("double")
            .alias("forgone_revenue"),
        )
    )


@query(
    "olap_trade_volume_pairs",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(EXTRACT(year FROM CAST(l.l_shipdate AS TIMESTAMP))
                AS BIGINT) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE ((cn.n_name = 'NATION_3' AND sn.n_name = 'NATION_7')
        OR (cn.n_name = 'NATION_7' AND sn.n_name = 'NATION_3'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def olap_trade_volume_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between one nation PAIR
    (both directions) per ship year — the two-role dimension join
    (nation joined twice under different roles) with a cross-side
    disjunction.

    100 TB: both nation copies broadcast (25 rows each); the pair
    disjunction can't pre-filter either base scan alone, but the two
    broadcast joins make it a streaming filter on the fact pipeline.
    """
    li = load(spark, sf_dir, "lineitem").where(
        (
            F.col("l_shipdate")
            >= F.lit("1996-01-01 00:00:00").cast("timestamp")
        )
        & (
            F.col("l_shipdate")
            < F.lit("1998-01-01 00:00:00").cast("timestamp")
        )
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = F.broadcast(n.select(
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_name").alias("cust_nation"),
    ))
    sn = F.broadcast(n.select(
        F.col("n_nationkey").alias("s_nk"),
        F.col("n_name").alias("supp_nation"),
    ))
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1) - F.col("l_discount").cast(_D4))
    )
    pair = (
        (F.col("cust_nation") == "NATION_3")
        & (F.col("supp_nation") == "NATION_7")
    ) | (
        (F.col("cust_nation") == "NATION_7")
        & (F.col("supp_nation") == "NATION_3")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(cn, F.col("c_nationkey") == F.col("c_nk"))
        .join(sn, F.col("s_nationkey") == F.col("s_nk"))
        .where(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(F.sum(rev).cast("double").alias("volume"))
    )


@query(
    "olap_margin_by_nation_year",
    """
    SELECT n.n_name, 
           CAST(EXTRACT(year FROM CAST(l.l_shipdate AS TIMESTAMP))
                AS BIGINT) AS ship_year,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                         * 10000 AS BIGINT)
                    - CAST(l.l_quantity AS BIGINT)
                      * CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
                             * 100 AS BIGINT) * 80) AS BIGINT)
               AS margin_tenthousandths
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
def olap_margin_by_nation_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q9 shape (adapted: the testdata has no partsupp, so cost
    is proxied as 80% of the part's retail price): signed margin per
    supplier nation per ship year, in exact integer ten-thousandths —
    revenue*1e4 minus qty*retail_cents*80 stays int64 far past these
    scales, widened to HUGEINT/DECIMAL(38,0) by the SUM.

    100 TB: a three-dim star (part/supplier/nation — nation broadcast,
    the rest AQE-sized) with one combinable signed aggregate.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(
        load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    rev_t = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)"
    )
    cost_t = (
        F.col("l_quantity").cast("bigint")
        * F.expr(
            "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        )
        * 80
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            "n_name",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            F.sum(rev_t - cost_t).cast("bigint").alias(
                "margin_tenthousandths"
            )
        )
    )


@query(
    "olap_returned_item_report",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
               AS lost_revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) DESC,
             c.c_custkey
    LIMIT 20
    """,
)
def olap_returned_item_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers losing the most revenue to
    returns in one quarter. Same heap-top-k discipline as Q3/Q18
    (exact DECIMAL ordering, custkey tiebreak, TakeOrderedAndProject).
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    o = load(spark, sf_dir, "orders").where(
        (
            F.col("o_orderdate")
            >= F.lit("1997-07-01 00:00:00").cast("timestamp")
        )
        & (
            F.col("o_orderdate")
            < F.lit("1997-10-01 00:00:00").cast("timestamp")
        )
    ).select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = F.broadcast(
        load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    rev = (
        F.col("l_extendedprice").cast(_DEC)
        * (F.lit(1) - F.col("l_discount").cast(_D4))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("_rev").cast("double").alias("lost_revenue"),
        )
    )


@query(
    "olap_min_cost_supplier",
    """
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS min_cost_c
        FROM lineitem GROUP BY 1, 2
    ), ranked AS (
        SELECT p.p_partkey, s.s_name, s.s_acctbal, n.n_name,
               supply.min_cost_c,
               MIN(supply.min_cost_c) OVER (PARTITION BY p.p_partkey)
                   AS best_c
        FROM part p
        JOIN supply   ON supply.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = supply.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE p.p_size >= 40 AND p.p_type = 'ECONOMY'
          AND r.r_name = 'EUROPE'
    )
    SELECT p_partkey, s_name, s_acctbal, n_name, min_cost_c
    FROM ranked WHERE min_cost_c = best_c
    ORDER BY s_acctbal DESC, p_partkey, s_name
    LIMIT 100
    """,
)
def olap_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: the testdata has no partsupp, so the
    supplier-part catalog and its cost are derived from lineitem — cost
    = the cheapest observed extended price in exact cents): for large
    ECONOMY parts, the EUROPE supplier(s) matching the per-part minimum
    cost, ranked by account balance.

    The correlated MIN subquery of the original decorrelates into one
    window MIN partitioned by p_partkey — a single extra exchange on a
    frame already shuffled by part for the join, not a second scan.

    100 TB: the supply derivation is a combinable (partkey, suppkey)
    aggregate; part's size/type filter is pushed to its scan and prunes
    before the join; region/nation broadcast; the window's partition key
    equals the join key so AQE coalesces without an extra shuffle.
    Cites reference dashboard/kpi_queries.sql:11-118 (star-join KPI
    surface this family extends).
    """
    li = load(spark, sf_dir, "lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.expr(
                "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100"
                " AS BIGINT)"
            )
        ).alias("min_cost_c")
    )
    p = (
        load(spark, sf_dir, "part")
        .where((F.col("p_size") >= 40) & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = F.broadcast(
        load(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
    )
    r = F.broadcast(
        load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    )
    joined = (
        supply.join(p, supply.l_partkey == p.p_partkey)
        .join(s, supply.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("best_c", F.min("min_cost_c").over(w))
        .where(F.col("min_cost_c") == F.col("best_c"))
        .select("p_partkey", "s_name", "s_acctbal", "n_name", "min_cost_c")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


@query(
    "olap_order_priority_exists",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def olap_order_priority_exists(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q4 shape (adapted: commitdate/receiptdate don't exist, so
    "late" = any line shipped more than 30 days after the order date):
    order counts per priority for one quarter, EXISTS expressed as a
    LEFT SEMI join with the non-equi residual evaluated inside the join.

    100 TB: the quarter filter prunes orders before the semi join; the
    semi join ships only (orderkey, orderdate) and short-circuits per
    key on the build side; the final 5-group aggregate is map-side
    combinable.
    """
    o = load(spark, sf_dir, "orders").where(
        (
            F.col("o_orderdate")
            >= F.lit("1996-01-01 00:00:00").cast("timestamp")
        )
        & (
            F.col("o_orderdate")
            < F.lit("1996-04-01 00:00:00").cast("timestamp")
        )
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "olap_nation_market_share",
    """
    WITH vol AS (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2))) * 10000
                    AS BIGINT) AS rev_t,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o    ON o.o_orderkey = l.l_orderkey
        JOIN part p      ON p.p_partkey = l.l_partkey
        JOIN customer c  ON c.c_custkey = o.o_custkey
        JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
        JOIN region r    ON r.r_regionkey = cn.n_regionkey
        JOIN supplier s  ON s.s_suppkey = l.l_suppkey
        JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev_t
                         ELSE 0 END) * 1000000000
                // SUM(rev_t) AS BIGINT) AS share_ppb,
           CAST(SUM(rev_t) AS BIGINT) AS market_tenthousandths
    FROM vol GROUP BY o_year
    """,
)
def olap_nation_market_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q8 shape: NATION_7's share of the ASIA PROMO-part market
    per order year, as an exact parts-per-billion integer (DECIMAL(38,0)
    floor division on both engines — the [[oracle-numeric-portability]]
    recipe), so no float summation order can flip a digit.

    100 TB: a snowflake with two independent dim paths (customer->
    nation->region gates the market, supplier->nation labels the
    share). Only provably tiny dims (nation 25, region 5) carry
    broadcast hints; part/customer/supplier sizing is left to AQE. The
    conditional numerator folds into the same single aggregate pass as
    the denominator.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation")
    cn = F.broadcast(
        nat.select(
            F.col("n_nationkey").alias("cn_nationkey"),
            F.col("n_regionkey").alias("cn_regionkey"),
        )
    )
    sn = F.broadcast(
        nat.select(
            F.col("n_nationkey").alias("sn_nationkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    r = F.broadcast(
        load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    # *10000 keeps the scale-4 price*(1-disc) product integral before
    # the BIGINT cast (a cents cast would truncate on Spark and round
    # on DuckDB — the 9-cent drift found at first oracle run).
    rev_t = F.expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
        " * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)"
    )
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, F.col("c_nationkey") == F.col("cn_nationkey"))
        .join(r, F.col("cn_regionkey") == F.col("r_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            rev_t.alias("rev_t"),
            "supp_nation",
        )
    )
    agg = vol.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_7", F.col("rev_t"))
            .otherwise(F.lit(0))
        ).alias("_num"),
        F.sum("rev_t").alias("_den"),
    )
    return agg.select(
        "o_year",
        F.expr(
            "CAST(CAST(_num AS DECIMAL(38,0)) * 1000000000"
            " div _den AS BIGINT)"
        ).alias("share_ppb"),
        F.col("_den").cast("bigint").alias("market_tenthousandths"),
    )


@query(
    "olap_important_part_value",
    """
    WITH v AS (
        SELECT l.l_partkey,
               SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS val_c
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_7')
        GROUP BY 1
    )
    SELECT l_partkey, CAST(val_c AS BIGINT) AS val_c
    FROM v, (SELECT COUNT(*) AS n_parts, SUM(val_c) AS tot FROM v)
    WHERE val_c * n_parts > 2 * tot
    """,
)
def olap_important_part_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q11 shape (adapted: no partsupp, so "stock value" = exact
    cents shipped per part from the watched nations' suppliers): parts
    whose value exceeds 2x the average per-part value — a scalar-
    subquery HAVING whose threshold is self-normalizing, so the result
    stays non-degenerate at every scale factor (a fixed fraction like
    TPC-H's 0.0001/SF empties as SF grows).

    100 TB: the nation filter broadcasts into the supplier dim and
    prunes lineitem at the join; the per-part aggregate is combinable;
    the global (count, sum) reduces the SAME aggregated frame to one
    row that broadcast-crossJoins back — no second base-table scan and
    no single-task whole-frame window.
    """
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = F.broadcast(
        load(spark, sf_dir, "nation").where(
            F.col("n_name").isin("NATION_3", "NATION_7")
        )
    )
    v = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT)"
                )
            ).alias("val_c")
        )
    )
    tot = v.agg(
        F.count(F.lit(1)).alias("n_parts"), F.sum("val_c").alias("tot")
    )
    return (
        v.crossJoin(F.broadcast(tot))
        .where(F.col("val_c") * F.col("n_parts") > 2 * F.col("tot"))
        .select("l_partkey", F.col("val_c").cast("bigint").alias("val_c"))
    )


@query(
    "olap_late_shipment_priority",
    """
    SELECT CASE WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) > 90
                THEN 'SLOW'
                WHEN DATE_DIFF('day', o.o_orderdate, l.l_shipdate) > 30
                THEN 'MEDIUM' ELSE 'FAST' END AS ship_bucket,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def olap_late_shipment_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q12 shape (adapted: no l_shipmode, so lines group by their
    ship-delay bucket instead): per bucket, how many lines belong to
    high- vs low-priority orders — the two-way conditional count that
    makes Q12 a CASE-aggregation benchmark.

    100 TB: one fact-fact equi join (orderkey) that AQE plans; the
    computed grouping key yields exactly 3 groups, so partial
    aggregation collapses each task's output to 3 rows before the
    exchange.
    """
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay > 90, F.lit("SLOW"))
        .when(delay > 30, F.lit("MEDIUM"))
        .otherwise(F.lit("FAST"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(is_high, 0).otherwise(1)).alias(
                "low_line_count"
            ),
        )
    )


@query(
    "olap_dominant_supply_share",
    """
    WITH sup AS (
        SELECT l.l_partkey, l.l_suppkey,
               SUM(CAST(l.l_quantity AS BIGINT)) AS sq
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
        GROUP BY 1, 2
    ), tot AS (
        SELECT l_partkey, SUM(sq) AS tq, COUNT(*) AS ns
        FROM sup GROUP BY 1
    )
    SELECT s.s_name, n.n_name,
           COUNT(*) AS dominated_parts,
           CAST(SUM(sup.sq) AS BIGINT) AS dominated_qty
    FROM sup
    JOIN tot USING (l_partkey)
    JOIN supplier s ON s.s_suppkey = sup.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE sup.sq * tot.ns > 2 * tot.tq
    GROUP BY 1, 2
    """,
)
def olap_dominant_supply_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp/availqty, so "excess"
    becomes dominance — a supplier holding more than 2x the average
    supplier share of a 'small%' part's shipped quantity): per
    dominating supplier, how many parts they dominate and the quantity.
    The original's nested correlated-aggregate IN chain decorrelates
    into aggregate -> re-aggregate -> join-back on the SAME grouped
    frame.

    The 2x-average-share threshold (vs the original's fixed 50% rule)
    is deliberately self-normalizing: as row counts per part grow with
    scale, shares concentrate toward 1/ns and a fixed cutoff empties.

    100 TB: the part-name filter prunes the fact scan via the part
    join; tot derives from sup (already one row per (part, supplier) —
    no second lineitem scan); the join-back is on the aggregate's own
    partition key, and supplier/nation are AQE/broadcast-sized.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    p = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    from _event_intelligence_data_warehouse_spark import cache

    # tot re-aggregates sup and the result joins back to sup: persist
    # the grouped frame so the fact scans ONCE (Catalyst does not reuse
    # the subtree across the two consumers on its own — plan-asserted
    # in tests/test_olap.py).
    sup = cache.persist(
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sq"))
    )
    tot = sup.groupBy("l_partkey").agg(
        F.sum("sq").alias("tq"), F.count(F.lit(1)).alias("ns")
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = F.broadcast(
        load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        sup.join(tot, "l_partkey")
        .where(F.col("sq") * F.col("ns") > 2 * F.col("tq"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("dominated_parts"),
            F.sum("sq").cast("bigint").alias("dominated_qty"),
        )
    )


@query(
    "olap_pareto_frontier",
    """
    WITH pts AS (
        SELECT p_partkey,
               CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS price_c,
               p_size
        FROM part
    ), marked AS (
        SELECT *,
               MAX(p_size) OVER (ORDER BY price_c
                                 RANGE BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS max_lt,
               MAX(p_size) OVER (PARTITION BY price_c) AS max_eq
        FROM pts
    )
    SELECT p_partkey, price_c, CAST(p_size AS BIGINT) AS p_size
    FROM marked
    WHERE (max_lt IS NULL OR max_lt < p_size) AND max_eq <= p_size
    """,
)
def olap_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of the part catalog: parts where
    no other part is both cheaper-or-equal AND larger-or-equal with one
    strict — minimize price, maximize size [Borzsony et al., ICDE'01].

    Expressed without the O(n^2) dominance self-join: a point is
    dominated iff the running MAX of size over strictly-cheaper rows
    reaches its size (RANGE frame on integer cents), or a same-price
    row is strictly larger (per-price MAX). Two window passes total.

    100 TB: a single global RANGE window would sort everything into ONE
    task, so the plan splits: per-partition local skylines first (the
    global skyline is a subset of every local skyline's union, since
    dominance survives partitioning), then the exact windows over the
    few survivors. Each partition prunes independently; the final
    single-partition pass sees O(frontier) rows, not O(n).
    """
    pts = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr(
            "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("price_c"),
        "p_size",
    )

    def _skyline(df: DataFrame, *pid: str) -> DataFrame:
        w_lt = (
            Window.partitionBy(*pid)
            .orderBy("price_c")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_eq = Window.partitionBy(*pid, "price_c")
        return (
            df.withColumn("max_lt", F.max("p_size").over(w_lt))
            .withColumn("max_eq", F.max("p_size").over(w_eq))
            .where(
                (F.col("max_lt").isNull()
                 | (F.col("max_lt") < F.col("p_size")))
                & (F.col("max_eq") <= F.col("p_size"))
            )
            .drop("max_lt", "max_eq")
        )

    local = _skyline(pts.withColumn("pid", F.spark_partition_id()), "pid")
    return _skyline(local.drop("pid")).select(
        "p_partkey", "price_c", F.col("p_size").cast("bigint").alias("p_size")
    )


@query(
    "olap_rfm_segmentation",
    """
    WITH cust AS (
        SELECT o_custkey,
               DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE),
                         DATE '2001-09-01') AS recency_days,
               COUNT(*) AS frequency,
               SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS monetary_c
        FROM orders GROUP BY 1
    ), scored AS (
        SELECT o_custkey, recency_days, frequency, monetary_c,
               NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey)
                   AS r_score,
               NTILE(5) OVER (ORDER BY frequency DESC, o_custkey)
                   AS f_score,
               NTILE(5) OVER (ORDER BY monetary_c DESC, o_custkey)
                   AS m_score
        FROM cust
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_c) AS BIGINT) AS segment_monetary_c,
           CAST(MIN(recency_days) AS BIGINT) AS best_recency_days
    FROM scored GROUP BY 1, 2, 3
    """,
)
def olap_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored 1-5 on Recency (days
    since last order, fresher = better), Frequency and Monetary
    (exact cents), then rolled up per (R,F,M) cell — the classic
    marketing mart. NTILE ties are made deterministic with a custkey
    tiebreak so both engines cut identical quintiles.

    100 TB: the per-customer rollup is combinable; the three NTILEs
    order the CUSTOMER aggregate (not raw orders). A global NTILE is a
    single-partition sort of one row per customer — at extreme
    customer counts the production swap-in is the distinct-value
    cumulative-count rank (the agg_quantiles_interpolated pattern) to
    derive quintile boundaries, then a broadcast band join; the
    contract pins the semantics.
    """
    o = load(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2001-09-01").cast("date"),
            F.max("o_orderdate").cast("date"),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                   " AS BIGINT)")
        ).alias("monetary_c"),
    )
    scored = cust.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_c",
        F.ntile(5)
        .over(Window.orderBy(F.asc("recency_days"), F.asc("o_custkey")))
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("frequency"), F.asc("o_custkey")))
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy(F.desc("monetary_c"), F.asc("o_custkey")))
        .alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("monetary_c").cast("bigint").alias("segment_monetary_c"),
        F.min("recency_days").cast("bigint").alias("best_recency_days"),
    )


@query(
    "olap_abc_classification",
    """
    WITH rev AS (
        SELECT l_partkey,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS rev_c
        FROM lineitem GROUP BY 1
    ), cum AS (
        SELECT l_partkey, rev_c,
               SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey)
                   AS cum_c,
               SUM(rev_c) OVER () AS total_c
        FROM rev
    ), classed AS (
        SELECT *,
               CASE WHEN (cum_c - rev_c) * 10
                         < 7 * CAST(total_c AS HUGEINT) THEN 'A'
                    WHEN (cum_c - rev_c) * 10
                         < 9 * CAST(total_c AS HUGEINT) THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM cum
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(rev_c) AS BIGINT) AS class_revenue_c,
           CAST(SUM(CAST(rev_c AS HUGEINT)) * 1000000
                // MAX(total_c) AS BIGINT) AS share_ppm
    FROM classed GROUP BY 1
    """,
)
def olap_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by revenue;
    A = parts needed to reach 70% of cumulative revenue, B to 90%,
    C the tail — classed by the EXACT multiplied-through comparison
    (cum_before*10 < 7*total, no division, no float share), ties
    broken by partkey so the running sum is total-ordered.

    100 TB: per-part revenue is a combinable aggregate; the ranked
    cumulative runs over one row per part (the entity domain, not the
    fact volume) — at extreme part counts the distinct-value
    cumulative-count pattern swaps in, as with the quantile family.
    """
    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100"
                   " AS BIGINT)")
        ).alias("rev_c")
    )
    w = Window.orderBy(F.desc("rev_c"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy()
    cum = rev.select(
        "l_partkey",
        "rev_c",
        F.sum("rev_c").over(w).alias("cum_c"),
        F.sum("rev_c").over(wt).alias("total_c"),
    )
    before = (F.col("cum_c") - F.col("rev_c")).cast("decimal(38,0)") * 10
    cls = (
        F.when(before < F.expr("7 * CAST(total_c AS DECIMAL(38,0))"), "A")
        .when(before < F.expr("9 * CAST(total_c AS DECIMAL(38,0))"), "B")
        .otherwise("C")
    )
    return (
        cum.withColumn("abc_class", cls)
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("rev_c").cast("bigint").alias("class_revenue_c"),
            F.expr(
                "CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) * 1000000"
                " div MAX(total_c) AS BIGINT)"
            ).alias("share_ppm"),
        )
    )


@query(
    "olap_tier_migration_matrix",
    """
    WITH yearly AS (
        SELECT o_custkey,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
               SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                        AS BIGINT)) AS spend_c
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1, 2
    ), tiered AS (
        SELECT o_custkey, yr,
               NTILE(4) OVER (PARTITION BY yr
                              ORDER BY spend_c DESC, o_custkey) AS tier
        FROM yearly
    )
    SELECT a.tier AS tier_1996,
           COALESCE(CAST(b.tier AS VARCHAR), 'churned') AS tier_1997,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM tiered a
    LEFT JOIN tiered b
      ON b.o_custkey = a.o_custkey AND b.yr = 1997
    WHERE a.yr = 1996
    GROUP BY 1, 2
    """,
)
def olap_tier_migration_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer tier-migration matrix: 1996 spend quartiles crossed
    with where those customers landed in 1997 (or 'churned' — no 1997
    order), the upgrade/downgrade/churn flow report behind retention
    planning. Quartile cuts are deterministic (spend desc, custkey) on
    each year's CUSTOMER aggregate; the migration join is per-customer
    across adjacent periods.

    100 TB: yearly spend is combinable; NTILE orders one row per
    (customer, year) — the quantile-boundary band-join swap-in applies
    at extreme customer counts, as documented for RFM; the matrix has
    at most 4x5 cells.
    """
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    yearly = o.groupBy(
        "o_custkey", F.year("o_orderdate").cast("int").alias("yr")
    ).agg(
        F.sum(
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                   " AS BIGINT)")
        ).alias("spend_c")
    )
    wt = Window.partitionBy("yr").orderBy(
        F.desc("spend_c"), F.asc("o_custkey")
    )
    tiered = yearly.select(
        "o_custkey", "yr", F.ntile(4).over(wt).alias("tier")
    )
    a = tiered.where(F.col("yr") == 1996).select(
        "o_custkey", F.col("tier").alias("tier_1996")
    )
    b = tiered.where(F.col("yr") == 1997).select(
        "o_custkey", F.col("tier").alias("_t97")
    )
    return (
        a.join(b, "o_custkey", "left")
        .groupBy(
            "tier_1996",
            F.coalesce(F.col("_t97").cast("string"), F.lit("churned"))
            .alias("tier_1997"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )
