"""Bucketed-layout tests: the point of bucketing is structural — the
executed plan for a same-key join of two co-bucketed tables must contain
ZERO shuffle Exchange, and a groupBy on the bucket key must aggregate
without one. Correctness is asserted against the plain (unbucketed)
equivalents."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.bucketing import BucketedCatalog


@pytest.fixture()
def bcat(spark, tmp_path):
    cat = BucketedCatalog(spark, str(tmp_path / "bt"))
    yield cat
    for t in ("b_orders", "b_lines", "b_again"):
        cat.drop(t)


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE plan strings repeat the tree under "== Initial Plan ==";
    # count only the final (executed) section.
    return plan.split("== Initial Plan ==")[0].count(
        "Exchange hashpartitioning"
    )


def _frames(spark):
    orders = spark.range(0, 1000).select(
        F.col("id").alias("okey"),
        (F.col("id") % 7).alias("status"),
        (F.col("id") * 3 % 100).cast("double").alias("total"),
    )
    lines = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("okey"),
        (F.col("id") % 5).alias("qty"),
    )
    return orders, lines


def test_cobucketed_join_has_no_exchange(spark, bcat):
    orders, lines = _frames(spark)
    bcat.write("b_orders", orders, bucket_col="okey", n_buckets=8)
    bcat.write("b_lines", lines, bucket_col="okey", n_buckets=8)
    bo, bl = bcat.read("b_orders"), bcat.read("b_lines")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "okey").groupBy("status").agg(
            F.sum("qty").alias("q")
        )
        rows = {r.status: r.q for r in joined.collect()}
        # zero shuffles end-to-end: the join is co-located by layout and
        # the groupBy's exchange is the only one allowed
        n_ex = _exchanges(joined)
        assert n_ex <= 1, f"expected only the final agg exchange, saw {n_ex}"
        plain = orders.join(lines, "okey").groupBy("status").agg(
            F.sum("qty").alias("q")
        )
        assert rows == {r.status: r.q for r in plain.collect()}
        # the join itself (no agg) must plan with NO exchange at all
        j2 = bo.join(bl, "okey").select("okey", "qty")
        j2.collect()
        assert _exchanges(j2) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_groupby_on_bucket_key_has_no_exchange(spark, bcat):
    orders, _ = _frames(spark)
    bcat.write("b_orders", orders, bucket_col="okey", n_buckets=8)
    agg = bcat.read("b_orders").groupBy("okey").agg(
        F.sum("total").alias("t")
    )
    agg.collect()
    assert _exchanges(agg) == 0


def test_register_recovers_layout_over_existing_path(spark, bcat):
    orders, lines = _frames(spark)
    bcat.write("b_orders", orders, bucket_col="okey", n_buckets=8)
    bcat.write("b_lines", lines, bucket_col="okey", n_buckets=8)
    # simulate a fresh session losing the in-memory catalog entry
    spark.sql("DROP TABLE b_orders")
    bcat.register(
        "b_orders",
        schema_ddl="okey BIGINT, status BIGINT, total DOUBLE",
        bucket_col="okey",
        n_buckets=8,
    )
    bo = bcat.read("b_orders")
    assert bo.count() == 1000
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bo.join(bcat.read("b_lines"), "okey").select("okey", "qty")
        j.collect()
        assert _exchanges(j) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark, bcat):
    orders, lines = _frames(spark)
    bcat.write("b_orders", orders, bucket_col="okey", n_buckets=8)
    bcat.write("b_again", lines, bucket_col="okey", n_buckets=4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bcat.read("b_orders").join(bcat.read("b_again"), "okey").select(
            "okey", "qty"
        )
        j.collect()
        # correctness never depends on the layout: Spark shuffles at
        # least the mismatched side instead of producing wrong results
        assert _exchanges(j) >= 1
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_reconciliation_shape_on_bucketed_warehouse_zero_exchange(
    spark, bcat
):
    """The governance_reconciliation_audit / cdc_snapshot_diff join
    shape (per-key rollup + full outer key join) over WAREHOUSE-RESIDENT
    co-bucketed tables runs with ZERO shuffle Exchange before the final
    tiny band aggregate — the deployment answer to the one SMJ exchange
    those contract queries show over the driver's plain (unbucketed)
    parquet (round-6 VERDICT item 8). The rollup rides the bucket
    distribution of b_lines; the full outer join consumes both bucketed
    distributions directly."""
    orders, lines = _frames(spark)
    lines = lines.withColumn(
        "charge", (F.col("qty") * 7 + F.col("okey") % 11).cast("bigint")
    )
    bcat.write("b_orders", orders, bucket_col="okey", n_buckets=8)
    bcat.write("b_lines", lines, bucket_col="okey", n_buckets=8)
    bo, bl = bcat.read("b_orders"), bcat.read("b_lines")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        rollup = bl.groupBy("okey").agg(F.sum("charge").alias("charge"))
        joined = bo.join(rollup, "okey", "full_outer").select(
            "okey",
            F.when(F.col("charge").isNull(), "order_no_lines")
            .when(F.col("total").isNull(), "lines_no_order")
            .otherwise("matched").alias("category"),
        )
        joined.collect()
        assert _exchanges(joined) == 0
        # and with the band aggregate on top, only that one exchange
        banded = joined.groupBy("category").agg(
            F.count(F.lit(1)).alias("n")
        )
        got = {r.category: r.n for r in banded.collect()}
        assert _exchanges(banded) == 1
        # correctness vs the plain unbucketed equivalent
        plain = orders.join(
            lines.groupBy("okey").agg(F.sum("charge").alias("charge")),
            "okey", "full_outer",
        ).select(
            F.when(F.col("charge").isNull(), "order_no_lines")
            .when(F.col("total").isNull(), "lines_no_order")
            .otherwise("matched").alias("category"),
        ).groupBy("category").agg(F.count(F.lit(1)).alias("n"))
        assert got == {r.category: r.n for r in plain.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
