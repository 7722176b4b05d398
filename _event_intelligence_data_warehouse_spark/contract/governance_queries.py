"""Governance-layer queries: the reference's five data-quality checks and
the two log-driven KPI views (pipeline health, data-quality rollup) —
completing the 6/6 KPI surface (dashboard/kpi_queries.sql:89-118) and the
full data_quality.sql check battery under the DuckDB oracle.

The reference's log tables (raw.ingestion_log / raw.quality_log) are
populated by pipeline runs, so for oracle-checkability each query derives
a deterministic stand-in log from the driver's testdata (mirrored verbatim
in the oracle CTE) and then applies the *real* view/check logic to it.
Quality checks additionally run over a deliberately dirtied copy of the
adapter's raw events so every status tier (passed / warning / failed) is
exercised, not just the happy path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark import cache
from _event_intelligence_data_warehouse_spark.contract import load, query
from _event_intelligence_data_warehouse_spark.contract.warehouse_queries import (
    _FACT_CTE,
    _STG_CTE,
)
from _event_intelligence_data_warehouse_spark.plans import quality as qc
from _event_intelligence_data_warehouse_spark.plans.kpis import (
    kpi_data_quality,
    kpi_pipeline_health,
)
from _event_intelligence_data_warehouse_spark.sources.events_adapter import (
    events_as_raw,
)

_RUN_ID = "contract-run"

# ---------------------------------------------------------------------------
# The five quality checks over dirtied raw events
# ---------------------------------------------------------------------------

# Deterministic dirt: blank names at 1/15 (~6.7% -> 'failed', over the 5%
# tier), unparseable dates at 1/23 (~4.3% -> 'warning', under 10%), swapped
# price bounds at 1/31 ('warning'), duplicated rows at 1/97 ('warning').


def _dirty_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = events_as_raw(load(spark, sf_dir, "events"))
    i = F.col("ingest_id")
    swapped = i % 31 == 0
    raw = raw.select(
        *[c for c in raw.columns
          if c not in ("event_name", "event_date", "price_min", "price_max")],
        F.when(i % 15 == 0, "").otherwise(F.col("event_name")).alias("event_name"),
        F.when(i % 23 == 0, "13/01/2026").otherwise(F.col("event_date")).alias(
            "event_date"
        ),
        F.when(swapped, F.col("price_max")).otherwise(F.col("price_min")).alias(
            "price_min"
        ),
        F.when(swapped, F.col("price_min")).otherwise(F.col("price_max")).alias(
            "price_max"
        ),
    )
    return raw.unionByName(raw.filter(i % 97 == 0))


_DIRTY_CTE = (
    _STG_CTE
    + """
, dirty0 AS (
    SELECT ingest_id, source, raw_event_id,
           CASE WHEN ingest_id % 15 = 0 THEN '' ELSE event_name END
               AS event_name,
           CASE WHEN ingest_id % 23 = 0 THEN '13/01/2026' ELSE event_date END
               AS event_date,
           CASE WHEN ingest_id % 31 = 0 THEN price_max ELSE price_min END
               AS price_min,
           CASE WHEN ingest_id % 31 = 0 THEN price_min ELSE price_max END
               AS price_max
    FROM raw
), dirty AS (
    SELECT * FROM dirty0
    UNION ALL
    SELECT * FROM dirty0 WHERE ingest_id % 97 = 0
), dirty_stg AS (
    SELECT CASE WHEN regexp_matches(trim(price_min), '^\\d+(\\.\\d+)?$')
                THEN CAST(trim(price_min) AS DECIMAL(10,2)) END AS price_min,
           CASE WHEN regexp_matches(trim(price_max), '^\\d+(\\.\\d+)?$')
                THEN CAST(trim(price_max) AS DECIMAL(10,2)) END AS price_max
    FROM dirty
)
"""
)

_CHECK_COLS = """
    records_checked, records_failed,
    100.0 * (records_checked - records_failed) / records_checked AS pass_rate,
    status
"""

_FIVE_CHECKS_SQL = (
    _DIRTY_CTE
    + f"""
, c1 AS (
    SELECT 'null_event_names' AS check_name, 'raw_events' AS table_name,
           COUNT(*) AS records_checked,
           COUNT(*) FILTER (WHERE event_name IS NULL
                            OR trim(event_name) = '') AS records_failed
    FROM dirty
), c2 AS (
    SELECT 'invalid_event_dates' AS check_name, 'raw_events' AS table_name,
           COUNT(*) AS records_checked,
           COUNT(*) FILTER (WHERE NOT coalesce(
               regexp_matches(trim(event_date), '^\\d{{4}}-\\d{{2}}-\\d{{2}}$'),
               FALSE)) AS records_failed
    FROM dirty
), c3 AS (
    SELECT 'price_min_gt_max' AS check_name, 'stg_events' AS table_name,
           COUNT(*) AS records_checked,
           COUNT(*) FILTER (WHERE price_min IS NOT NULL
                            AND price_max IS NOT NULL
                            AND price_min > price_max) AS records_failed
    FROM dirty_stg
), c4 AS (
    SELECT 'duplicate_event_ids' AS check_name, 'raw_events' AS table_name,
           (SELECT COUNT(*) FROM dirty) AS records_checked,
           CAST(coalesce((SELECT SUM(cnt - 1)
                          FROM (SELECT COUNT(*) AS cnt FROM dirty
                                GROUP BY source, raw_event_id)
                          WHERE cnt > 1), 0) AS BIGINT) AS records_failed
), fact AS (
    SELECT dd.date_id,
           CASE WHEN dv.venue_sk % 5 = 0 THEN NULL
                ELSE dv.venue_sk END AS venue_sk,
           dc.category_sk, ds.source_sk
    FROM dedup d
    LEFT JOIN dim_date dd ON d.event_date = dd.full_date
    LEFT JOIN dim_venue dv
        ON md5(coalesce(d.venue_name, '') || coalesce(d.venue_city, ''))
           = dv.venue_nk
    LEFT JOIN dim_category dc
        ON d.category = dc.category AND d.subcategory = dc.subcategory
    LEFT JOIN dim_source ds ON d.source = ds.source
), c5 AS (
    SELECT 'orphan_fact_records' AS check_name, 'fact_events' AS table_name,
           COUNT(*) AS records_checked,
           COUNT(*) FILTER (WHERE date_id IS NULL OR venue_sk IS NULL
                            OR category_sk IS NULL OR source_sk IS NULL)
               AS records_failed
    FROM fact
), tiered AS (
    SELECT check_name, table_name, records_checked, records_failed,
           CASE WHEN records_failed = 0 THEN 'passed'
                WHEN records_failed < CAST(0.05 AS DOUBLE) * records_checked THEN 'warning'
                ELSE 'failed' END AS status
    FROM c1
    UNION ALL
    SELECT check_name, table_name, records_checked, records_failed,
           CASE WHEN records_failed = 0 THEN 'passed'
                WHEN records_failed < CAST(0.10 AS DOUBLE) * records_checked THEN 'warning'
                ELSE 'failed' END AS status
    FROM c2
    UNION ALL
    SELECT check_name, table_name, records_checked, records_failed,
           CASE WHEN records_failed = 0 THEN 'passed'
                ELSE 'warning' END AS status
    FROM c3
    UNION ALL
    SELECT check_name, table_name, records_checked, records_failed,
           CASE WHEN records_failed = 0 THEN 'passed'
                ELSE 'warning' END AS status
    FROM c4
    UNION ALL
    SELECT check_name, table_name, records_checked, records_failed,
           CASE WHEN records_failed = 0 THEN 'passed'
                ELSE 'warning' END AS status
    FROM c5
)
SELECT check_name, table_name, {_CHECK_COLS}
FROM tiered
"""
)

# _FIVE_CHECKS_SQL reuses _FACT_CTE's dedup/dim CTEs for check 5; splice
# the dirty CTEs after the stg CTE from _FACT_CTE instead of _STG_CTE.
_FIVE_CHECKS_SQL = _FACT_CTE + _FIVE_CHECKS_SQL[len(_STG_CTE):]


def quality_fact_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FK-pruned star-build frame the orphan check (check 5) probes:
    fact_build_star projected to its four FK columns with the planted
    dangling-venue gap (venue_sk % 5 nulled). Exposed separately so the
    bench can attribute quality_five_checks' cost to fact-build vs
    checks (mirroring the IVF build/serve split)."""
    from _event_intelligence_data_warehouse_spark.contract.warehouse_queries import (
        fact_build_star,
    )

    return (
        fact_build_star(spark, sf_dir)
        .select("date_id", "venue_sk", "category_sk", "source_sk")
        .withColumn(
            "venue_sk",
            F.when(F.col("venue_sk") % 5 == 0, None).otherwise(
                F.col("venue_sk")
            ),
        )
    )


@query("quality_five_checks", _FIVE_CHECKS_SQL)
def quality_five_checks(
    spark: SparkSession, sf_dir: str, *, _prebuilt_fact: DataFrame | None = None
) -> DataFrame:
    """All five reference quality checks (data_quality.sql:10-113) as one
    plan: checks 1-4 over a deterministically dirtied raw landing (every
    status tier exercised), check 5 over the star build with a planted
    dangling-FK gap (venue_sk % 5 nulled). ``_prebuilt_fact`` lets the
    bench time the checks against an already-materialized fact frame."""
    dirty = _dirty_raw(spark, sf_dir)
    # The four dim probes below all derive from this same fact plan;
    # persist so the star build executes once, not once per probe. Project
    # to the FK columns FIRST — persisting the full fact would cache 15
    # columns where the orphan check reads 4 (persist is a pruning
    # barrier).
    fact = (
        _prebuilt_fact
        if _prebuilt_fact is not None
        else cache.persist(quality_fact_frame(spark, sf_dir))
    )
    dims = {
        "dim_date": fact.select("date_id").filter(F.col("date_id").isNotNull()),
        "dim_venue": fact.select("venue_sk").filter(F.col("venue_sk").isNotNull()),
        "dim_category": fact.select("category_sk").filter(
            F.col("category_sk").isNotNull()
        ),
        "dim_source": fact.select("source_sk").filter(
            F.col("source_sk").isNotNull()
        ),
    }
    checks = [
        # Checks 1-4 are one scan of the dirtied landing (scale path);
        # the per-check functions in plans/quality.py are the unit API.
        qc.run_raw_checks_one_pass(dirty, _RUN_ID),
        qc.check_orphan_fact_records(
            fact,
            dims["dim_date"],
            dims["dim_venue"],
            dims["dim_category"],
            dims["dim_source"],
            _RUN_ID,
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    checked = F.col("records_checked").cast("long")
    failed = F.col("records_failed").cast("long")
    return out.select(
        "check_name",
        "table_name",
        checked.alias("records_checked"),
        failed.alias("records_failed"),
        (F.lit(100.0) * (checked - failed) / checked).alias("pass_rate"),
        "status",
    )


# ---------------------------------------------------------------------------
# kpi_pipeline_health over a synthesized ingestion log
# ---------------------------------------------------------------------------

# One "run" per (hour, event_type): started/finished bracket the hour's
# events, loaded = row count, failed when the count divides by 7.
_RUNS_CTE = """
WITH runs AS (
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS run_hour,
           event_type AS source,
           MIN(CAST(ts AS TIMESTAMP)) AS started_at,
           MAX(CAST(ts AS TIMESTAMP)) AS finished_at,
           COUNT(*) AS records_loaded,
           CASE WHEN COUNT(*) % 7 = 0 THEN 'failed' ELSE 'success' END
               AS status
    FROM events
    GROUP BY 1, 2
)
"""


def _synth_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("run_hour"),
            F.col("event_type").alias("source"),
        )
        .agg(
            F.min("ts").alias("started_at"),
            F.max("ts").alias("finished_at"),
            F.count("*").alias("records_loaded"),
        )
        .withColumn(
            "status",
            F.when(F.col("records_loaded") % 7 == 0, "failed").otherwise(
                "success"
            ),
        )
    )


@query(
    "kpi_pipeline_health",
    _RUNS_CTE
    + """
    SELECT CAST(started_at AS DATE) AS run_date,
           source,
           COUNT(*) AS total_runs,
           COUNT(*) FILTER (WHERE status = 'success') AS successful_runs,
           COUNT(*) FILTER (WHERE status = 'failed') AS failed_runs,
           CAST(SUM(records_loaded) AS BIGINT) AS total_records_loaded,
           CAST(SUM(epoch_us(finished_at) // 1000000
                    - epoch_us(started_at) // 1000000) AS DOUBLE)
               / COUNT(*) AS avg_duration_seconds
    FROM runs
    GROUP BY 1, 2
    """,
)
def kpi_pipeline_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kpi_queries.sql:89-102 applied to a deterministic run log derived
    from the events table (one run per hour x source; D7/D8 date-trunc and
    epoch-difference semantics)."""
    runs = _synth_runs(spark, sf_dir)
    dur = F.unix_timestamp("finished_at") - F.unix_timestamp("started_at")
    return (
        runs.groupBy(
            F.to_date("started_at").alias("run_date"), F.col("source")
        )
        .agg(
            F.count("*").alias("total_runs"),
            F.count_if(F.col("status") == "success").alias("successful_runs"),
            F.count_if(F.col("status") == "failed").alias("failed_runs"),
            F.sum("records_loaded").alias("total_records_loaded"),
            (F.sum(dur).cast("double") / F.count("*")).alias(
                "avg_duration_seconds"
            ),
        )
    )


# ---------------------------------------------------------------------------
# kpi_data_quality over a synthesized quality log
# ---------------------------------------------------------------------------

# One check-row per (lang, doc_id % 7 bucket): short docs fail a length
# check; checked_at is a fixed base instant offset by the bucket (epoch-us
# arithmetic — the engine-portable timestamp construction).
_QLOG_BASE_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z

_QLOG_CTE = f"""
WITH qsrc AS (
    SELECT lang, doc_id % 7 AS bucket, length(text) AS n FROM documents
), qlog AS (
    SELECT 'min_length_' || lang AS check_name,
           'documents' AS table_name,
           COUNT(*) AS records_checked,
           COUNT(*) FILTER (WHERE n < 120) AS records_failed,
           100.0 * (COUNT(*) - COUNT(*) FILTER (WHERE n < 120))
               / COUNT(*) AS pass_rate,
           make_timestamp({_QLOG_BASE_US} + bucket * 3600000000)
               AS checked_at,
           CASE WHEN COUNT(*) FILTER (WHERE n < 120) = 0
                THEN 'passed'
                WHEN COUNT(*) FILTER (WHERE n < 120)
                     < 0.5 * COUNT(*) THEN 'warning'
                ELSE 'failed' END AS status
    FROM qsrc
    GROUP BY lang, bucket
)
"""


def _synth_qlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    failed = F.count_if(F.length("text") < 120)
    checked = F.count("*")
    return (
        d.groupBy(F.col("lang"), (F.col("doc_id") % 7).alias("bucket"))
        .agg(
            checked.alias("records_checked"),
            failed.alias("records_failed"),
            (F.lit(100.0) * (checked - failed) / checked).alias("pass_rate"),
        )
        .select(
            F.concat(F.lit("min_length_"), F.col("lang")).alias("check_name"),
            F.lit("documents").alias("table_name"),
            "records_checked",
            "records_failed",
            "pass_rate",
            F.timestamp_micros(
                F.lit(_QLOG_BASE_US)
                + F.col("bucket").cast("long") * F.lit(3_600_000_000)
            ).alias("checked_at"),
            F.when(F.col("records_failed") == 0, "passed")
            .when(
                F.col("records_failed") < 0.5 * F.col("records_checked"),
                "warning",
            )
            .otherwise("failed")
            .alias("status"),
        )
    )


@query(
    "kpi_data_quality",
    _QLOG_CTE
    + """
    SELECT check_name, table_name,
           CAST(SUM(CAST(pass_rate AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
               AS avg_pass_rate,
           COUNT(*) FILTER (WHERE status = 'failed') AS times_failed,
           COUNT(*) FILTER (WHERE status = 'warning') AS times_warned,
           MAX(checked_at) AS last_checked
    FROM qlog
    GROUP BY 1, 2
    """,
)
def kpi_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kpi_queries.sql:108-118 applied to a deterministic quality log
    derived from the documents table."""
    qlog = _synth_qlog(spark, sf_dir)
    # Sum in the decimal domain: double accumulation order is
    # partition-dependent, decimal sums are exact and order-free.
    return qlog.groupBy("check_name", "table_name").agg(
        (
            F.sum(F.col("pass_rate").cast("decimal(18,6)")).cast("double")
            / F.count("*")
        ).alias("avg_pass_rate"),
        F.count_if(F.col("status") == "failed").alias("times_failed"),
        F.count_if(F.col("status") == "warning").alias("times_warned"),
        F.max("checked_at").alias("last_checked"),
    )


_FD_CANDIDATES = [
    ("orders", "o_orderkey", "o_orderstatus"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("part", "p_brand", "p_type"),
]

_FD_SQL_ONE = """
    SELECT '{det}->{dep}' AS fd,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(COUNT(*) FILTER (WHERE n_vals > 1) AS BIGINT)
               AS violating_groups,
           CAST(SUM(grp_rows) - SUM(max_cnt) AS BIGINT) AS g3_rows,
           COUNT(*) FILTER (WHERE n_vals > 1) = 0 AS holds
    FROM (
        SELECT {det}, COUNT(*) AS n_vals, SUM(cnt) AS grp_rows,
               MAX(cnt) AS max_cnt
        FROM (
            SELECT {det}, {dep}, COUNT(*) AS cnt
            FROM {table} GROUP BY 1, 2
        ) GROUP BY 1
    )
"""


@query(
    "governance_functional_deps",
    " UNION ALL ".join(
        _FD_SQL_ONE.format(table=t, det=a, dep=b)
        for t, a, b in _FD_CANDIDATES
    ),
)
def governance_functional_deps(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Functional-dependency profiling with the g3 error measure
    [Kivinen & Mannila 1995; the measure HyFD/Metanome report]: for
    each candidate det->dep, how many determinant groups exist, how
    many see >1 dependent value, and the minimum number of rows whose
    removal would make the FD hold (total rows minus the sum of each
    group's majority-value count) — the schema-discovery /
    data-contract screen a warehouse runs before declaring keys.

    100 TB: per candidate, two nested combinable aggregates — the
    (det, dep) pre-count collapses each scan task to its local distinct
    pairs before any exchange, and the det-level rollup moves one row
    per surviving pair. No joins, no windows; candidates over different
    tables scan independently and union at the end.
    """
    out = None
    for table, det, dep in _FD_CANDIDATES:
        pairs = (
            load(spark, sf_dir, table)
            .groupBy(det, dep)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        groups = pairs.groupBy(det).agg(
            F.count(F.lit(1)).alias("n_vals"),
            F.sum("cnt").alias("grp_rows"),
            F.max("cnt").alias("max_cnt"),
        )
        branch = groups.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.count_if(F.col("n_vals") > 1).cast("bigint").alias(
                "violating_groups"
            ),
            (F.sum("grp_rows") - F.sum("max_cnt")).cast("bigint").alias(
                "g3_rows"
            ),
            (F.count_if(F.col("n_vals") > 1) == 0).alias("holds"),
        ).select(
            F.lit(f"{det}->{dep}").alias("fd"),
            "n_groups", "violating_groups", "g3_rows", "holds",
        )
        out = branch if out is None else out.unionByName(branch)
    return out


@query(
    "governance_bot_regularity",
    """
    WITH secs AS (
        -- integer floor-of-epoch-seconds: EPOCH() is fractional DOUBLE,
        -- Spark's long cast floors — match it exactly
        SELECT user_id, event_id, ts,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS es
        FROM events
    ), gaps AS (
        SELECT user_id,
               es - LAG(es) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS gap_s
        FROM secs
    ), stats AS (
        SELECT user_id,
               COUNT(gap_s) AS n_gaps,
               SUM(CAST(gap_s AS HUGEINT)) AS s1,
               SUM(CAST(gap_s AS HUGEINT) * gap_s) AS s2,
               MIN(gap_s) AS min_gap_s
        FROM gaps WHERE gap_s IS NOT NULL
        GROUP BY 1
    )
    SELECT user_id,
           CAST(n_gaps AS BIGINT) AS n_gaps,
           CAST(n_gaps * s2 - s1 * s1 AS BIGINT) AS var_num,
           CAST(min_gap_s AS BIGINT) AS min_gap_s,
           (n_gaps >= 10 AND n_gaps * s2 - s1 * s1
                < CAST(n_gaps AS HUGEINT) * n_gaps * 900)
               AS too_regular
    FROM stats
    """,
)
def governance_bot_regularity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bot/automation screen on timing regularity: per user, the EXACT
    integer variance numerator of inter-event gaps
    (n*Sum(x^2) - Sum(x)^2 in HUGEINT/DECIMAL(38,0) — the one-pass
    group-variance identity) and the minimum gap; a user with >= 10
    gaps whose variance (var_num / n^2) stays under 900 s^2 (std < 30s)
    fires `too_regular` — metronomic scripts and replayed logs, the
    rows a training pipeline quarantines before user-behavior models.
    The flag comparison multiplies through by n^2 instead of dividing,
    so it is exact.

    100 TB: the lag window partitions per user (parallel, ordered by
    the user's own events); the variance terms are one combinable
    aggregate — no second pass, no mean subtraction (catastrophic
    cancellation does not exist in integer space).
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long")).over(w)
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    stats = gaps.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.sum(F.col("gap_s").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.expr("CAST(gap_s AS DECIMAL(38,0)) * gap_s")).alias("s2"),
        F.min("gap_s").alias("min_gap_s"),
    )
    return stats.select(
        "user_id",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        F.expr("CAST(n_gaps * s2 - s1 * s1 AS BIGINT)").alias("var_num"),
        F.col("min_gap_s").cast("bigint").alias("min_gap_s"),
        (
            (F.col("n_gaps") >= 10)
            & (
                F.expr("n_gaps * s2 - s1 * s1")
                < F.expr("CAST(n_gaps AS DECIMAL(38,0)) * n_gaps * 900")
            )
        ).alias("too_regular"),
    )


@query(
    "governance_duplicate_payments",
    """
    WITH o AS (
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS price_c,
               CAST(o_orderdate AS DATE) AS od
        FROM orders
    ), corpus AS (
        SELECT * FROM o
        UNION ALL
        SELECT o_orderkey + 10000000000, o_custkey, price_c, od + 7
        FROM o WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT o_orderkey + 10000000000, o_custkey, price_c, od + 45
        FROM o WHERE o_orderkey % 97 = 13
        UNION ALL
        SELECT o_orderkey + 10000000000, o_custkey, price_c + 1, od + 3
        FROM o WHERE o_orderkey % 97 = 29
    )
    SELECT a.o_custkey,
           a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
           a.price_c,
           CAST(DATE_DIFF('day', a.od, b.od) AS BIGINT) AS days_apart
    FROM corpus a JOIN corpus b
      ON a.o_custkey = b.o_custkey
     AND a.price_c = b.price_c
     AND a.o_orderkey < b.o_orderkey
     AND ABS(DATE_DIFF('day', a.od, b.od)) <= 30
    """,
)
def governance_duplicate_payments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicate-payment forensic screen: pairs of orders from the same
    customer for the IDENTICAL amount (exact cents) within 30 days —
    the double-billing / replayed-invoice audit every finance warehouse
    runs. Blocking on (custkey, exact amount) makes the self-join an
    equi-join whose fan-out is the per-block count, with the day window
    as a cheap residual; amounts compare in integer cents so float
    jitter can neither split nor merge a block.

    TPC-H ``o_totalprice`` is near-unique per customer, so the base
    table alone yields 0 pairs — vacuous. The screen therefore runs
    over the base orders PLUS a deterministic planted corpus (the
    ``multimodal_phash_dedup`` pattern): every 97th order is replayed
    at +7 days (must pair), another stratum at +45 days (outside the
    window — must NOT pair) and a third at +3 days but one cent off
    (amount mismatch — must NOT pair), so the equi-join, the cents
    quantization and the +/-30-day residual are each exercised by rows
    that only appear in the output if that predicate is right.

    100 TB: the block key is high-cardinality (customer x price), so
    the self-join shuffles once on it and blocks stay tiny; a
    degenerate block (one amount mass-produced) is the hot-bucket
    class, capped the same way as the LSH/fuzzy screens if it appears.
    """
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("price_c"),
        F.to_date("o_orderdate").alias("od"),
    )

    def _plant(mod_residue: int, day_shift: int, cent_shift: int):
        return o.filter(F.col("o_orderkey") % 97 == mod_residue).select(
            (F.col("o_orderkey") + F.lit(10000000000)).alias("o_orderkey"),
            "o_custkey",
            (F.col("price_c") + F.lit(cent_shift)).alias("price_c"),
            F.date_add("od", day_shift).alias("od"),
        )

    corpus = (
        o.unionByName(_plant(0, 7, 0))     # replay inside the window
        .unionByName(_plant(13, 45, 0))    # outside the 30-day window
        .unionByName(_plant(29, 3, 1))     # one cent off
    )
    a = corpus.select(
        "o_custkey", "price_c",
        F.col("o_orderkey").alias("orderkey_a"), F.col("od").alias("od_a"),
    )
    b = corpus.select(
        F.col("o_custkey").alias("_ck"), F.col("price_c").alias("_pc"),
        F.col("o_orderkey").alias("orderkey_b"), F.col("od").alias("od_b"),
    )
    return (
        a.join(
            b,
            (F.col("o_custkey") == F.col("_ck"))
            & (F.col("price_c") == F.col("_pc"))
            & (F.col("orderkey_a") < F.col("orderkey_b"))
            & (
                F.abs(F.datediff(F.col("od_b"), F.col("od_a"))) <= 30
            ),
        )
        .select(
            "o_custkey",
            "orderkey_a",
            "orderkey_b",
            "price_c",
            F.datediff(F.col("od_b"), F.col("od_a")).cast("bigint").alias(
                "days_apart"
            ),
        )
    )
