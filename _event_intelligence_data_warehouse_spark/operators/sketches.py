"""Deterministic sketches: HyperLogLog cardinality and Count-Min
frequency — the approximate-answer toolkit a 100 TB engine reaches for
when exact distinct/frequency shuffles are too expensive.

Unlike library sketches (Spark's approx_count_distinct uses
implementation-specific hashing), these are built from the engine's
md5-derived hashes with pure integer register math, so the SKETCH
CONTENTS — not just the query shape — are bit-reproducible anywhere and
DuckDB-oracle-checkable:

- HLL registers hold max leading-zero ranks; the harmonic-mean sum is
  computed as an exact BIGINT (`sum(1 << (53 - rank))`) rather than a
  float sum of 2^-rank terms, because 256 dyadic terms overflow double's
  53-bit significand and become accumulation-order-dependent. One
  double conversion + one division at the very end.
- CMS counters are plain integers: estimate = min over d row-hashes of
  the bucket counts, exact arithmetic end-to-end.

Scale: both sketches are one wordcount-shaped aggregation over the data
(register/bucket keyed, partial-aggregated map-side) into a fixed-size
frame (m=256 registers / d*w=4096 counters) that merges associatively —
the property that lets a 1000-executor scan reduce to KBs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_M = 256          # registers (b = 8 index bits)
HLL_WINDOW = 52      # rank window: 60-bit hash minus 8 index bits
CMS_D = 4            # hash rows
CMS_W = 1024         # buckets per row


def _hash60(c: Column) -> Column:
    """60-bit positive hash from the md5 prefix (15 hex chars) — the
    engine-portable hash family used across dedup/minhash."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def _hll_rank_rows(df: DataFrame, col: str, *extra: str) -> DataFrame:
    """(extra..., idx, rank) per input row — the HLL observation stream."""
    h = _hash60(F.col(col))
    return df.select(
        *extra,
        (h % HLL_M).alias("idx"),
        F.shiftright(h, 8).alias("w"),
    ).select(
        *extra,
        "idx",
        F.when(F.col("w") > 0, 53 - F.length(F.bin("w")))
        .otherwise(53)
        .alias("rank"),
    )


def _hll_estimate_col() -> Column:
    """Estimate from (present, s_present) aggregate columns. Rounded to
    2 dp through the decimal domain so the last-ulp of ln()
    (libm-dependent) can't leak into the contract."""
    two53 = F.lit(9007199254740992)  # 2^53
    s_total = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("present")).cast("long") * two53
    )
    z = s_total.cast("double") / two53.cast("double")
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))
    est_raw = alpha * F.lit(256.0) * F.lit(256.0) / z
    v = F.lit(HLL_M) - F.col("present")
    est = F.when(
        (est_raw <= F.lit(640.0)) & (v > 0),
        F.lit(256.0) * F.log(F.lit(256.0) / v.cast("double")),
    ).otherwise(est_raw)
    return F.round(est.cast("decimal(18,6)"), 2).cast("double")


_HLL_SUM_EXPR = "shiftleft(CAST(1 AS BIGINT), 53 - m_j)"


def hll_estimate(df: DataFrame, col: str) -> DataFrame:
    """One-row (hll_estimate, n_registers) HyperLogLog cardinality
    estimate of ``col`` (m=256, standard bias constant, linear-counting
    small-range correction)."""
    regs = (
        _hll_rank_rows(df, col)
        .groupBy("idx")
        .agg(F.max("rank").alias("m_j"))
    )
    agg = regs.agg(
        F.count("*").alias("present"),
        F.sum(F.expr(_HLL_SUM_EXPR)).alias("s_present"),
    )
    return agg.select(
        _hll_estimate_col().alias("hll_estimate"),
        F.col("present").cast("long").alias("n_registers"),
    )


def hll_grouped_with_merge(
    df: DataFrame, col: str, group_col: str, *, merged_label: str = "__ALL__"
) -> DataFrame:
    """Per-group HLL estimates of ``col`` PLUS a merged row: group
    register sets combine by per-index max — the associative merge that
    lets partial sketches from a thousand executors (or a day of hourly
    rollups) reduce to one estimate without re-reading data. The merged
    estimate is *identical* to sketching the whole input directly,
    because max is order- and grouping-insensitive."""
    regs = (
        _hll_rank_rows(df, col, group_col)
        .groupBy(group_col, "idx")
        .agg(F.max("rank").alias("m_j"))
    )
    per_group = (
        regs.groupBy(group_col)
        .agg(
            F.count("*").alias("present"),
            F.sum(F.expr(_HLL_SUM_EXPR)).alias("s_present"),
        )
        .select(
            F.col(group_col).cast("string").alias("group_name"),
            _hll_estimate_col().alias("hll_estimate"),
        )
    )
    merged = (
        regs.groupBy("idx")
        .agg(F.max("m_j").alias("m_j"))
        .agg(
            F.count("*").alias("present"),
            F.sum(F.expr(_HLL_SUM_EXPR)).alias("s_present"),
        )
        .select(
            F.lit(merged_label).alias("group_name"),
            _hll_estimate_col().alias("hll_estimate"),
        )
    )
    return per_group.unionByName(merged)


def cms_sketch(df: DataFrame, col: str) -> DataFrame:
    """(row, bucket, c): the Count-Min counter table of ``col`` —
    d=4 hash rows x w=1024 buckets, built in one keyed aggregation."""
    items = df.select(F.col(col).cast("string").alias("item"))
    exploded = items.select(
        "item",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("row"),
    )
    bucket = (
        _hash60(F.concat_ws("|", F.col("row").cast("string"), F.col("item")))
        % CMS_W
    )
    return exploded.groupBy("row", bucket.alias("bucket")).agg(
        F.count("*").alias("c")
    )


def cms_heavy_hitters(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Top-k items by exact count, each with its Count-Min estimate
    (min over the d row counters — always >= the true count): the
    sketch-accuracy report a pipeline uses to validate CMS sizing before
    trusting it at scales where exact counting is off the table."""
    sk = cms_sketch(df, col)
    exact = (
        df.select(F.col(col).cast("string").alias("item"))
        .groupBy("item")
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("item"))
        .limit(k)
    )
    probes = exact.select(
        "item",
        "exact_count",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("row"),
    ).withColumn(
        "bucket",
        _hash60(F.concat_ws("|", F.col("row").cast("string"), F.col("item")))
        % CMS_W,
    )
    return (
        probes.join(sk, ["row", "bucket"])
        .groupBy("item", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
    )


def binned_quantiles(
    df: DataFrame,
    col: str,
    group_col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    *,
    bin_width: float = 1.0,
) -> DataFrame:
    """Fixed-bin quantile estimation per group: histogram counts (one
    wordcount-shaped aggregation into ~range/width counters), cumulative
    rank over the ordered bins, and for each q the lower edge of the
    first bin reaching the discrete-percentile rank floor(q*(n-1))+1.

    The streaming/mergeable answer to percentile monitoring at scales
    where per-group sorts are off the table: bin counters merge by
    addition (unlike a sort), error is bounded by bin_width, and the
    whole computation is exact integer/bin arithmetic — fully
    deterministic cross-engine."""
    from pyspark.sql.window import Window

    b = F.floor(F.col(col).cast("double") / F.lit(bin_width)).cast("long")
    counts = df.groupBy(F.col(group_col), b.alias("bin")).agg(
        F.count("*").alias("c")
    )
    wcum = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(group_col)
    cum = counts.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(wall)
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for q in qs:
        target = (
            F.floor(F.lit(q) * (F.col("n") - 1).cast("double")).cast("long")
            + 1
        )
        aggs.append(
            (
                F.min(F.when(F.col("cum") >= target, F.col("bin"))).cast(
                    "double"
                )
                * bin_width
            ).alias(f"p{int(q * 100)}_est")
        )
    return cum.groupBy(group_col).agg(*aggs)


# ---------------------------------------------------------------------------
# Bloom filter (build / probe)
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 16    # bits
BLOOM_K = 5          # hash functions (6 hex chars of md5 each)


def _bloom_positions(c: Column) -> Column:
    """Array of BLOOM_K bit positions for a key: disjoint 24-bit slices
    of one md5 — engine-portable (the oracle takes the same substrings),
    no second hash family needed."""
    s = F.md5(c.cast("string"))
    return F.array(*[
        F.conv(F.substring(s, 1 + 6 * j, 6), 16, 10).cast("long")
        % F.lit(BLOOM_M)
        for j in range(BLOOM_K)
    ])


def bloom_build(df: DataFrame, col: str) -> DataFrame:
    """Build a Bloom filter over ``col`` as SPARSE 32-bit words:
    (word_idx, bits) rows, only words with set bits present. The
    classic 100 TB membership pre-filter: m/32 rows (~2k) summarize any
    number of keys, merge by bit_or, broadcast for probe joins — where
    an exact key set would be corpus-sized. Deterministic md5 bit math,
    so filter CONTENTS are oracle-checkable, like the HLL/CMS sketches
    above."""
    pos = df.select(
        F.explode(_bloom_positions(F.col(col))).alias("pos")
    ).distinct()
    return (
        pos.select(
            (F.col("pos") / 32).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_probe(
    df: DataFrame, col: str, bloom: DataFrame, *, id_col: str
) -> DataFrame:
    """(id, maybe_present): true iff every one of the key's BLOOM_K bits
    is set — no false negatives, tunable false positives. The filter
    frame broadcasts (<= m/32 rows); the probe side streams."""
    pos = df.select(
        F.col(id_col),
        F.posexplode(_bloom_positions(F.col(col))).alias("j", "pos"),
    ).select(
        id_col,
        (F.col("pos") / 32).cast("long").alias("word_idx"),
        F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("bit"),
    )
    hit = pos.join(F.broadcast(bloom), "word_idx", "left").select(
        id_col,
        (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bit"))
         != 0).alias("hit"),
    )
    return hit.groupBy(id_col).agg(
        F.min(F.col("hit").cast("bigint")).cast("bigint")
        .alias("maybe_present")
    )


# -- K-minimum-values (bottom-k) sketches ------------------------------------
#
# KMV [Bar-Yossef et al. 2002; Beyer et al. 2007 "On Synopses for
# Distinct-Value Estimation"] keeps the k smallest distinct hash values
# of a column. Unlike HLL it supports SET ALGEBRA: merged sketches give
# the union, and the overlap of the union's bottom-k with both input
# sketches gives an unbiased Jaccard estimate, hence intersections.
# Every register is an exact 60-bit integer, so the sketch itself is
# engine-reproducible (same md5 family as _hash60).

KMV_K = 64
KMV_DOMAIN = 1 << 60  # _hash60 range


def kmv_sketch(
    df: DataFrame, col: str, k: int = KMV_K, n_salts: int = 16
) -> DataFrame:
    """The k smallest distinct ``_hash60(col)`` values, as (hv) rows.

    Scale: a naive bottom-k would sort every distinct hash in ONE task
    per sketch. Instead a two-level tournament runs: per-salt bottom-k
    over ``pmod(hv, n_salts)`` partitions in parallel, then a final
    bottom-k over the <= n_salts*k survivors — the global bottom-k is
    provably contained in the union of per-salt bottom-ks. No task ever
    holds more than max(partition-local distinct, n_salts*k) rows.
    """
    from pyspark.sql import Window

    d = df.select(_hash60(F.col(col)).alias("hv")).distinct()
    salted = d.withColumn("salt", F.pmod(F.col("hv"), F.lit(n_salts)))
    w1 = Window.partitionBy("salt").orderBy("hv")
    survivors = (
        salted.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k)
        .select("hv")
    )
    w2 = Window.partitionBy().orderBy("hv")
    return (
        survivors.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .select("hv")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = KMV_K) -> DataFrame:
    """Union sketch: bottom-k of the merged (already-hashed) registers.

    Inputs are sketches (<= k rows each), so the single-partition
    window sorts at most 2k values — constant work however large the
    sketched sets are."""
    from pyspark.sql import Window

    merged = a.select("hv").unionByName(b.select("hv")).distinct()
    w = Window.partitionBy().orderBy("hv")
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("hv")
    )


def kmv_stats(sketch: DataFrame, prefix: str) -> DataFrame:
    """One-row ({prefix}_cnt, {prefix}_kth): register count and the
    k-th smallest hash — the two numbers the estimator needs."""
    return sketch.agg(
        F.count(F.lit(1)).alias(f"{prefix}_cnt"),
        F.max("hv").alias(f"{prefix}_kth"),
    )


def kmv_estimate_expr(cnt: str, kth: str, k: int = KMV_K) -> Column:
    """Cardinality estimate column: exact count when the sketch is not
    full (n < k), else the classic (k-1) * domain / kth-smallest —
    DECIMAL(38,0) floor division, exact on both engines (63 * 2^60
    overflows int64, so the widening is load-bearing)."""
    return F.when(F.col(cnt) < k, F.col(cnt).cast("bigint")).otherwise(
        F.expr(
            f"CAST(CAST({k - 1} AS DECIMAL(38,0)) * {KMV_DOMAIN}"
            f" div {kth} AS BIGINT)"
        )
    )


def kmv_join_size_estimate(
    a: DataFrame, b: DataFrame, col: str, k: int = KMV_K
) -> DataFrame:
    """Equi-join cardinality estimate from KMV sketches — the
    optimizer statistic a planner needs BEFORE running the join
    (build-side choice, skew handling, broadcast thresholds):
    |A join B| = (distinct common keys) x (mean per-key multiplicity
    product), both factors estimated from the same bottom-k synopsis.

    The union sketch's registers that appear in BOTH input sketches
    are a uniform sample of the common keys [Beyer et al. 2007], so
    (1) est_common = c_both/k x est(union), and (2) the sampled keys'
    multiplicity products average to the population mean: est_join =
    est_common x sum(mult_a x mult_b over sampled keys) / c_both.
    Multiplicities come from per-key count aggregates semi-joined down
    to the <= k sampled hashes (broadcast — the synopsis never grows
    with the data); every step is exact integer arithmetic on the
    deterministic 60-bit hash family, so two engines produce
    bit-identical ESTIMATES, not just close ones.

    Output: one row (est_common_keys, est_join_rows, c_both,
    sum_sampled_products). Scale: sketches are two-level tournaments,
    count aggregates shuffle once per side; everything downstream is
    O(k)."""
    # Each sketch is consumed 2-3 times below (union, semi-joins,
    # stats); localCheckpoint the <= k-row frames so every reuse reads
    # the materialized registers instead of re-running the corpus-wide
    # tournament — the audit measured 41 exchanges without this, most
    # of them repeated distinct-scans of the input.
    ka = kmv_sketch(a, col, k).localCheckpoint()
    kb = kmv_sketch(b, col, k).localCheckpoint()
    ku = kmv_merge(ka, kb, k).localCheckpoint()
    common = ku.join(ka, "hv", "left_semi").join(kb, "hv", "left_semi")
    ca = a.groupBy(col).agg(F.count(F.lit(1)).alias("ma")).select(
        _hash60(F.col(col)).alias("hv"), "ma"
    )
    cb = b.groupBy(col).agg(F.count(F.lit(1)).alias("mb")).select(
        _hash60(F.col(col)).alias("hv"), "mb"
    )
    # The SAMPLE (<= k hashes) broadcasts; the per-key count aggregates
    # are corpus-sized and stream past it — never the other way around.
    sa = ca.join(F.broadcast(common), "hv")
    sampled = cb.join(F.broadcast(sa), "hv")
    sstats = sampled.agg(
        F.count(F.lit(1)).cast("bigint").alias("c_both"),
        F.coalesce(
            F.sum(F.col("ma").cast("decimal(38,0)") * F.col("mb")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("sum_prod"),
    )
    ustats = kmv_stats(ku, "u")
    est_u = kmv_estimate_expr("u_cnt", "u_kth", k)
    return (
        sstats.crossJoin(ustats)
        .withColumn("est_u", est_u)
        .select(
            # The common-key ratio divides by the registers actually in
            # the union sketch: k when full, u_cnt in the sub-k regime
            # (where the sketch IS the key set and the estimate must be
            # exact — dividing by k would floor small answers to 0).
            F.expr(
                f"CAST(CAST(c_both AS DECIMAL(38,0)) * est_u"
                f" div least({k}, greatest(u_cnt, 1)) AS BIGINT)"
            ).alias("est_common_keys"),
            F.expr(
                f"CASE WHEN c_both = 0 THEN CAST(0 AS BIGINT) ELSE "
                f"CAST((CAST(c_both AS DECIMAL(38,0)) * est_u"
                f" div least({k}, greatest(u_cnt, 1)))"
                " * sum_prod div c_both AS BIGINT) END"
            ).alias("est_join_rows"),
            "c_both",
            F.col("sum_prod").cast("bigint").alias("sum_sampled_products"),
        )
    )
