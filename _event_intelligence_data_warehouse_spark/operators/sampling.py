"""Deterministic sampling / splitting operators for training-data
pipelines: hash-bucket sampling, stratified sampling, train/holdout
splits, and per-group top-k selection.

Scale design: every operator here is a stateless projection or a single
window — no driver-side randomness, no collects. Determinism comes from
md5-derived buckets (engine-portable, so the DuckDB oracle reproduces the
exact row set), which also makes samples STABLE across runs and across
cluster sizes — the property `rand()`-based sampling loses the moment a
partition count changes. At 100 TB the hash-bucket predicate pushes into
the scan like any other filter; nothing shuffles until the caller asks
for grouping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BUCKETS = 100


def hash_bucket(c: Column | str, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): first 8 hex chars of
    md5(value) as an int, mod buckets. Portable across engines (DuckDB:
    ``CAST(('0x' || substr(md5(v), 1, 8)) AS BIGINT) % buckets``).
    Reuses the single portability-critical md5-prefix hash definition
    (operators.text.token_hash) rather than restating it."""
    from _event_intelligence_data_warehouse_spark.operators.text import (
        token_hash,
    )

    col = F.col(c) if isinstance(c, str) else c
    return (token_hash(col.cast("string")) % buckets).alias("bucket")


def hash_sample(
    df: DataFrame, id_col: str, pct: int, buckets: int = HASH_BUCKETS
) -> DataFrame:
    """Keep rows whose id hash-bucket < pct — a deterministic ``pct``%
    sample. A pure filter: prunes at scan time, stable under re-runs,
    repartitioning, and incremental appends (a row's membership never
    changes)."""
    return df.filter(hash_bucket(id_col, buckets) < pct)


def stratified_hash_sample(
    df: DataFrame, strata_col: str, id_col: str, pct: int,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """~pct% of EACH stratum: bucket on (stratum, id) jointly so small
    strata are sampled at the same rate as large ones. Still a stateless
    filter — stratification costs nothing (no per-stratum pass). NULL
    strata coalesce to '' so they form one sampled stratum (SQL mirror:
    ``coalesce(s, '') || '|' || id`` — plain ``||`` would NULL-propagate
    and silently drop every NULL-stratum row)."""
    key = F.concat(
        F.coalesce(F.col(strata_col).cast("string"), F.lit("")),
        F.lit("|"),
        F.col(id_col).cast("string"),
    )
    return df.filter(hash_bucket(key, buckets) < pct)


def train_holdout_split(
    df: DataFrame, id_col: str, holdout_pct: int,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Label every row 'train' or 'holdout' by id hash-bucket. The split
    is a FUNCTION of the id: new data lands on the correct side without
    coordination, and no row can leak across sides between runs."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(id_col, buckets) < holdout_pct, F.lit("holdout")
        ).otherwise(F.lit("train")),
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    *,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group (e.g. k highest-quality documents per source
    for a curation pipeline): one window on the group key. Deterministic
    via the explicit tiebreak column. Spark executes this as a partial
    top-k within each shuffle partition (rank <= k prunes before the
    final sort at sink time)."""
    order = F.desc(order_col) if descending else F.asc(order_col)
    tiebreak = [F.asc(tiebreak_col)] if tiebreak_col else []
    w = Window.partitionBy(*group_cols).orderBy(order, *tiebreak)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def weighted_hash_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    base_pct: int,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Deterministic WEIGHTED sampling: a row's keep probability is
    base_pct% scaled by its weight in [0, 1] — keep iff
    hash_bucket(id) < floor(base_pct * weight). The curation move that
    upsamples high-quality documents and suppresses low-quality ones
    without an RNG: membership is a pure function of (id, weight), so
    the sample is stable across runs/repartitions and reproducible by
    the oracle.

    Still a stateless filter (threshold is per-row column arithmetic);
    floor of an exact-operand product keeps the cut engine-portable."""
    threshold = F.floor(
        F.lit(float(base_pct)) * F.col(weight_col).cast("double")
    )
    return df.filter(hash_bucket(id_col, buckets) < threshold)


PPM = 1_000_000


def mixture_plan(
    df: DataFrame,
    weights: dict[str, int],
    token_budget: int,
    *,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Dataset-mixture plan for a token budget: split ``token_budget``
    across sources proportionally to integer ``weights``, then convert
    each source's share into a deterministic per-source sampling rate —
    the planning step of assembling a training mix ("webtext x8, books
    x4, ..." at N total tokens).

    Output per source present in the corpus: (source, n_docs, n_tokens,
    weight, target_tokens, rate_ppm) where
    ``target_tokens = floor(budget * w / sum(weights))`` and
    ``rate_ppm = min(PPM, floor(target * PPM / n_tokens))`` — all pure
    int64 arithmetic, so the plan is bit-identical on every engine.
    Unweighted sources appear with weight 0 (audit rows; nothing
    sampled). Scale: one wordcount-shaped aggregate over the corpus into
    a sources-sized frame; the weight map rides in the plan as a literal.
    """
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum positive")
    wmap = F.create_map(
        *[F.lit(x) for k, v in sorted(weights.items()) for x in (k, int(v))]
    )
    from _event_intelligence_data_warehouse_spark.operators.text import (
        token_count,
    )

    agg = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(token_count(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = F.coalesce(
        F.element_at(wmap, F.col("source")), F.lit(0)
    ).cast("bigint")
    # DECIMAL(38,0) intermediates, integral `div` (truncation == floor
    # for non-negatives, no rounding step): budget*weight and
    # target*PPM overflow int64 at ~1e13-token budgets — real LLM-mix
    # territory — while staying far inside 38 digits. Exact on both
    # engines.
    target = F.expr(
        f"CAST((CAST({int(token_budget)} AS DECIMAL(38,0)) * weight) "
        f"div {int(wsum)} AS BIGINT)"
    )
    # n_tokens = 0 (every doc of a source tokenizes empty) must yield
    # rate 0, not a silent non-ANSI NULL (Spark) or a div-by-zero error
    # (DuckDB HUGEINT //) — nothing can be sampled from zero tokens.
    rate = F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.lit(PPM).cast("bigint"),
            F.expr(
                f"CAST((CAST(target_tokens AS DECIMAL(38,0)) * {PPM}) "
                "div n_tokens AS BIGINT)"
            ),
        )
    )
    return (
        agg.withColumn("weight", w)
        .withColumn("target_tokens", target)
        .withColumn("rate_ppm", rate)
    )


def mixture_plan_temperature(
    df: DataFrame,
    token_budget: int,
    *,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-smoothed mixture plan: each source's share of the
    token budget is proportional to ``n_tokens ** alpha`` — the
    multilingual/multi-domain rebalancing rule (alpha < 1 up-weights
    small sources; XLM-R and mT5 train with alpha around 0.3-0.5,
    GPT-3's mix is hand-tuned but equivalent in form). Where
    :func:`mixture_plan` takes editorial integer weights, this derives
    them from corpus statistics alone.

    ``alpha`` is restricted to {1.0, 0.5, 0.25}: those powers compute
    as exact integer square roots (one or two isqrt passes — floor(
    sqrt(n)) seeded from the double sqrt and corrected ±1 integerly),
    so weights, targets and rates stay pure int64/decimal arithmetic,
    bit-identical on every engine. Output mirrors mixture_plan:
    (source, n_docs, n_tokens, weight, target_tokens, rate_ppm) with
    ``weight = floor(n_tokens ** alpha)``.

    Scale: one wordcount-shaped aggregate into a sources-sized frame;
    the weight sum rides through a window total (sources are few)."""
    passes = {1.0: 0, 0.5: 1, 0.25: 2}.get(alpha)
    if passes is None:
        raise ValueError(
            f"alpha must be one of 1.0, 0.5, 0.25 (exact-integer "
            f"powers); got {alpha}"
        )
    from _event_intelligence_data_warehouse_spark.operators.text import (
        token_count,
    )

    agg = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(token_count(text_col)).cast("bigint").alias("n_tokens"),
    )

    def isqrt(col: str) -> Column:
        # floor(sqrt(n)) exactly: double-sqrt seed, then integer ±1
        # correction (the seed is within 1 of truth for n < 2^52)
        seed = F.floor(F.sqrt(F.col(col).cast("double"))).cast("bigint")
        up = seed + 1
        down = seed - 1
        return (
            F.when(up * up <= F.col(col), up)
            .when(seed * seed <= F.col(col), seed)
            .otherwise(down)
            .cast("bigint")
        )

    out = agg.withColumn("weight", F.col("n_tokens"))
    for _ in range(passes):
        out = out.withColumn("weight", isqrt("weight"))
    w_all = Window.partitionBy()
    out = out.withColumn(
        "wsum", F.sum("weight").over(w_all).cast("bigint")
    )
    target = F.when(F.col("wsum") == 0, F.lit(0).cast("bigint")).otherwise(
        F.expr(
            f"CAST((CAST({int(token_budget)} AS DECIMAL(38,0)) * weight) "
            "div wsum AS BIGINT)"
        )
    )
    out = out.withColumn("target_tokens", target)
    rate = F.when(F.col("n_tokens") == 0, F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.lit(PPM).cast("bigint"),
            F.expr(
                f"CAST((CAST(target_tokens AS DECIMAL(38,0)) * {PPM}) "
                "div n_tokens AS BIGINT)"
            ),
        )
    )
    return out.withColumn("rate_ppm", rate).drop("wsum")


def apply_mixture_rates(
    df: DataFrame,
    rates: DataFrame,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a PRECOMPUTED per-source rate table: keep a document iff
    its per-source md5 bucket in [0, PPM) falls under the source's
    rate_ppm. This is the application half shared by
    :func:`mixture_sample` / :func:`mixture_sample_temperature`, split
    out (r12) so a steady-state pipeline can apply rates from STORED
    state (the previous release's manifest) to a new batch without
    recomputing the corpus — membership is a pure function of the row
    and the rate, so the same doc keeps the same fate across releases
    while the rate is unchanged. ``rates`` needs (source, rate_ppm);
    it is sources-sized and broadcasts; ``df`` never shuffles."""
    from _event_intelligence_data_warehouse_spark.operators.text import (
        token_hash,
    )

    plan = rates.select(
        F.col("source").alias("_mx_source"), "rate_ppm"
    )
    bucket = token_hash(
        F.concat(
            F.col(source_col).cast("string"),
            F.lit("|"),
            F.col(id_col).cast("string"),
        )
    ) % PPM
    return (
        df.join(F.broadcast(plan), F.col(source_col) == F.col("_mx_source"))
        .filter(bucket < F.col("rate_ppm"))
        .select(F.col(id_col).alias("doc_id"),
                F.col(source_col).alias("source"))
    )


def mixture_sample_temperature(
    df: DataFrame,
    token_budget: int,
    *,
    alpha: float = 0.5,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a :func:`mixture_plan_temperature`: keep a document iff its
    per-source md5 bucket in [0, PPM) falls under the source's derived
    rate_ppm — the same stable-membership application as
    :func:`mixture_sample`, with the plan derived from corpus statistics
    (n_tokens^alpha) instead of editorial weights. Corpus never
    shuffles; the plan frame broadcasts."""
    plan = mixture_plan_temperature(
        df, token_budget, alpha=alpha,
        source_col=source_col, text_col=text_col,
    )
    return apply_mixture_rates(
        df, plan, source_col=source_col, id_col=id_col
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    token_budget: int,
    *,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a :func:`mixture_plan`: keep a document iff its per-source
    md5 bucket in [0, PPM) falls under the source's rate_ppm. Bucketing
    on (source | id) keeps per-source samples independent; membership is
    a pure function of the row, so the mix is stable across runs,
    repartitions, and incremental appends. The plan frame is
    sources-sized and broadcasts; the corpus never shuffles — at 100 TB
    this is a scan + filter."""
    plan = mixture_plan(
        df, weights, token_budget, source_col=source_col, text_col=text_col
    )
    return apply_mixture_rates(
        df, plan, source_col=source_col, id_col=id_col
    )


def leakage_safe_split(
    vertices: DataFrame,
    pairs: DataFrame,
    holdout_pct: int = 20,
    *,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Train/holdout split that can never separate near-duplicates:
    assignment hashes the near-dup CLUSTER id (connected component of
    the verified pair graph), not the document id, so every member of a
    duplicate cluster lands on the same side. This is the leakage guard
    for eval construction — a doc-level split leaks a training document
    into the holdout whenever its near-twin stays in train.

    Output: (doc_id, component_id, split). Scale: the split itself is a
    stateless projection over the component labels; cost lives in the
    component computation, which is the same bounded-iteration
    propagation the dedup path already runs (operators.dedup.
    connected_components — no label broadcast above the vertex
    threshold)."""
    from _event_intelligence_data_warehouse_spark.operators.dedup import (
        connected_components,
    )

    comp = connected_components(vertices, pairs)
    side = F.when(
        hash_bucket(F.col("component_id"), buckets) < holdout_pct,
        F.lit("holdout"),
    ).otherwise(F.lit("train"))
    return comp.select("doc_id", "component_id", side.alias("split"))


def leakage_safe_kfold(
    vertices: DataFrame,
    pairs: DataFrame,
    k: int = 5,
    *,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """K-fold cross-validation assignment that can never separate
    near-duplicates: fold = hash of the near-dup COMPONENT id mod k, so
    every member of a duplicate cluster shares a fold — the k-fold face
    of :func:`leakage_safe_split` (same guard, k ways). Output:
    (doc_id, component_id, fold). Scale: a stateless projection over the
    component labels; cost lives in the component computation."""
    from _event_intelligence_data_warehouse_spark.operators.dedup import (
        connected_components,
    )

    comp = connected_components(vertices, pairs)
    fold = hash_bucket(F.col("component_id"), buckets) % k
    return comp.select(
        "doc_id", "component_id", fold.cast("bigint").alias("fold")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group winsorization: clamp ``value_col`` to its group's
    [p_lo, p_hi] exact percentiles — the robust-preprocessing staple
    that tames outlier feature values (token counts, prices, durations)
    before they skew a normalization or a training mix.

    Percentiles are exact DISCRETE rank selections (element at sorted
    rank floor(p*(n-1))+1, deterministic via ``tiebreak_col``) — pure
    integer logic, engine-portable, no interpolation arithmetic. Output
    keeps every row with (value_clamped, clamped). Scale: one window
    shuffle on the group key for the ranking plus a group-sized cutoff
    join (broadcasts — group count, not rows); the at-scale
    approximate alternative is sketches.binned_quantiles."""
    v = F.col(value_col)
    w = Window.partitionBy(*group_cols).orderBy(v, F.col(tiebreak_col))
    wn = Window.partitionBy(*group_cols)
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(wn)
    )

    def pick(p: float, name: str):
        target = F.floor(F.lit(p) * (F.col("_n") - 1)).cast("long") + 1
        return F.max(F.when(F.col("_rn") == target, v)).alias(name)

    cuts = ranked.groupBy(*group_cols).agg(
        pick(p_lo, "_lo"), pick(p_hi, "_hi")
    )
    return (
        df.join(F.broadcast(cuts), group_cols)
        .withColumn(
            "value_clamped",
            F.least(F.greatest(v, F.col("_lo")), F.col("_hi")),
        )
        .withColumn(
            "clamped",
            ((v < F.col("_lo")) | (v > F.col("_hi"))).cast("bigint"),
        )
        .drop("_lo", "_hi")
    )


def group_percentile(
    df: DataFrame, score_col: str, group_cols: list[str], *,
    tiebreak_col: str, out_col: str = "pct_rank",
) -> DataFrame:
    """Within-group percentile calibration: adds ``out_col`` =
    percent_rank of ``score_col`` inside each group — the normalization
    step before mixing sources whose raw quality scales are
    incomparable (a 0.7 from a clean source and a 0.7 from a crawl mean
    different things; their within-source percentiles don't). A global
    "keep top X%" threshold then applies uniformly across sources.

    ``tiebreak_col`` makes the ordering total, so tied scores rank
    identically on every engine. percent_rank is (rank-1)/(n-1) — one
    exact integer division — and a single-member group scores 0.0.

    Scale: one window per group key — a sort within each group's
    partition range, no extra shuffle beyond the partitionBy hash."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col), F.col(tiebreak_col)
    )
    return df.withColumn(out_col, F.percent_rank().over(w))


def allocate_stratified(
    df: DataFrame, group_cols: list[str], n_total: int, *,
    tiebreak_col: str,
) -> DataFrame:
    """Exact-size stratified sample: allocate a fixed budget of
    ``n_total`` rows across strata proportionally with the
    largest-remainder method (quota_i = floor(n*N_i/N), the leftover
    goes to the largest remainders — the apportionment rule that makes
    the quotas sum EXACTLY to the budget, which per-stratum rate
    sampling cannot), then take each stratum's quota by md5 rank of
    ``tiebreak_col`` — deterministic membership, stable across runs
    and repartitioning. A stratum smaller than its quota contributes
    all its rows (the only case the total can undershoot; documented
    over silently re-flowing the deficit). Requires n_total <= corpus.

    Output: the sampled rows + (quota, stratum_n) audit columns.

    Scale: one count aggregate into a strata-sized frame (broadcast
    back), one rank window per stratum — no corpus-sized shuffle
    beyond the stratum hash; all arithmetic int64-exact."""
    counts = df.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("stratum_n")
    )
    tot = counts.agg(F.sum("stratum_n").cast("bigint").alias("_N"))
    keys = [F.col(c) for c in group_cols]
    quotas = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "_base",
            F.expr(
                f"CAST((CAST({int(n_total)} AS DECIMAL(38,0)) * stratum_n)"
                " div _N AS BIGINT)"
            ),
        )
        .withColumn(
            "_rem",
            F.expr(
                f"CAST((CAST({int(n_total)} AS DECIMAL(38,0)) * stratum_n)"
                " % _N AS BIGINT)"
            ),
        )
    )
    w_rem = Window.orderBy(F.col("_rem").desc(), *keys)
    w_leftover = Window.partitionBy(F.lit(1))
    quotas = (
        quotas.withColumn("_rrank", F.row_number().over(w_rem))
        .withColumn(
            "_leftover",
            (F.lit(int(n_total)) - F.sum("_base").over(w_leftover))
            .cast("bigint"),
        )
        .withColumn(
            "quota",
            F.least(
                F.col("stratum_n"),
                F.col("_base")
                + (F.col("_rrank") <= F.col("_leftover")).cast("bigint"),
            ),
        )
        .select(*group_cols, "stratum_n", "quota")
    )
    w_sel = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(tiebreak_col).cast("string")), F.col(tiebreak_col)
    )
    return (
        df.withColumn("_srank", F.row_number().over(w_sel))
        .join(F.broadcast(quotas), group_cols)
        .filter(F.col("_srank") <= F.col("quota"))
        .drop("_srank")
    )


def mad_outliers(
    df: DataFrame, value_col: str, group_cols: list[str], *,
    k: int = 3, tiebreak_col: str,
) -> DataFrame:
    """Robust outlier flagging via the median/MAD rule: a value is an
    outlier when |v - median| > k * MAD (median absolute deviation) —
    the detector that still works after the z-test's own mean/stddev
    have been dragged by the outliers it is looking for (50% breakdown
    point vs 0%). Flagging complements ``winsorize``'s clamping.

    Engine-exact: both medians are LOWER-median rank selections
    (element at rank (n+1) div 2 in (value, tiebreak) order — a picked
    element, never an interpolated average), deviations stay in the
    value's decimal type, and the comparison is exact decimal
    arithmetic. Ties in |deviation| rank by (deviation value,
    tiebreak), identical on every engine.

    Output: input rows + (group_median, group_mad, is_outlier).

    Scale: two rank windows + two joins of group-sized frames — same
    shuffle key throughout; the group stats frames broadcast."""
    v = F.col(value_col)
    w = Window.partitionBy(*group_cols).orderBy(v, F.col(tiebreak_col))
    wn = Window.partitionBy(*group_cols)
    med = (
        df.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(wn))
        .filter(F.col("_rk") == F.expr("(_n + 1) div 2"))
        .select(*group_cols, v.alias("group_median"))
    )
    dev = df.join(med, group_cols).withColumn(
        "_dev", F.abs(v - F.col("group_median"))
    )
    wd = Window.partitionBy(*group_cols).orderBy(
        F.col("_dev"), F.col(tiebreak_col)
    )
    mad = (
        dev.withColumn("_rk", F.row_number().over(wd))
        .withColumn("_n", F.count("*").over(wn))
        .filter(F.col("_rk") == F.expr("(_n + 1) div 2"))
        .select(*group_cols, F.col("_dev").alias("group_mad"))
    )
    return (
        dev.join(mad, group_cols)
        .withColumn(
            "is_outlier", F.col("_dev") > F.lit(int(k)) * F.col("group_mad")
        )
        .drop("_dev")
    )


# Poisson(1) inverse-CDF thresholds in ppm over a uniform hash draw:
# P(X=0)=e^-1=.367879..., cumulative .735759, .919699, .980912; the tail
# (>=4, ~1.9%) is capped at 4. Integer ppm comparisons make the draw
# bit-identical on every engine — the determinism the float-free house
# rules require, at the cost of a truncated tail (mean 0.999634 instead
# of 1; identical on both sides of the oracle, and irrelevant for CI
# width at B replicates).
POISSON1_PPM = (367879, 735759, 919699, 980912)


def poisson_bootstrap_weight(
    id_col: Column | str, replicate: Column | str
) -> Column:
    """Deterministic Poisson(1) bootstrap weight for (row, replicate):
    the md5 hash-bucket of "id|replicate" in ppm, cut by the inverse
    CDF. Stable under re-runs and repartitioning, so a bootstrap is
    reproducible across the cluster — the online-bootstrap construction
    (Oza & Russell 2001) that replaces resampling with per-row weights
    and never moves the data."""
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    rep = F.col(replicate) if isinstance(replicate, str) else replicate
    u = hash_bucket(
        F.concat(idc.cast("string"), F.lit("|"), rep.cast("string")),
        1_000_000,
    )
    t0, t1, t2, t3 = POISSON1_PPM
    return (
        F.when(u < t0, 0)
        .when(u < t1, 1)
        .when(u < t2, 2)
        .when(u < t3, 3)
        .otherwise(4)
        .cast("bigint")
    )


def bootstrap_mean_replicates(
    df: DataFrame,
    id_col: str,
    value_cents: Column,
    n_replicates: int = 32,
) -> DataFrame:
    """B bootstrap replicates of the mean of an exact-cents value in ONE
    pass: explode each row into (row, replicate) pairs with
    deterministic Poisson weights, partial-aggregate per replicate.
    Returns (replicate, n_eff, mean_micro) where mean_micro is the
    weighted mean in integer MICRO currency units (floor division of
    exact integer sums — engine-portable where a decimal quotient's
    scale rules are not). Downstream takes percentiles of the B rows
    for a CI: the whole uncertainty estimate costs one
    B-times-amplified scan and a B-row aggregate, no resampled copies
    of the data."""
    if n_replicates < 1:
        raise ValueError("n_replicates must be >= 1")
    src = df.select(
        F.col(id_col).alias("_id"),
        value_cents.cast("bigint").alias("_cents"),
    )
    # The B-times-amplified projection (explode + one md5 per (row,
    # replicate)) executes in the stage that READS the input, so its
    # parallelism is the SCAN's split count — a small input on a wide
    # machine runs the whole amplified pass on a couple of tasks
    # (measured r13: 2 tasks / 4.1 s at sf0.1 on local[32] while 30
    # cores idled; order-balanced A/B 4.49 -> 1.78 s). Spread the
    # narrow (id, cents) rows across the cores BEFORE amplifying,
    # only when the scan is under-parallel (guide §2.6; no-op at
    # production scale). Weights are a pure function of
    # (id, replicate), so placement never changes the result.
    from _event_intelligence_data_warehouse_spark.operators import (
        spread_small_scan,
    )

    src = spread_small_scan(src)
    reps = src.select(
        "_id",
        "_cents",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_replicates - 1))
        ).alias("replicate"),
    ).withColumn("_w", poisson_bootstrap_weight("_id", "replicate"))
    return (
        reps.groupBy("replicate")
        .agg(
            F.sum("_w").alias("n_eff"),
            F.sum(F.col("_w") * F.col("_cents")).alias("_wsum"),
        )
        .filter(F.col("n_eff") > 0)
        .select(
            F.col("replicate").cast("bigint").alias("replicate"),
            F.col("n_eff").cast("bigint").alias("n_eff"),
            F.expr(
                "(CAST(_wsum AS DECIMAL(38,0)) * 10000) div n_eff"
            ).cast("bigint").alias("mean_micro"),
        )
    )
