"""Deterministic sampling / split / top-k operator tests
(operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.operators import sampling as sp

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from _event_intelligence_data_warehouse_spark.contract import load

    return load(spark, SF, "documents")


def test_hash_sample_deterministic_and_stable(spark):
    d = _docs(spark)
    s1 = {r.doc_id for r in sp.hash_sample(d, "doc_id", 30).select("doc_id").collect()}
    s2 = {r.doc_id for r in sp.hash_sample(d.repartition(7), "doc_id", 30)
          .select("doc_id").collect()}
    assert s1 == s2  # membership survives repartitioning
    n = d.count()
    assert 0.15 * n < len(s1) < 0.45 * n  # ~30%
    # monotone: a 10% sample is a subset of the 30% sample
    s_small = {r.doc_id for r in sp.hash_sample(d, "doc_id", 10)
               .select("doc_id").collect()}
    assert s_small <= s1


def test_stratified_sample_rates_per_stratum(spark):
    d = _docs(spark)
    rates = (
        sp.stratified_hash_sample(d, "lang", "doc_id", 50)
        .groupBy("lang").count()
        .join(d.groupBy("lang").agg(F.count("*").alias("total")), "lang")
        .select("lang", (F.col("count") / F.col("total")).alias("rate"))
        .collect()
    )
    assert rates
    for r in rates:
        assert 0.25 < r.rate < 0.75, (r.lang, r.rate)


def test_train_holdout_split_partitions_every_row(spark):
    d = _docs(spark)
    out = sp.train_holdout_split(d, "doc_id", 10)
    counts = dict(
        out.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
    )
    assert set(counts) <= {"train", "holdout"}
    assert sum(counts.values()) == d.count()
    # same row never flips side
    again = sp.train_holdout_split(d, "doc_id", 10)
    assert out.select("doc_id", "split").exceptAll(
        again.select("doc_id", "split")
    ).isEmpty()


def test_topk_per_group_rank_and_tiebreak(spark):
    d = _docs(spark)
    top = sp.topk_per_group(d, ["source"], "n_chars", 3, tiebreak_col="doc_id")
    per_group = top.groupBy("source").count().collect()
    assert all(r["count"] <= 3 for r in per_group)
    # rank 1 really is the max n_chars of its group
    best = {r.source: r.n_chars for r in top.filter("rank = 1").collect()}
    true_max = {
        r.source: r.mx
        for r in d.groupBy("source").agg(F.max("n_chars").alias("mx")).collect()
    }
    assert best == true_max


def test_weighted_sample_monotone_in_base_and_weight(spark):
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    df = spark.createDataFrame(
        [(i, (i % 11) / 10.0) for i in range(400)], "doc_id long, w double"
    )
    keep30 = {r["doc_id"] for r in
              smp.weighted_hash_sample(df, "w", "doc_id", 30).collect()}
    keep60 = {r["doc_id"] for r in
              smp.weighted_hash_sample(df, "w", "doc_id", 60).collect()}
    assert keep30 <= keep60, "raising base_pct must only ADD rows"
    # zero-weight rows can never be sampled; full-weight rows sample at
    # ~base_pct
    zeros = {r["doc_id"] for r in df.filter("w = 0.0").collect()}
    assert not (keep60 & zeros)
    full = [r["doc_id"] for r in df.filter("w = 1.0").collect()]
    rate = len(keep60 & set(full)) / len(full)
    assert 0.4 < rate < 0.8, f"full-weight sampling rate {rate} far from 60%"


def _mix_docs(spark):
    rows = []
    for s, n in (("a", 10), ("b", 10), ("c", 10)):
        for i in range(n):
            rows.append((hash((s, i)) % 10_000 + len(rows) * 10_000,
                         s, "tok " * 10))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_mixture_plan_budget_split_and_cap(spark):
    """Targets follow integer weight shares of the budget; a source whose
    share exceeds its supply caps at rate 1M ppm; unweighted sources get
    weight 0 / rate 0 audit rows."""
    from _event_intelligence_data_warehouse_spark.operators import sampling as smp

    docs = _mix_docs(spark)  # 100 tokens per source
    plan = {r.source: r for r in smp.mixture_plan(
        docs, {"a": 3, "b": 1}, token_budget=400).collect()}
    assert set(plan) == {"a", "b", "c"}
    assert plan["a"].target_tokens == 300 and plan["b"].target_tokens == 100
    # a's 300-token share exceeds its 100 available -> capped at 100%
    assert plan["a"].rate_ppm == 1_000_000
    assert plan["b"].rate_ppm == 1_000_000  # exactly its supply
    assert plan["c"].weight == 0 and plan["c"].rate_ppm == 0

    half = {r.source: r for r in smp.mixture_plan(
        docs, {"a": 1, "b": 1}, token_budget=100).collect()}
    assert half["a"].target_tokens == 50
    assert half["a"].rate_ppm == 500_000  # 50/100 of supply


def test_mixture_plan_zero_token_source_rates_zero(spark):
    """A weighted source whose documents all tokenize empty must plan
    rate 0 — not a NULL (non-ANSI div-by-zero) that diverges from the
    oracle's erroring HUGEINT division."""
    from _event_intelligence_data_warehouse_spark.operators import sampling as smp

    docs = spark.createDataFrame(
        [(1, "a", "tok tok tok"), (2, "z", ""), (3, "z", "   ")],
        "doc_id long, source string, text string",
    )
    plan = {r.source: r for r in smp.mixture_plan(
        docs, {"a": 1, "z": 1}, token_budget=100).collect()}
    assert plan["z"].n_tokens == 0
    assert plan["z"].rate_ppm == 0, "zero-token source must not rate NULL"
    assert plan["a"].rate_ppm is not None and plan["a"].rate_ppm > 0


def test_mixture_sample_determinism_and_exclusion(spark):
    from _event_intelligence_data_warehouse_spark.operators import sampling as smp

    docs = _mix_docs(spark)
    kw = dict(weights={"a": 1, "b": 1}, token_budget=100)
    s1 = sorted(r.doc_id for r in smp.mixture_sample(docs, **kw).collect())
    s2 = sorted(
        r.doc_id
        for r in smp.mixture_sample(docs.repartition(7), **kw).collect()
    )
    assert s1 == s2, "mixture sample not stable under repartitioning"
    srcs = {r.source for r in smp.mixture_sample(docs, **kw).collect()}
    assert "c" not in srcs, "zero-weight source leaked into the sample"
    assert 0 < len(s1) < 30, "rate ~50% of two sources should keep a strict subset"


def test_leakage_safe_split_never_separates_near_dups(spark):
    """Every edge of the pair graph must have both endpoints on the same
    side; a plain doc-id split on the same graph does separate some pair
    (showing the guard is load-bearing, not vacuous)."""
    from _event_intelligence_data_warehouse_spark.operators import sampling as smp

    vertices = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    )
    # chains of 4: {0..3}, {4..7}, ... -> 10 components
    edges = spark.createDataFrame(
        [(b + i, b + i + 1) for b in range(0, 40, 4) for i in range(3)],
        "doc_a long, doc_b long",
    )
    out = smp.leakage_safe_split(vertices, edges, holdout_pct=40)
    side = {r.doc_id: r.split for r in out.collect()}
    comp = {r.doc_id: r.component_id for r in out.collect()}
    for e in edges.collect():
        assert side[e.doc_a] == side[e.doc_b], (
            f"pair ({e.doc_a},{e.doc_b}) straddles the split"
        )
        assert comp[e.doc_a] == comp[e.doc_b]
    assert {"train", "holdout"} == set(side.values()), (
        "40% holdout over 10 components should populate both sides"
    )

    naive = smp.train_holdout_split(vertices, "doc_id", 40)
    nside = {r.doc_id: r.split for r in naive.collect()}
    assert any(nside[e.doc_a] != nside[e.doc_b] for e in edges.collect()), (
        "doc-id split happened to keep all pairs together — test corpus "
        "not probative"
    )


def test_kfold_never_splits_near_dup_pairs(spark):
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    out = smp.leakage_safe_kfold(
        docs, pairs.toDF("doc_a", "doc_b"), k=3
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 40
    assert set(r.fold for r in rows.values()) <= {0, 1, 2}
    for a, b in [(0, 1), (1, 2), (10, 11), (20, 21)]:
        assert rows[a].fold == rows[b].fold, "near-dup pair straddles folds"
        assert rows[a].component_id == rows[b].component_id
    # transitive closure: 0-1-2 all share one fold
    assert rows[0].fold == rows[2].fold


def test_winsorize_clamps_group_outliers_only(spark):
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    rows = (
        [(i, "a", float(i)) for i in range(1, 100)] + [(100, "a", 1000.0)]
        + [(200 + i, "b", 5.0) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r.id: r for r in smp.winsorize(
        df, "v", ["g"], p_lo=0.05, p_hi=0.95, tiebreak_col="id"
    ).collect()}
    # the planted outlier clamps to group a's p95 pick
    assert out[100].clamped == 1 and out[100].value_clamped < 1000.0
    # mid-range rows untouched
    assert out[50].clamped == 0 and out[50].value_clamped == 50.0
    # low tail clamps up
    assert out[1].clamped == 1 and out[1].value_clamped > 1.0
    # constant group: nothing clamps
    assert all(out[200 + i].clamped == 0 for i in range(10))


def test_group_percentile_calibrates_within_group(spark):
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    rows = [
        # source a: scores 10 < 20 < 30 -> pct 0, .5, 1
        (1, "a", 10), (2, "a", 20), (3, "a", 30),
        # source b: same raw scores, different meaning — calibrated
        # independently
        (4, "b", 10), (5, "b", 30),
        # singleton group scores 0.0 (not NaN)
        (6, "c", 99),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, score long")
    got = {
        r.doc_id: r.pct_rank
        for r in smp.group_percentile(
            df, "score", ["source"], tiebreak_col="doc_id"
        ).collect()
    }
    assert got[1] == 0.0 and got[2] == 0.5 and got[3] == 1.0
    assert got[4] == 0.0 and got[5] == 1.0
    assert got[6] == 0.0


def test_key_skew_profile_ranks_heavy_keys(spark):
    from pyspark.sql import functions as F

    from _event_intelligence_data_warehouse_spark.operators import skew as sk

    df = spark.range(100).select(
        F.when(F.col("id") < 70, F.lit("hot"))
        .when(F.col("id") < 90, F.lit("warm"))
        .otherwise(F.concat(F.lit("cold"), F.col("id"))).alias("k")
    )
    got = sk.key_skew_profile(df, ["k"], top_n=3).collect()
    assert [r.k for r in got[:2]] == ["hot", "warm"]
    assert got[0].n_rows == 70 and got[0].share_ppm == 700000
    assert got[1].n_rows == 20 and got[1].share_ppm == 200000
    assert [r.rnk for r in got] == [1, 2, 3]


def test_allocate_stratified_exact_budget_and_caps(spark):
    from pyspark.sql import functions as F

    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    # strata 70 / 25 / 5, budget 10 -> proportional quotas 7 / 2.5 / 0.5
    # largest-remainder: bases 7,2,0 (sum 9), leftover 1 -> largest rem
    df = spark.range(100).select(
        F.col("id"),
        F.when(F.col("id") < 70, "a")
        .when(F.col("id") < 95, "b").otherwise("c").alias("g"),
    )
    out = smp.allocate_stratified(df, ["g"], 10, tiebreak_col="id")
    got = out.groupBy("g").count().collect()
    by_g = {r.g: r["count"] for r in got}
    assert sum(by_g.values()) == 10, "quotas must sum to the budget"
    assert by_g["a"] == 7 and by_g["a"] + by_g["b"] + by_g.get("c", 0) == 10

    # determinism: identical membership across runs
    ids1 = sorted(r.id for r in out.collect())
    ids2 = sorted(
        r.id for r in smp.allocate_stratified(
            df.repartition(7), ["g"], 10, tiebreak_col="id"
        ).collect()
    )
    assert ids1 == ids2

    # extreme skew still sums exactly (largest remainder gives the
    # tiny stratum its fair ~1, never over-draws it: with budget <= N,
    # quota_i <= ceil(n_i * budget/N) <= n_i, so the cap is a belt)
    tiny = spark.createDataFrame(
        [(i, "x") for i in range(2)] + [(i + 10, "y") for i in range(100)],
        "id long, g string",
    )
    out2 = smp.allocate_stratified(tiny, ["g"], 50, tiebreak_col="id")
    by = {r.g: r["count"] for r in out2.groupBy("g").count().collect()}
    assert sum(by.values()) == 50
    assert by["x"] == 1  # floor(50*2/102)=0 + largest-remainder top-up


def test_mad_outliers_survive_what_breaks_the_z_test(spark):
    """A cluster of extreme values drags mean/stddev enough for a
    z-test to miss them; median/MAD still flags every one."""
    from pyspark.sql import functions as F

    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    vals = [10.0 + (i % 5) * 0.1 for i in range(20)] + [500.0, 510.0, 520.0]
    df = spark.createDataFrame(
        [(i, "a", v) for i, v in enumerate(vals)],
        "id long, g string, v double",
    ).withColumn("v", F.col("v").cast("decimal(18,2)"))
    got = {r.id: r for r in smp.mad_outliers(
        df, "v", ["g"], k=3, tiebreak_col="id"
    ).collect()}
    flagged = {i for i, r in got.items() if r.is_outlier}
    assert flagged == {20, 21, 22}
    assert float(got[0].group_median) < 11
    # the z-test misses: mean ~75, std ~150 -> |500-75|/150 < 3
    import statistics
    mu, sd = statistics.mean(vals), statistics.pstdev(vals)
    assert abs(500.0 - mu) / sd < 3.0, "fixture should break the z-test"


def test_mixture_plan_temperature_upweights_small_sources(spark):
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    rows = []
    for i in range(90):
        rows.append((i, "big", "alpha beta gamma delta"))
    for i in range(90, 100):
        rows.append((i, "small", "alpha beta gamma delta"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    flat = {r.source: r for r in smp.mixture_plan_temperature(
        df, 100_000, alpha=1.0).collect()}
    smooth = {r.source: r for r in smp.mixture_plan_temperature(
        df, 100_000, alpha=0.5).collect()}
    # alpha=1: proportional (9:1). alpha=0.5: sqrt(360):sqrt(40) = 3:1
    assert flat["big"].target_tokens == 90_000
    assert flat["small"].target_tokens == 10_000
    assert smooth["small"].target_tokens == 25_000
    assert smooth["big"].target_tokens == 75_000
    # exact isqrt: weights are floor(sqrt(360)) = 18, floor(sqrt(40)) = 6
    assert smooth["big"].weight == 18 and smooth["small"].weight == 6
    import pytest as _pt

    with _pt.raises(ValueError):
        smp.mixture_plan_temperature(df, 10, alpha=0.7)


def test_mixture_plan_temperature_isqrt_exact_at_boundaries(spark):
    """floor(sqrt(n)) must be exact at perfect squares and off-by-one
    neighbors, where the double seed is most likely to round wrong."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    # one doc per source, token counts 15, 16, 17 (around 4^2)
    rows = [
        (1, "s15", " ".join(["w"] * 15)),
        (2, "s16", " ".join(["w"] * 16)),
        (3, "s17", " ".join(["w"] * 17)),
        (4, "s25", " ".join(["w"] * 25)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r.weight for r in smp.mixture_plan_temperature(
        df, 1000, alpha=0.5).collect()}
    assert got == {"s15": 3, "s16": 4, "s17": 4, "s25": 5}
    # alpha=0.25: isqrt twice
    got2 = {r.source: r.weight for r in smp.mixture_plan_temperature(
        df, 1000, alpha=0.25).collect()}
    assert got2 == {"s15": 1, "s16": 2, "s17": 2, "s25": 2}
