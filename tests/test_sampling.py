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
