"""Round-10 additions: dedup-aware loss-mask span layout and the v7
selection pipeline (DSIR gate -> temperature mixture -> leakage-safe
split), plus the convergence fail-fast on connected_components."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.contract import QUERIES

SF = "/root/testdata/sf0.001"


def test_loss_mask_spans_stage_coupling(spark, tmp_path):
    """On a crafted corpus the mask reflects dedup (copies keep their
    bytes, train with mask 0) and the spans reflect the packing: a doc
    crossing the 512 boundary splits into two rows."""
    long_text = " ".join(f"w{i}" for i in range(510))
    rows = [
        (0, long_text, "s1"),          # %5==0 -> planted copy 100000
        (2, "one two three four", "s1"),
        (4, "seven eight nine", "s2"),  # %5!=0... (4 % 5 != 0)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {
        (r.doc_id, r.bin_id): (r.shard, r.span_start, r.span_len,
                               r.loss_mask)
        for r in QUERIES["curation_loss_mask_spans"](spark, sf).collect()
    }
    # shard s1 stream in id order: doc 0 (510 toks), doc 2 (4 toks),
    # doc 100000 (the planted copy of 0, 510 toks), = 1024 tokens.
    assert out[(0, 0)] == ("s1", 0, 510, 1)
    # doc 2 straddles the 512 boundary: 2 tokens in bin 0, 2 in bin 1
    assert out[(2, 0)] == ("s1", 510, 2, 1)
    assert out[(2, 1)] == ("s1", 0, 2, 1)
    # the copy occupies [514, 1024) — entirely inside bin 1, mask 0
    assert out[(100000, 1)] == ("s1", 2, 510, 0)
    assert out[(4, 0)] == ("s2", 0, 3, 1)
    assert len(out) == 5


def test_loss_mask_spans_invariants_sf0001(spark):
    out = QUERIES["curation_loss_mask_spans"](spark, SF)
    bad = out.filter(
        (F.col("span_start") < 0) | (F.col("span_start") >= 512)
        | (F.col("span_len") <= 0)
        | (F.col("span_start") + F.col("span_len") > 512)
        | ~F.col("loss_mask").isin(0, 1)
    ).count()
    assert bad == 0
    # every planted copy (id >= 100000 duplicates an original with a
    # smaller id) is mask-0; per-doc masks are constant across spans
    copies = out.filter("doc_id >= 100000")
    assert copies.count() > 0
    assert copies.filter("loss_mask != 0").count() == 0
    assert (
        out.groupBy("doc_id")
        .agg(F.countDistinct("loss_mask").alias("k"))
        .filter("k > 1")
        .count()
        == 0
    )


def test_pipeline_v7_leakage_and_gate(spark):
    out = QUERIES["curation_pipeline_v7"](spark, SF)
    rows = out.collect()
    assert rows, "v7 picked nothing at sf0.001"
    # leakage guard: a component never splits across train/holdout
    assert (
        out.groupBy("component_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
        == 0
    )
    # split label is a pure function of component_id (md5 bucket < 20)
    from _event_intelligence_data_warehouse_spark.operators.text import (
        token_hash,
    )

    chk = out.withColumn(
        "want",
        F.when(
            token_hash(F.col("component_id").cast("string")) % 100 < 20,
            F.lit("holdout"),
        ).otherwise("train"),
    )
    assert chk.filter("split != want").count() == 0
    # duplicate twins (planted copies that survived selection together
    # with their original) share a component
    ids = {r.doc_id for r in rows}
    comp = {r.doc_id: r.component_id for r in rows}
    twins = [(i, i + 100000) for i in ids if i + 100000 in ids]
    for a, b in twins:
        assert comp[a] == comp[b]


def test_connected_components_fail_fast_on_diameter(spark):
    from _event_intelligence_data_warehouse_spark.operators import (
        dedup as dd,
    )

    # a 12-node path graph has diameter 11 > max_iter=3
    v = spark.range(12).withColumnRenamed("id", "doc_id")
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], ["doc_a", "doc_b"]
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        dd.connected_components(
            v, e, max_iter=3, require_converged=True
        ).collect()
    # same graph converges (and labels to min id 0) with budget
    lbl = dd.connected_components(
        v, e, max_iter=20, require_converged=True
    ).collect()
    assert all(r.component_id == 0 for r in lbl)


def test_connected_components_fixpoint_on_last_iteration(spark):
    """Convergence detection consumes one confirming pass, so a graph
    whose labels land on the fixpoint exactly at pass max_iter must
    NOT trip require_converged (r10 advice item 4: the loop runs
    max_iter + 1 passes — full max_iter budget of label movement plus
    the confirming pass)."""
    from _event_intelligence_data_warehouse_spark.operators import (
        dedup as dd,
    )

    # 4-node path 0-1-2-3: min-label propagation needs exactly 3
    # movement rounds for label 0 to reach node 3.
    v = spark.range(4).withColumnRenamed("id", "doc_id")
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(3)], ["doc_a", "doc_b"]
    )
    lbl = dd.connected_components(
        v, e, max_iter=3, require_converged=True
    ).collect()
    assert all(r.component_id == 0 for r in lbl)


def test_pii_scrub_counts_and_redaction(spark):
    from _event_intelligence_data_warehouse_spark.operators import (
        text as tx,
    )

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org or d@e.io call +1-555-0001"),
            (2, "server at 10.0.0.1 and 192.168.001.255 ok"),
            (3, "nothing to scrub here"),
            (4, "+1-555-12345 is too long but matches prefix"),
            # the r10 advice repro: a phone and an IP embedded in email
            # local parts are consumed by <EMAIL> — progressive counting
            # reports 2 PII, matching the 2 placeholders emitted
            (5, "a+1-555-1234@x.com or 1.2.3.4@ex.io"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in tx.pii_scrub(docs).collect()}
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (2, 1, 0)
    assert out[1].clean_text == "mail <EMAIL> or <EMAIL> call <PHONE>"
    assert (out[2].n_emails, out[2].n_phones, out[2].n_ips) == (0, 0, 2)
    assert out[2].clean_text == "server at <IP> and <IP> ok"
    assert out[3].n_pii == 0 and out[3].clean_text == "nothing to scrub here"
    # the phone pattern is prefix-greedy by design: the first 4 digits
    # match, the trailing digit survives
    assert out[4].n_phones == 1 and out[4].clean_text.startswith("<PHONE>5")
    assert (out[5].n_emails, out[5].n_phones, out[5].n_ips) == (2, 0, 0)
    assert out[5].n_pii == 2
    assert out[5].clean_text == "<EMAIL> or <EMAIL>"
