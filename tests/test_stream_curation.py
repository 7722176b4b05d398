"""Streaming document curation: quality gate + in-batch and cross-batch
exact dedup against a persisted fingerprint ledger, exactly-once through
the checkpoint and idempotent through the anti-join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.storage import Warehouse
from _event_intelligence_data_warehouse_spark.streaming import jobs

GOOD = ("the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps in the warm sun for a while afterwards")


def _docs(spark, rows):
    return spark.createDataFrame(rows, jobs.DOCS_STREAM_SCHEMA)


def _land(df, input_dir, name):
    df.coalesce(1).write.mode("append").parquet(input_dir)


def test_stream_curation_dedups_across_batches(spark, tmp_path):
    whdir, indir, ckpt = (str(tmp_path / d) for d in ("wh", "in", "ckpt"))
    os.makedirs(indir, exist_ok=True)
    wh = Warehouse(spark, whdir)

    # batch 1: two good docs, an in-batch duplicate, one junk doc
    _land(_docs(spark, [
        (1, GOOD, "en", "src0"),
        (2, GOOD + " second variant text here", "en", "src0"),
        (3, GOOD, "en", "src1"),          # in-batch dup of doc 1
        (4, "!!! ??? !!!", "und", "src1"),  # fails the quality gate
    ]), indir, "b1")
    jobs.stream_curate_documents(spark, wh, indir, ckpt)
    out1 = {r.doc_id for r in wh.read(jobs.CURATED_DOCS).collect()}
    assert out1 == {1, 2}, "in-batch dup kept or junk admitted"

    # batch 2: one new doc + a cross-batch duplicate under a NEW id
    _land(_docs(spark, [
        (5, GOOD + " a genuinely new document body", "en", "src2"),
        (6, GOOD, "en", "src2"),          # duplicate of already-curated 1
    ]), indir, "b2")
    jobs.stream_curate_documents(spark, wh, indir, ckpt)
    out2 = {r.doc_id for r in wh.read(jobs.CURATED_DOCS).collect()}
    assert out2 == {1, 2, 5}, "cross-batch dup re-entered or new doc lost"

    # the curated table's own fingerprint column is the dedup ledger
    fps = [r.fingerprint for r in wh.read(jobs.CURATED_DOCS).collect()]
    assert len(fps) == len(set(fps)) == 3

    # drain with nothing new: no growth (checkpoint exactly-once)
    jobs.stream_curate_documents(spark, wh, indir, ckpt)
    assert wh.read(jobs.CURATED_DOCS).count() == 3

    # fresh checkpoint (simulated checkpoint loss): every file re-offers,
    # but the fingerprint anti-join absorbs the replay — no duplicates
    jobs.stream_curate_documents(spark, wh, indir, str(tmp_path / "ckpt2"))
    assert wh.read(jobs.CURATED_DOCS).count() == 3
