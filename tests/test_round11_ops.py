"""Round-11 operator tests: footer-metadata row counts, token-level
decontamination, release-gate composition, governance additions."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_token_decontaminate_planted_leak(spark):
    """A corpus doc carrying a verbatim benchmark passage is flagged at
    the token level even under casing/whitespace noise, grams span word
    boundaries, and clean docs stay unflagged."""
    from _event_intelligence_data_warehouse_spark.contract.extension_queries import (  # noqa: E501
        _BPE_MERGES,
    )
    from _event_intelligence_data_warehouse_spark.operators import (
        text as tx,
    )

    passage = "the weather at the church tower was lower than ever"
    bench = spark.createDataFrame(
        [(900, passage)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # leak: same passage, noisy casing + whitespace
            (1, "intro text THE   Weather at tHe ChUrCh tower was "
                "LOWER than ever outro"),
            # clean: disjoint vocabulary
            (2, "completely unrelated content about databases and "
                "query planning in spark"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.bench_id): r.n_shared
        for r in tx.token_decontaminate(
            corpus, bench, _BPE_MERGES, n=4, min_shared=3
        ).collect()
    }
    assert (1, 900) in out and out[(1, 900)] >= 3
    assert not any(d == 2 for d, _ in out)
    # token grams span word boundaries: with a 4-gram over the 10-token
    # passage, every shared gram necessarily crosses words
    toks = {
        r.doc_id: r.gram_hash
        for r in tx.token_ngram_hashes(bench, _BPE_MERGES, n=4)
        .groupBy("doc_id").count()
        .withColumnRenamed("count", "gram_hash").collect()
    }
    assert toks[900] > 1


def test_release_gate_invariants(spark):
    """Release-gate output invariants at sf0.001: no benchmark member
    survives the gate, shard provenance counts match the actual rows,
    and packing offsets tile each source's token stream exactly."""
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = QUERIES["curation_release_gate"](spark, SF_DIR).collect()
    assert rows
    assert all(r.doc_id % 20 != 0 for r in rows)
    per_shard: dict[int, int] = {}
    for r in rows:
        per_shard[r.shard] = per_shard.get(r.shard, 0) + 1
    for r in rows:
        assert r.shard_records == per_shard[r.shard]
    # packing: within a source, start offsets (bin_id*256 + bin_offset)
    # are the running sum of token counts in doc_id order
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for rs in by_src.values():
        rs.sort(key=lambda r: r.doc_id)
        run = 0
        for r in rs:
            assert r.bin_id * 256 + r.bin_offset == run
            run += r.n_tokens


def test_parquet_row_count_matches_scan(spark, tmp_path):
    from _event_intelligence_data_warehouse_spark import storage as st

    path = os.path.join(SF_DIR, "documents.parquet")
    n_meta = st.parquet_row_count(path)
    n_scan = spark.read.parquet(path).count()
    assert n_meta == n_scan
    # empty / non-parquet directories fall back to None, never a guess
    assert st.parquet_row_count(str(tmp_path)) is None
    assert st.parquet_row_count(str(tmp_path / "missing")) is None
