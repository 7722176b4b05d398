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


def test_token_ngram_hashes_matches_python_replay(spark):
    """The engine's token-gram scheme — greedy left-to-right BPE folds
    per word, in-order flatten, space-joined n-gram, md5-prefix hash —
    replayed in pure Python must produce the exact hash set."""
    import hashlib

    from _event_intelligence_data_warehouse_spark.contract.extension_queries import (  # noqa: E501
        _BPE_MERGES,
    )
    from _event_intelligence_data_warehouse_spark.operators import (
        text as tx,
    )
    import re

    def bpe(word: str) -> list[str]:
        syms = list(word)
        for left, right in _BPE_MERGES:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms = out
        return syms

    text = "The Church Tower weathers LOWER weather at the catch 22"
    toks: list[str] = []
    for w in re.findall(r"[a-z]+", text.lower()):
        toks.extend(bpe(w))
    n = 4
    want = {
        int(hashlib.md5(" ".join(toks[i:i + n]).encode()).hexdigest()[:8],
            16)
        for i in range(len(toks) - n + 1)
    }
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r.gram_hash
        for r in tx.token_ngram_hashes(df, _BPE_MERGES, n=n).collect()
    }
    assert got == want


def test_token_decontaminate_fast_hash_pair_set(spark):
    """portable_hash=False (xxhash64 fast path) yields the identical
    contamination pair set and shared-gram counts as the md5-portable
    contract — the hash value never reaches the output, only pair
    membership does."""
    from _event_intelligence_data_warehouse_spark.contract.extension_queries import (  # noqa: E501
        _BPE_MERGES,
    )
    from _event_intelligence_data_warehouse_spark.operators import (
        text as tx,
    )

    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "text")
    )
    bench = docs.filter(F.col("doc_id") % 41 == 0)
    a = {
        (r.doc_id, r.bench_id, r.n_shared)
        for r in tx.token_decontaminate(
            docs, bench, _BPE_MERGES, n=4, min_shared=3
        ).collect()
    }
    b = {
        (r.doc_id, r.bench_id, r.n_shared)
        for r in tx.token_decontaminate(
            docs, bench, _BPE_MERGES, n=4, min_shared=3,
            portable_hash=False,
        ).collect()
    }
    assert a and a == b
    # r12: the registered production configuration (xxhash64 +
    # row_vocab fold — the text_token_decontaminate_fast contract
    # entry) and the 30k-merge-scale vocab_join fold must both yield
    # the identical pair set and counts: the fold mode only moves
    # WHERE the merge folds run, never what they produce, and the
    # hash value never reaches the output.
    for mode in ("row_vocab", "vocab_join"):
        c = {
            (r.doc_id, r.bench_id, r.n_shared)
            for r in tx.token_decontaminate(
                docs, bench, _BPE_MERGES, n=4, min_shared=3,
                portable_hash=False, fold=mode,
            ).collect()
        }
        assert a == c, f"fold={mode} pair set diverged"


def test_token_ngram_fold_modes_identical_grams(spark):
    """All three fold modes produce byte-identical (doc_id, gram_hash)
    sets — row_vocab's per-row map lookup and vocab_join's broadcast
    vocabulary reassembly must reconstruct the exact in-order token
    stream the inline fold produces, including repeated words, words
    folding to multi-char tokens, and documents with < n tokens
    (dropped by every mode)."""
    from _event_intelligence_data_warehouse_spark.contract.extension_queries import (  # noqa: E501
        _BPE_MERGES,
    )
    from _event_intelligence_data_warehouse_spark.operators import (
        text as tx,
    )

    rows = [
        (1, "The Church Tower weathers LOWER weather at the catch 22"),
        (2, "the the the atch atch the"),   # heavy repetition
        (3, "zq"),                          # folds below n tokens
        (4, ""),                            # no words at all
        (5, "Watch the weather; watch the catch!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ref = {
        (r.doc_id, r.gram_hash)
        for r in tx.token_ngram_hashes(
            df, _BPE_MERGES, n=4, portable_hash=False
        ).collect()
    }
    assert ref  # fixture must actually produce grams
    for mode in ("row_vocab", "vocab_join"):
        got = {
            (r.doc_id, r.gram_hash)
            for r in tx.token_ngram_hashes(
                df, _BPE_MERGES, n=4, portable_hash=False, fold=mode
            ).collect()
        }
        assert got == ref, f"fold={mode} grams diverged"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tx.token_ngram_hashes(df, _BPE_MERGES, fold="nope")


def test_release_funnel_conservation(spark):
    """Per source: raw = bench + contam + dup + sampled-out + released
    (every document lands in exactly one funnel stage), and the funnel's
    released counts equal curation_release_gate's actual output."""
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    fun = {r.source: r for r in
           QUERIES["governance_release_funnel"](spark, SF_DIR).collect()}
    assert fun
    for r in fun.values():
        assert (
            r.bench_dropped + r.contam_dropped + r.dup_dropped
            + r.sample_dropped + r.released
        ) == r.raw_docs
    gate = QUERIES["curation_release_gate"](spark, SF_DIR).collect()
    per_src: dict[str, int] = {}
    for g in gate:
        per_src[g.source] = per_src.get(g.source, 0) + 1
    for src, r in fun.items():
        assert r.released == per_src.get(src, 0)


def test_parquet_row_count_matches_scan(spark, tmp_path):
    from _event_intelligence_data_warehouse_spark import storage as st

    path = os.path.join(SF_DIR, "documents.parquet")
    n_meta = st.parquet_row_count(path)
    n_scan = spark.read.parquet(path).count()
    assert n_meta == n_scan
    # empty / non-parquet directories fall back to None, never a guess
    assert st.parquet_row_count(str(tmp_path)) is None
    assert st.parquet_row_count(str(tmp_path / "missing")) is None
