"""Unit tests for the round-2 curation operators: TF-IDF top terms,
repetition screens, and canonical keep-best election."""

from __future__ import annotations

from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.operators import dedup as dd
from _event_intelligence_data_warehouse_spark.operators import text as tx


def test_tfidf_prefers_rare_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "common rare_one rare_one"),
            (2, "common filler filler"),
            (3, "common other words"),
        ],
        "doc_id long, text string",
    )
    out = tx.tfidf_top_terms(docs, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'common' appears in every doc (idf floor ln(1)+1); repeated
    # doc-specific terms (tf=2, idf ln(2)+1) outscore it.
    assert top[1] == "rare_one"
    assert top[2] == "filler"
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["doc_freq"]) for r in out}
    assert rows[(1, "rare_one")] == (2, 1)
    assert rows[(2, "filler")] == (2, 1)


def test_repetition_metrics_flags_spam(spark):
    docs = spark.createDataFrame(
        [
            (1, "buy buy buy buy buy buy"),        # one word everywhere
            (2, "a healthy mix of many different words here today"),
            (3, "solo"),                            # no bigrams at all
            (4, ""),                                # no tokens at all
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.repetition_metrics(docs).collect()}
    assert out[1]["top_word_frac"] == 1.0 and not out[1]["keep"]
    assert out[2]["keep"]
    assert out[3]["n_tokens"] == 1 and out[3]["top_bigram_frac"] == 0.0
    assert out[4]["n_tokens"] == 0 and out[4]["top_word_frac"] == 0.0


def test_canonical_keep_best_elects_highest_quality(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7)],
        "doc_id long, component_id long",
    )
    quality = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (7, 0.1)],
        "doc_id long, quality_score double",
    )
    out = {r["doc_id"]: r for r in
           dd.canonical_keep_best(comps, quality).collect()}
    # 2 and 3 tie on quality -> lower doc_id wins
    assert out[2]["keep"] and not out[3]["keep"] and not out[1]["keep"]
    assert out[7]["keep"], "singleton clusters keep their only member"
    assert out[1]["group_size"] == 3 and out[7]["group_size"] == 1


def test_hll_merge_equals_direct_sketch(spark):
    """Merged group registers must give EXACTLY the whole-input estimate
    — the associativity that makes the sketch distributable."""
    from _event_intelligence_data_warehouse_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(500)], "x long, g string"
    )
    direct = sk.hll_estimate(df, "x").first()["hll_estimate"]
    rows = {r["group_name"]: r["hll_estimate"]
            for r in sk.hll_grouped_with_merge(df, "x", "g").collect()}
    assert rows["__ALL__"] == direct
    assert set(rows) == {"g0", "g1", "g2", "__ALL__"}


def test_cms_estimate_never_undercounts(spark):
    from _event_intelligence_data_warehouse_spark.operators import sketches as sk

    df = spark.createDataFrame(
        [(i % 37,) for i in range(2000)], "x long"
    )
    for r in sk.cms_heavy_hitters(df, "x", k=10).collect():
        assert r["cms_estimate"] >= r["exact_count"]


def test_ngram_contamination_flags_planted_overlap(spark):
    """Planted contamination: a corpus doc sharing k distinct word
    3-grams with a benchmark doc reports exactly n_shared = k; disjoint
    docs are absent; the benchmark index joins as a broadcast."""
    bench = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "xx alpha beta gamma yy"),        # 1 shared 3-gram
            (2, "alpha beta gamma delta zz"),     # 2 shared 3-grams
            (3, "totally different words here"),  # disjoint
        ],
        "doc_id long, text string",
    )
    out = tx.ngram_contamination(corpus, bench, n=3, min_shared=1)
    got = {(r.doc_id, r.bench_id): r.n_shared for r in out.collect()}
    assert got == {(1, 1000): 1, (2, 1000): 2}

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, (
        "benchmark gram index should broadcast; corpus side must not shuffle"
    )


def test_ngram_contamination_counts_distinct_grams_once(spark):
    """A gram repeated inside one doc still counts once per pair (both
    sides are per-doc distinct by construction)."""
    bench = spark.createDataFrame(
        [(50, "a b c a b c")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(1, "a b c a b c a b c")], "doc_id long, text string"
    )
    rows = tx.ngram_contamination(corpus, bench, n=3).collect()
    # distinct 3-grams of 'a b c a b c ...': 'a b c', 'b c a', 'c a b'
    assert len(rows) == 1 and rows[0].n_shared == 3


def test_incremental_minhash_equals_full_recompute_restricted(spark):
    """The incremental path must emit exactly the full recompute's pairs
    that touch the batch — no missed cross pairs, no phantom extras."""
    base = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta w{i}")
        for i in range(20)
    ]
    corpus = spark.createDataFrame(base, "doc_id long, text string")
    # batch: near-copies of corpus docs 0/5/10 (+1000) and one novel doc
    batch_rows = [
        (i + 1000, t + " extra") for i, t in base if i % 5 == 0
    ] + [(2000, "totally unrelated content nothing shared here at all")]
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    sets_, sigs = dd.minhash_index(corpus)
    full = {
        (r.doc_a, r.doc_b)
        for r in dd.minhash_dedup(
            corpus.unionByName(batch), threshold=0.8
        ).collect()
    }
    batch_ids = {r.doc_id for r in batch.collect()}
    expected = {
        p for p in full if p[0] in batch_ids or p[1] in batch_ids
    }
    assert len(expected) > 0, "no planted near-dups — not probative"
    for prune in (False, True):
        incr = {
            (r.doc_a, r.doc_b)
            for r in dd.incremental_minhash_dedup(
                batch, sets_, sigs, threshold=0.8,
                prune_index_read=prune,
            ).collect()
        }
        assert incr == expected, f"prune_index_read={prune} diverged"
        assert all(a in batch_ids or b in batch_ids for a, b in incr)


def test_incremental_minhash_prunes_index_read_with_semi_join(spark):
    """With prune_index_read=True (the small-batch-vs-stored-index
    steady-state mode) the verify join must see only index docs that
    collide with the batch: a LeftSemi prune sits upstream, so the
    per-batch read of stored token sets is O(collisions), not
    O(corpus)."""
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i}") for i in range(10)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1000, "alpha beta gamma delta w0 extra")],
        "doc_id long, text string",
    )
    sets_, sigs = dd.minhash_index(corpus)
    out = dd.incremental_minhash_dedup(
        batch, sets_, sigs, threshold=0.8, prune_index_read=True
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan, (
        "stored token sets enter the verify join unpruned (full index read)"
    )
    # default mode (fixture-scale batches) stays prune-free
    out_d = dd.incremental_minhash_dedup(batch, sets_, sigs, threshold=0.8)
    assert "LeftSemi" not in (
        out_d._jdf.queryExecution().optimizedPlan().toString()
    )


def test_pack_sequences_contiguous_per_shard(spark):
    """Within a shard, start offsets are the running sum of predecessor
    token counts; bin/offset are exact div/mod of the start."""
    rows = [
        (1, "s1", "a b c"),          # 3 tokens, start 0
        (2, "s1", "d e f g"),        # 4 tokens, start 3
        (3, "s1", "h i j k l m n"),  # 7 tokens, start 7
        (10, "s2", "x y"),           # start 0 in its own shard
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in tx.pack_sequences(df, 5).collect()}
    assert (out[1].start_token, out[1].bin_id, out[1].bin_offset) == (0, 0, 0)
    assert (out[2].start_token, out[2].bin_id, out[2].bin_offset) == (3, 0, 3)
    assert (out[3].start_token, out[3].bin_id, out[3].bin_offset) == (7, 1, 2)
    assert out[10].start_token == 0 and out[10].shard == "s2"


def test_boilerplate_line_filter_drops_frequent_lines_keeps_order(spark):
    header, footer = "COOKIE BANNER", "copyright 2026"
    rows = [
        (1, f"{header}\nalpha body one\n{footer}"),
        (2, f"{header}\nbeta body two\n{footer}"),
        (3, f"{header}\ngamma body three"),
        (4, "delta body four\nrare line"),
        (5, f"{header}\n{footer}"),  # nothing but boilerplate
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in tx.boilerplate_line_filter(df, min_df=3).collect()
    }
    assert out[1].clean_text == "alpha body one"
    assert out[2].clean_text == "beta body two"
    assert out[3].clean_text == "gamma body three"
    # rare line (df=1) survives; line order preserved
    assert out[4].clean_text == "delta body four\nrare line"
    assert out[5].clean_text == ""
    assert (out[5].n_lines, out[5].n_removed) == (2, 2)
    assert (out[1].n_lines, out[1].n_removed) == (3, 2)
    # footer df=3 exactly meets the threshold
    assert out[2].n_removed == 2


def test_boilerplate_matching_is_normalized_but_output_is_raw(spark):
    rows = [
        (1, "  The   Footer \nbody a"),
        (2, "the footer\nbody b"),
        (3, "THE FOOTER\nbody c"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r
        for r in tx.boilerplate_line_filter(df, min_df=3).collect()
    }
    # all three case/whitespace variants count as ONE line for df
    assert out[1].clean_text == "body a"
    assert out[2].clean_text == "body b"
    assert out[3].clean_text == "body c"


def test_bpe_pair_stats_counts_weighted_adjacent_pairs(spark):
    # "aba" x3, "ab" x2, "ba" x1  ->  ab: 3+2=5... plus inside aba:
    # pairs of "aba" are {ab, ba} each once per occurrence.
    df = spark.createDataFrame(
        [(1, "aba aba ab"), (2, "aba ab ba"), (3, "x")], ["doc_id", "text"]
    )
    got = {r.pair: r.pair_count for r in tx.bpe_pair_stats(df).collect()}
    # ab: 3 (from aba) + 2 (from ab) = 5 ; ba: 3 (from aba) + 1 = 4
    assert got == {"ab": 5, "ba": 4}


def test_bpe_pair_stats_top_n_deterministic_tiebreak(spark):
    df = spark.createDataFrame([(1, "cd cd ef ef")], ["doc_id", "text"])
    rows = tx.bpe_pair_stats(df, top_n=1).collect()
    assert [(r.pair, r.pair_count) for r in rows] == [("cd", 2)]


def test_bloom_filter_no_false_negatives_and_merges(spark):
    from _event_intelligence_data_warehouse_spark.operators import (
        sketches as sk,
    )

    keys = spark.createDataFrame(
        [(f"key_{i}",) for i in range(200)], "k string"
    )
    bloom = sk.bloom_build(keys, "k")
    probe = spark.createDataFrame(
        [(i, f"key_{i}" if i < 200 else f"other_{i}") for i in range(400)],
        "pid long, k string",
    )
    got = {
        r.pid: r.maybe_present
        for r in sk.bloom_probe(probe, "k", bloom, id_col="pid").collect()
    }
    # Bloom guarantee: every member answers yes
    assert all(got[i] == 1 for i in range(200))
    # at m=65536 / k=5 / n=200 the false-positive rate is ~0, so the
    # non-members answer no (a deterministic fact of this fixed fixture)
    assert sum(got[i] for i in range(200, 400)) == 0
    # word frame stays tiny and mergeable
    assert bloom.count() <= sk.BLOOM_M // 32


def test_url_canonicalization_edge_forms(spark):
    from _event_intelligence_data_warehouse_spark.operators import urls as ur

    rows = [
        (1, "HTTPS://WWW.Example.COM:443/a/b/?q=1#frag"),
        (7, "https://example.com/CaseSensitivePath"),
        (2, "http://example.com/a/b"),
        (3, "example.com/a/b/"),               # schemeless
        (4, "ftp://cdn.media.example.co:21/x"),
        (5, "https://example.com"),            # no path
        (6, "https://sub.deep.example.org/p"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.doc_id: r for r in ur.canonicalize_urls(
        df, blocked_domains=["example.co"]
    ).collect()}
    assert got[1].url_canon == "example.com/a/b"
    assert got[2].url_canon == "example.com/a/b"
    assert got[3].url_canon == "example.com/a/b"
    assert got[1].host == "example.com" and got[1].domain == "example.com"
    assert got[4].host == "cdn.media.example.co"
    assert got[4].domain == "example.co" and got[4].blocked == 1
    assert got[5].url_canon == "example.com" and got[5].blocked == 0
    assert got[6].domain == "example.org"
    # host case folds; path case is semantic (RFC 3986) and preserved
    assert got[7].url_canon == "example.com/CaseSensitivePath"
    # 1, 2, 3 collapse to ONE canonical key — the URL-dedup property
    assert len({got[i].url_canon for i in (1, 2, 3)}) == 1


def test_incremental_cc_equals_full_and_merges_old_clusters(spark):
    from _event_intelligence_data_warehouse_spark.operators import dedup as dd

    # stored graph: {1,2} and {5,6} and singleton 9
    stored = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (6, 5), (9, 9)],
        "doc_id long, component_id long",
    )
    # batch: 20 joins cluster {5,6}; 21 bridges the two old clusters
    newv = spark.createDataFrame([(20,), (21,)], "doc_id long")
    edges = spark.createDataFrame(
        [(20, 6), (21, 2), (21, 5)], "doc_a long, doc_b long"
    )
    got = {
        r.doc_id: r.component_id
        for r in dd.connected_components_incremental(
            stored, newv, edges
        ).collect()
    }
    # bridge merges {1,2} + {5,6} + {20,21} -> min id 1
    assert got == {1: 1, 2: 1, 5: 1, 6: 1, 20: 1, 21: 1, 9: 9}

    # equals a full recompute over the whole graph
    allv = spark.createDataFrame(
        [(i,) for i in (1, 2, 5, 6, 9, 20, 21)], "doc_id long"
    )
    alle = spark.createDataFrame(
        [(1, 2), (5, 6), (20, 6), (21, 2), (21, 5)],
        "doc_a long, doc_b long",
    )
    full = {
        r.doc_id: r.component_id
        for r in dd.connected_components(allv, alle).collect()
    }
    assert got == full


def _bpe_reference(texts, n_merges):
    """Pure-Python reference: Sennrich-style learn_bpe over word freqs."""
    import re
    from collections import Counter

    wc = Counter()
    for t in texts:
        wc.update(re.findall(r"[a-z]+", t.lower()))
    vocab = {tuple(w): n for w, n in wc.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (l, r), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, cnt))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == l
                        and syms[i + 1] == r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def test_bpe_train_matches_reference_implementation(spark):
    texts = [
        "the theme of the thesis is these themes",
        "there the theory goes thence",
        "banana bandana and an anthem",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = tx.bpe_train(df, n_merges=6)
    want = _bpe_reference(texts, 6)
    assert got == want, f"{got} != {want}"
    # merged symbols grow beyond single characters
    assert any(len(l) + len(r) > 2 for l, r, _ in got)


def test_ngram_novelty_separates_original_from_derivative(spark):
    from _event_intelligence_data_warehouse_spark.operators import text as tx2

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, shared),                       # all grams recur in doc 2
        (2, shared + " extra tail words here"),
        (3, "completely original content nothing shared anywhere else"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in tx2.ngram_novelty(df, n=3).collect()}
    assert got[1].n_novel == 0 and got[1].novelty == 0.0
    assert got[3].n_novel == got[3].n_grams and got[3].novelty == 1.0
    # doc 2: shared prefix grams recur, tail grams are novel
    assert 0 < got[2].n_novel < got[2].n_grams


def test_lm_surprise_separates_templated_from_gibberish(spark):
    """The bigram-LM surprise score ranks a templated document (every
    continuation always seen) at exactly `scale`, and one-off gibberish
    strictly above the corpus-typical documents."""
    template = "order confirmed thank you for shopping"
    rows = (
        # 5 identical templated docs: every bigram's head predicts its
        # continuation with probability 1 -> surprise == scale
        [(i, template) for i in range(5)]
        # typical docs: shared vocabulary, varied continuations
        + [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "the quick red fox runs past the sleepy dog"),
            (12, "the slow brown bear walks under the tall tree"),
        ]
        # gibberish: every bigram unique, but heads ('the') are common
        + [(20, "the zxqv the wmbk the prtl")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in tx.lm_bigram_surprise(df).collect()}

    for i in range(5):
        assert got[i].surprise_total == got[i].n_bigrams * 1_000_000
        assert got[i].surprise_mean == 1_000_000.0
    # gibberish scores strictly above every typical doc
    typical_max = max(got[i].surprise_mean for i in (10, 11, 12))
    assert got[20].surprise_mean > typical_max
    # and typical docs score strictly above the pure template
    assert min(got[i].surprise_mean for i in (10, 11, 12)) > 1_000_000.0


def test_bpe_encode_stats_matches_reference_apply(spark):
    """bpe_encode_stats applies a fixed merge list exactly as the
    reference greedy left-to-right algorithm does, including cascaded
    multi-character merges."""
    merges = [("t", "h"), ("th", "e"), ("a", "t"), ("c", "h"),
              ("at", "ch")]

    def ref_apply(word):
        syms = list(word)
        for left, right in merges:
            out = []
            for s in syms:
                if out and out[-1] == left and s == right:
                    out[-1] = left + right
                else:
                    out.append(s)
            syms = out
        return syms

    texts = ["the batch hatches", "thatch patch", "zz", "TH-E b.atch"]
    import re

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_chars, r.n_tokens)
        for r in tx.bpe_encode_stats(df, merges).collect()
    }
    for i, t in enumerate(texts):
        words = re.findall("[a-z]+", t.lower())
        want = (
            len(words),
            sum(len(w) for w in words),
            sum(len(ref_apply(w)) for w in words),
        )
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"
    # sanity: merges actually fired (tokens < chars)
    assert got[0][2] < got[0][1]


def test_dsir_affinity_prefers_target_like_documents(spark):
    """Documents sharing the target domain's vocabulary score strictly
    above documents from a disjoint vocabulary."""
    target = spark.createDataFrame(
        [(100, "quantum physics entangles photons"),
         (101, "photons and quantum fields")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, "quantum photons entangle in physics experiments"),
         (2, "cheap flights hotel deals booking discount"),
         (3, "flights booking discount cheap hotel")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.affinity_ppm
        for r in tx.dsir_affinity(corpus, target).collect()
    }
    assert got[1] > got[2] and got[1] > got[3]
    # target-disjoint docs score negative (their buckets are raw-only)
    assert got[2] < 0 and got[3] < 0


def test_stats_drift_detects_schema_null_and_envelope_changes(spark):
    before = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30)],
        "id long, name string, v long",
    )
    after = spark.createDataFrame(
        [(4, None, 10, 1.0), (5, None, 99, 2.0), (6, None, 20, 3.0)],
        "id long, name string, v long, score double",
    )
    b = tx.column_stats(before, ["name", "v"])
    a = tx.column_stats(after, ["name", "v", "score"])
    got = {r.column_name: r for r in tx.stats_drift(b, a).collect()}
    assert got["score"].verdict == "schema"       # appeared
    assert got["name"].verdict == "drift"         # nulls 1/3 -> 3/3
    assert got["name"].null_delta_ppm == 1000000 - 333333
    assert got["v"].verdict == "drift"            # max 30 -> 99
    assert got["v"].envelope_moved


def test_containment_catches_quote_that_jaccard_misses(spark):
    """A short quote inside a long document: Jaccard far below any
    dedup threshold, containment(quote in doc) = 1.0."""
    long_text = " ".join(f"tok{i}" for i in range(60))
    quote = " ".join(f"tok{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, long_text), (2, quote),
         (3, "completely disjoint vocabulary here entirely")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r
        for r in dd.containment_pairs(df, threshold=0.8, bands=32).collect()
    }
    assert (1, 2) in got, "quote pair not surfaced"
    r = got[(1, 2)]
    assert r.containment_b_in_a == 1.0
    assert r.jaccard < 0.2, "fixture failed to make Jaccard small"
    # symmetric dedup at the same threshold misses it
    sym = dd.minhash_dedup(df, threshold=0.8)
    assert not any(
        (p.doc_a, p.doc_b) == (1, 2) for p in sym.collect()
    )
    assert (1, 3) not in got and (2, 3) not in got


def test_cluster_density_separates_clique_from_chain(spark):
    """A 4-clique scores density 1e6 with 4 triangles; a 4-chain scores
    500000 with none — the structural signal that stops canonical
    election from collapsing threshold artifacts."""
    clique = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(10, 11), (11, 12), (12, 13)]
    pairs = spark.createDataFrame(
        clique + chain, "doc_a long, doc_b long"
    )
    verts = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 12, 13]], "doc_id long"
    )
    labels = dd.connected_components(verts, pairs)
    got = {r.component_id: r
           for r in dd.graph_cluster_stats(pairs, labels).collect()}
    assert got[1].n_vertices == 4 and got[1].n_edges == 6
    assert got[1].n_triangles == 4 and got[1].density_ppm == 1000000
    assert got[10].n_vertices == 4 and got[10].n_edges == 3
    assert got[10].n_triangles == 0 and got[10].density_ppm == 500000


def test_cluster_density_triangle_count_on_skewed_degrees(spark):
    """Pins the degree-oriented wedge join on graphs the plain a<b
    ordering mishandles: a hub-and-rim wheel (hub degree 4, rim degree
    3 — every hub edge must orient rim->hub regardless of id order) and
    a diamond (K4 minus an edge — mixed degrees 2/3, two triangles
    sharing an edge, each counted exactly once)."""
    # Wheel W4: hub=9 (highest id, highest degree), rim cycle 1-2-3-4.
    wheel = [(9, 1), (9, 2), (9, 3), (9, 4),
             (1, 2), (2, 3), (3, 4), (1, 4)]
    # Diamond: 20-21-22-23 with chord (21, 22); triangles
    # {20,21,22} and {21,22,23}.
    diamond = [(20, 21), (20, 22), (21, 22), (21, 23), (22, 23)]
    pairs = spark.createDataFrame(
        wheel + diamond, "doc_a long, doc_b long"
    )
    verts = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 9, 20, 21, 22, 23]], "doc_id long"
    )
    labels = dd.connected_components(verts, pairs)
    got = {r.component_id: r
           for r in dd.graph_cluster_stats(pairs, labels).collect()}
    wheel_cid = labels.filter("doc_id = 9").collect()[0].component_id
    diamond_cid = labels.filter("doc_id = 20").collect()[0].component_id
    assert got[wheel_cid].n_vertices == 5
    assert got[wheel_cid].n_edges == 8
    assert got[wheel_cid].n_triangles == 4
    assert got[diamond_cid].n_vertices == 4
    assert got[diamond_cid].n_edges == 5
    assert got[diamond_cid].n_triangles == 2


def test_bpe_train_batched_matches_sequential(spark):
    """batch_k > 1 accepts only symbol-disjoint candidates per round, so
    the merge list (pairs AND counts) matches one-at-a-time training on
    corpora without within-round new-pair promotion. Two-symbol words
    merge to a single symbol and can never mint a promoted pair, so
    equality here is exact for every k. Fewer driver rounds is the
    whole point: ceil(n/k) snapshots instead of n."""
    texts = [" ".join(["ab"] * 9 + ["cd"] * 7 + ["ef"] * 5 + ["gh"] * 3)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    seq = tx.bpe_train(df, n_merges=4)
    assert seq == [("a", "b", 9), ("c", "d", 7), ("e", "f", 5),
                   ("g", "h", 3)]
    for k in (2, 3, 4):
        batched = tx.bpe_train(df, n_merges=4, batch_k=k)
        assert batched == seq, f"batch_k={k}: {batched} != {seq}"


def test_bpe_train_batched_divergence_is_bounded_rank_swap(spark):
    """The ONE way batching diverges from sequential training: a pair
    minted by an earlier merge in the same round (('t','he') after
    ('h','e')) is invisible until the next snapshot, so its merge lands
    a few positions later. The merge SET over the window is identical
    and every count is the true sequential count — assert exactly
    that."""
    texts = [
        "the theme of the thesis is these themes",
        "there the theory goes thence",
        "banana bandana and an anthem",
        "quick brown foxes jump over lazy dogs daily",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    seq = tx.bpe_train(df, n_merges=8)
    batched = tx.bpe_train(df, n_merges=8, batch_k=2)
    assert set(batched) == set(seq)  # same merges, same counts
    assert batched != seq            # ('t','he') demoted one rank
    # the swapped-in pair names a symbol created in its round
    moved = [m for m, s in zip(batched, seq) if m != s]
    assert any(len(l) > 1 or len(r) > 1 for l, r, _ in moved)


def test_bpe_train_batched_skips_conflicting_candidates(spark):
    """A candidate sharing a symbol with an earlier accepted merge in
    the same round must wait for the next snapshot (its count changed);
    the guard keeps every returned count exactly the sequential count."""
    # 'aa' dominates; ('a','a') and then ('aa','a')-style chains force
    # symbol conflicts inside a round
    texts = ["aaaa aaaa aaa aa", "aaab aab ab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    seq = tx.bpe_train(df, n_merges=5)
    batched = tx.bpe_train(df, n_merges=5, batch_k=3)
    # chained merges serialize: batched equals sequential here too, and
    # every accepted pair carries its true (sequential) count
    assert batched == seq, f"{batched} != {seq}"


def test_gopher_filters_rules_discriminate(spark):
    """Each published Gopher rule must fire on the construction built to
    violate it and pass on a clean document."""
    clean = (
        "the results of this study show that scientists have found "
        "strong evidence to be consistent with the standard model and "
        "that further work with larger samples would help " * 3
    )
    rows = [
        (1, clean),
        (2, "short stub"),                                  # word count
        (3, " ".join(["a"] * 60)),                          # mean len < 3
        (4, clean + " " + "## " * 30),                      # symbol ratio
        (5, "\n".join(["- item " + str(i) for i in range(10)])),  # bullets
        (6, "\n".join(["tail..." for _ in range(10)])),     # ellipses
        (7, " ".join(["123"] * 60)),                        # alpha words
        (8, " ".join(["zorp"] * 60)),                       # stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in tx.gopher_quality_filters(df).collect()}
    assert got[1].pass_gopher
    assert not got[2].pass_word_count
    assert not got[3].pass_mean_word_len
    assert not got[4].pass_symbol_ratio
    assert not got[5].pass_bullet_lines
    assert not got[6].pass_ellipsis_lines
    assert not got[7].pass_alpha_words
    assert not got[8].pass_stopwords
    assert all(not got[i].pass_gopher for i in range(2, 9))
    # empty text: every ratio defined, nothing passes, nothing NULL
    e = tx.gopher_quality_filters(
        spark.createDataFrame([(9, "")], "doc_id long, text string")
    ).collect()[0]
    assert e.n_words == 0 and e.pass_gopher is False
    assert e.symbol_word_ratio == 0.0 and e.alpha_word_ratio == 0.0


def test_c4_line_filter_rules(spark):
    """Each C4 rule fires exactly: terminal punctuation, >= 3 words,
    javascript lines; page flags for braces / lorem ipsum / sentence
    count."""
    good = ("One full sentence right here. Two full sentences now."
            "\nThree sentences present today. Four sentences written down."
            "\nFive sentences to finish off.")
    rows = [
        (1, good),
        (2, good + "\nno terminal punctuation"),
        (3, good + "\nShort one."),
        (4, good + "\nPlease enable JavaScript to continue reading."),
        (5, good + "\nThe code if (x) { stop; } stays inline."),
        (6, good + "\nLorem Ipsum dolor sit amet today."),
        (7, "Only two sentences here. Not enough of them."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in tx.c4_line_filter(df).collect()}
    assert got[1].keep_doc and got[1].n_removed == 0
    assert got[2].n_removed == 1 and got[2].clean_text == good
    assert got[3].n_removed == 1          # < 3 words
    assert got[4].n_removed == 1          # javascript line
    assert got[5].has_brace and not got[5].keep_doc
    assert got[6].has_lorem and not got[6].keep_doc
    assert got[7].n_sentences == 2 and not got[7].keep_doc


def test_phrase_search_adjacency_and_counts(spark):
    """Phrase matches require adjacency IN ORDER: 'big data' must not
    match 'data big' or 'big fast data'; overlapping repeats count per
    anchor position ('ha ha ha' holds 'ha ha' twice)."""
    df = spark.createDataFrame(
        [
            (1, "big data systems move big data fast"),
            (2, "data big is not the phrase"),
            (3, "big fast data inserts a gap"),
            (4, "ha ha ha"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.phrase, r.doc_id): (r.n_matches, r.first_pos)
        for r in tx.phrase_search(df, ["big data", "ha ha"]).collect()
    }
    assert got == {
        ("big data", 1): (2, 0),
        ("ha ha", 4): (2, 0),
    }


def test_proximity_search_window_and_counts(spark):
    """NEAR/2 must accept pairs at distance <= 2 in either order,
    reject wider gaps, and count every in-band position pair."""
    df = spark.createDataFrame(
        [
            (1, "alpha x beta"),            # dist 2 -> match
            (2, "beta alpha"),              # reverse order, dist 1
            (3, "alpha x y z beta"),        # dist 4 -> no match
            (4, "alpha beta alpha"),        # pairs: (0,1), (2,1)
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_cooccurrences, r.min_distance)
        for r in tx.proximity_search(
            df, "alpha", "beta", window=2
        ).collect()
    }
    assert got == {1: (1, 2), 2: (1, 1), 4: (2, 1)}


def test_pack_loss_mask_spans_layout(spark):
    # Two shards; doc 2 is an exact duplicate of doc 1 (mask 0). With
    # seq_len=4, shard A's stream is 6+6+3 = 15 tokens: doc 1 spans
    # bins 0-1, doc 2 spans bins 1-2, doc 3 sits inside bin 3.
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f", "A", 1),
            (2, "a b c d e f", "A", 0),
            (3, "x y z", "A", 1),
            (4, "p q r s t", "B", 1),
            (5, "", "B", 1),  # zero tokens -> no span rows
        ],
        "doc_id long, text string, source string, keep long",
    )
    out = tx.pack_loss_mask_spans(docs, 4, mask_col="keep")
    rows = {
        (r["doc_id"], r["bin_id"]): (
            r["span_start"], r["span_len"], r["loss_mask"], r["shard"]
        )
        for r in out.collect()
    }
    assert rows[(1, 0)] == (0, 4, 1, "A")
    assert rows[(1, 1)] == (0, 2, 1, "A")
    assert rows[(2, 1)] == (2, 2, 0, "A")
    assert rows[(2, 2)] == (0, 4, 0, "A")
    assert rows[(3, 3)] == (0, 3, 1, "A")
    assert rows[(4, 0)] == (0, 4, 1, "B")
    assert rows[(4, 1)] == (0, 1, 1, "B")
    assert not any(d == 5 for d, _ in rows)
    # spans tile each document exactly: per-doc span_len sums = n_tokens
    sums = {
        r["doc_id"]: r["s"]
        for r in out.groupBy("doc_id")
        .agg(F.sum("span_len").alias("s"))
        .collect()
    }
    assert sums == {1: 6, 2: 6, 3: 3, 4: 5}
    # every span fits inside its bin
    bad = out.filter(
        (F.col("span_start") < 0)
        | (F.col("span_len") <= 0)
        | (F.col("span_start") + F.col("span_len") > 4)
    ).count()
    assert bad == 0
