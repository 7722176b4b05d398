"""Unit tests for the round-5 enrichment operators: integer-ppb
PageRank (hand-computed recurrence, dangling mass, cycle fixpoint),
blocked fuzzy matching (+ hot-block guard), k-anonymity, BM25 top-k
(distributed-top-k plan shape) and Heaps vocabulary growth (bucketed
prefix sum == single-bucket reference)."""

from __future__ import annotations

from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.operators import graph as g
from _event_intelligence_data_warehouse_spark.operators import text as tx
from _event_intelligence_data_warehouse_spark.operators import validate as vl

PPB = 1_000_000_000


def _pagerank_ref(edges, iters, damp):
    """Independent pure-Python replay of the integer recurrence."""
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {v: PPB // n for v in nodes}
    teleport = (100 - damp) * PPB // 100 // n
    for _ in range(iters):
        dang = sum(rank[v] for v in nodes if v not in out) // n
        in_sum = {v: 0 for v in nodes}
        for s, d in edges:
            in_sum[d] += rank[s] // out[s]
        rank = {
            v: teleport + damp * (in_sum[v] + dang) // 100 for v in nodes
        }
    return rank


def test_pagerank_chain_with_dangling_matches_reference(spark):
    # 1 -> 2 -> 3, 3 dangling: its whole mass redistributes each round.
    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node_id: r.rank_ppb
        for r in g.pagerank(df, iterations=4, damping_pct=85).collect()
    }
    assert got == _pagerank_ref(edges, 4, 85)
    # mass is conserved up to deterministic flooring leakage
    assert 0 < sum(got.values()) <= PPB


def test_pagerank_cycle_is_uniform_fixpoint(spark):
    edges = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node_id: r.rank_ppb
        for r in g.pagerank(df, iterations=3, damping_pct=85).collect()
    }
    # symmetric cycle: every node keeps the uniform rank exactly
    assert len(set(got.values())) == 1
    assert got[1] == _pagerank_ref(edges, 3, 85)[1]


def test_pagerank_explicit_isolated_vertex(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    verts = spark.createDataFrame([(1,), (2,), (9,)], "node_id long")
    got = {
        r.node_id: r.rank_ppb
        for r in g.pagerank(
            edges, vertices=verts, iterations=2, damping_pct=85
        ).collect()
    }
    ref = _pagerank_ref([(1, 2)] + [(9, 9)], 0, 85)  # just for node set
    assert set(got) == {1, 2, 9}
    # isolated vertex 9 is dangling: gets teleport + damped dangling share
    assert got[9] > 0


def test_fuzzy_blocked_pairs_and_hot_block_guard(spark):
    rows = [
        (1, "small ring"),
        (2, "red ring"),
        (3, "small gear"),
        (4, "huge widget"),
        (5, "smal ring"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = g.fuzzy_blocked_pairs(
        df, id_col="id", name_col="name", max_distance=4
    ).collect()
    got = {(r.id_a, r.id_b): r.distance for r in pairs}
    # within the "ring" block: 1-5 dist 1, 2-5 dist 4; 1-2 is dist 5 (cut)
    assert got == {(1, 5): 1, (2, 5): 4}
    # hot-block guard: cap of 2 drops the 3-member "ring" block entirely
    capped = g.fuzzy_blocked_pairs(
        df, id_col="id", name_col="name", max_distance=4, max_block_size=2
    ).collect()
    assert capped == []
    hot = g.fuzzy_hot_blocks(df, name_col="name", max_block_size=2).collect()
    assert [(r.bkey, r.block_size) for r in hot] == [("ring", 3)]


def test_k_anonymity_classes_and_risk(spark):
    rows = [
        ("US", "A"), ("US", "A"), ("US", "A"),
        ("DE", "B"), ("DE", "B"),
        ("FR", "C"),
    ]
    df = spark.createDataFrame(rows, "nation string, seg string")
    got = {
        (r.nation, r.seg): (r.group_size, r.is_k_anonymous, r.risk_ppm)
        for r in vl.k_anonymity(df, ["nation", "seg"], k=2).collect()
    }
    assert got == {
        ("US", "A"): (3, True, 333333),
        ("DE", "B"): (2, True, 500000),
        ("FR", "C"): (1, False, 1000000),
    }


def test_bm25_topk_prefers_higher_tf_and_bounds_k(spark):
    rows = [
        (1, "spark spark spark filler filler"),
        (2, "spark filler filler filler filler"),
        (3, "filler filler filler filler filler"),
        (4, "spark spark filler filler filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tx.bm25_topk(df, ["spark"], k=2)
    rows_out = out.collect()
    assert [r.doc_id for r in sorted(rows_out, key=lambda r: r.rank)] == [1, 4]
    assert all(r.matched_terms == 1 for r in rows_out)
    # plan shape: the top-k is a distributed TakeOrderedAndProject, not a
    # single-partition global window over the corpus
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_vocab_growth_bucketing_invariant(spark):
    rows = [
        (1, "a b c"),
        (2, "a b d"),
        (3, ""),
        (4, "d e f g"),
        (7, "a h"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    small = {
        r.doc_id: (r.n_tokens, r.new_terms, r.cum_tokens, r.vocab_size)
        for r in tx.vocab_growth(df, bucket_width=2).collect()
    }
    one = {
        r.doc_id: (r.n_tokens, r.new_terms, r.cum_tokens, r.vocab_size)
        for r in tx.vocab_growth(df, bucket_width=1_000_000).collect()
    }
    assert small == one
    assert small[1] == (3, 3, 3, 3)
    assert small[2] == (3, 1, 6, 4)   # only "d" is new
    assert small[3] == (0, 0, 6, 4)   # empty doc holds the curve flat
    assert small[4] == (4, 3, 10, 7)  # e f g new (d seen)
    assert small[7] == (2, 1, 12, 8)  # h new


def test_dhash_matches_python_reference(spark):
    import hashlib

    from _event_intelligence_data_warehouse_spark.operators import (
        multimodal as mm,
    )

    media = mm.synthetic_media(spark, 8)
    got = {r.media_id: r.dhash for r in
           mm.dhash_images(media, fake=True).collect()}

    def ref(i):
        digest = hashlib.md5(f"media{i}".encode()).digest()
        payload = (digest * 64)[: 512 + (i % 7) * 64][:61]
        return sum(
            (1 << j) for j in range(60) if payload[j] < payload[j + 1]
        )

    assert got == {i: ref(i) for i in range(8)}
    assert all(0 <= h < (1 << 60) for h in got.values())


def test_phash_near_dups_recall_complete_within_pigeonhole(spark):
    from _event_intelligence_data_warehouse_spark.operators import (
        multimodal as mm,
    )

    # base hash + variants with 1, 3 and 5 deterministic bit flips:
    # <= n_bands-1 flips MUST be found; 5 flips may or may not be.
    h0 = 0x0123456789ABCDE
    rows = [
        (0, h0),
        (1, h0 ^ (1 << 2)),                            # 1 flip
        (2, h0 ^ (1 << 3) ^ (1 << 20) ^ (1 << 50)),    # 3 flips, 3 bands
    ]
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    pairs = {
        (r.media_id_a, r.media_id_b): r.hamming
        for r in mm.phash_near_dups(df, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 1
    assert pairs[(0, 2)] == 3
    assert (1, 2) not in pairs  # 4 flips apart > 3 -> excluded
    assert all(v <= 3 for v in pairs.values())


def test_phash_planted_corpus_groups(spark):
    from _event_intelligence_data_warehouse_spark.operators import (
        multimodal as mm,
    )

    media = mm.synthetic_media_near_dups(spark, 8)
    hashes = mm.dhash_images(media, fake=True)
    pairs = mm.phash_near_dups(hashes, max_hamming=3).collect()
    groups = {(r.media_id_a % 8, r.media_id_b % 8) for r in pairs}
    # every surviving pair links two variants of the SAME base image
    assert groups == {(i, i) for i in range(8)}
    # and every base contributes its full triangle (copy + near-miss)
    per_base = {}
    for r in pairs:
        per_base.setdefault(r.media_id_a % 8, 0)
        per_base[r.media_id_a % 8] += 1
    assert all(v == 3 for v in per_base.values())


def test_pagerank_warm_start_composes_with_cold_run(spark):
    # k cold iterations then j warm iterations on the SAME graph must
    # equal k+j cold iterations — the recurrence is memoryless beyond
    # the rank vector, so warm-starting is exact, not approximate.
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    stored = g.pagerank(df, iterations=2, damping_pct=85)
    warm = {
        r.node_id: r.rank_ppb
        for r in g.pagerank(
            df, iterations=3, damping_pct=85, start_ranks=stored
        ).collect()
    }
    cold = {
        r.node_id: r.rank_ppb
        for r in g.pagerank(df, iterations=5, damping_pct=85).collect()
    }
    assert warm == cold


def test_pagerank_warm_start_new_nodes_get_uniform_share(spark):
    base = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    stored = g.pagerank(base, iterations=2, damping_pct=85)
    grown = spark.createDataFrame(
        [(1, 2), (2, 1), (5, 1)], "src long, dst long"
    )
    got = {
        r.node_id: r.rank_ppb
        for r in g.pagerank(
            grown, iterations=0, damping_pct=85, start_ranks=stored
        ).collect()
    }
    # zero iterations exposes the init: stored nodes keep their ranks,
    # the new node 5 starts at PPB // n of the GROWN vertex set
    prev = {r.node_id: r.rank_ppb for r in stored.collect()}
    assert got[1] == prev[1] and got[2] == prev[2]
    assert got[5] == PPB // 3


def test_mask_columns_policies(spark):
    import hashlib

    rows = [(1, "alice", 2345.67, "AB123456"), (2, None, -50.0, "X")]
    df = spark.createDataFrame(
        rows, "id long, name string, bal double, acct string"
    )
    out = {r.id: r for r in vl.mask_columns(df, {
        "name": ("hash",),
        "bal": ("band", 1000),
        "acct": ("keep_last", 2),
    }).collect()}
    assert out[1].name == hashlib.sha256(b"alice").hexdigest()
    assert out[1].bal == 2000 and out[2].bal == -1000  # floor, not trunc
    assert out[1].acct == "******56" and out[2].acct == "X"
    assert out[2].name is None  # hash of NULL stays NULL
    nulled = vl.mask_columns(df, {"name": ("null",)}).collect()
    assert all(r.name is None for r in nulled)


def test_bootstrap_weights_and_replicates(spark):
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as sp,
    )

    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), F.lit(100).alias("cents")
    )
    out = sp.bootstrap_mean_replicates(
        df, "k", F.col("cents"), n_replicates=8
    ).collect()
    assert len(out) == 8
    # constant values: every replicate's weighted mean is exactly 1.00
    # currency units = 1_000_000 micro
    assert all(r.mean_micro == 1_000_000 for r in out)
    # weights behave like Poisson(1): effective n within 20% of n
    assert all(1600 <= r.n_eff <= 2400 for r in out)
    # determinism across runs
    again = sp.bootstrap_mean_replicates(
        df, "k", F.col("cents"), n_replicates=8
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_khop_matches_python_bfs(spark):
    import random

    from _event_intelligence_data_warehouse_spark.operators.graph import (
        khop_min_hops,
    )

    rng = random.Random(7)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    seeds = [0, 1, 2]
    k = 3
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    want = {s: 0 for s in seeds}
    frontier = set(seeds)
    for hop in range(1, k + 1):
        nxt = {
            d
            for s in frontier
            for d in adj.get(s, [])
            if d not in want
        }
        for d in nxt:
            want[d] = hop
        frontier = nxt
    e_df = spark.createDataFrame(edges, "src bigint, dst bigint")
    s_df = spark.createDataFrame([(s,) for s in seeds], "node_id bigint")
    got = {
        r.node_id: r.hops for r in khop_min_hops(e_df, s_df, k).collect()
    }
    assert got == want


def test_chi2_keywords_matches_float_formula(spark):
    from _event_intelligence_data_warehouse_spark.contract import QUERIES, load

    SF = "/root/testdata/sf0.01"
    rows = QUERIES["text_keyword_chi2"](spark, SF).collect()
    assert rows, "no keywords extracted"
    docs = load(spark, SF, "documents")
    nn = docs.count()
    from pyspark.sql import functions as F

    ns = {
        r.source: r.cnt
        for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    for r in rows[:20]:
        a, b = r.df_in_group, r.df_elsewhere
        c = ns[r.source] - a
        d = nn - ns[r.source] - b
        chi2 = (
            nn * (a * d - b * c) ** 2
            / ((a + b) * (c + d) * (a + c) * (b + d))
        )
        got = r.chi2_ppm / 1e6
        # two integer floor-divisions in the fixed evaluation order:
        # the first floors q = (ad-bc)^2/((a+b)(c+d)), costing up to
        # 1/q relative — a few percent for weakly-associated terms.
        assert abs(got - chi2) <= 0.05 * max(chi2, 1.0) + 0.1, (
            r.term, got, chi2,
        )
        assert a * d > b * c, "non-positive association leaked through"


def test_pmi_ratio_consistent_with_counts(spark):
    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    SF = "/root/testdata/sf0.01"
    rows = QUERIES["text_pmi_collocations"](spark, SF).collect()
    assert 0 < len(rows) <= 50
    assert all(r.n12 >= 5 for r in rows)
    ppms = [r.pmi_ratio_ppm for r in rows]
    assert ppms == sorted(ppms, reverse=True)


def test_fellegi_sunter_score_decomposition(spark):
    from _event_intelligence_data_warehouse_spark.contract import QUERIES
    from _event_intelligence_data_warehouse_spark.operators.graph import (
        FS_MATCH_MILLI,
        FS_WEIGHTS_MILLI,
    )

    SF = "/root/testdata/sf0.01"
    rows = QUERIES["linkage_fellegi_sunter"](spark, SF).collect()
    assert rows
    for r in rows[:200]:
        want = 0
        for flag, field in (
            (r.name_agree, "name"),
            (r.nation_agree, "nation"),
            (r.segment_agree, "segment"),
            (r.band_agree, "balband"),
        ):
            wa, wd = FS_WEIGHTS_MILLI[field]
            want += wa if flag else wd
        assert r.score_milli == want
        assert r.decision == (
            "match" if want >= FS_MATCH_MILLI else "possible"
        )
        assert want >= 0, "emitted region must exclude non-matches"


def test_rolling_wau_brute_force(spark):
    from _event_intelligence_data_warehouse_spark.contract import QUERIES, load

    SF = "/root/testdata/sf0.01"
    got = {
        r.day: (r.wau, r.dau, r.stickiness_ppm)
        for r in QUERIES["analytics_rolling_wau"](spark, SF).collect()
    }
    from pyspark.sql import functions as F

    act = (
        load(spark, SF, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .collect()
    )
    by_day: dict = {}
    for r in act:
        by_day.setdefault(r.d, set()).add(r.user_id)
    days = sorted(by_day)
    import datetime

    for day in days:
        week = set()
        for off in range(7):
            week |= by_day.get(day - datetime.timedelta(days=off), set())
        dau = len(by_day[day])
        assert got[day] == (len(week), dau, dau * 1_000_000 // len(week))


def test_kcore_peel_cascades_chain_into_surviving_cycle(spark):
    """Lollipop graph (triangle 1-2-3 plus tail 3-4-5-6-7), k=2: the
    tail dissolves one endpoint per round (7, then 6, then 5, then 4 —
    four cascading rounds, the behavior a plain degree filter lacks);
    the triangle survives with in-core degree 2 everywhere."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 7)],
        "a long, b long",
    )
    got = {r.node_id: r.degree
           for r in g.kcore_peel(edges, k=2, max_rounds=6).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_peel_round_bound_is_the_contract(spark):
    """max_rounds=2 on the same lollipop returns the 2-round
    approximant exactly: vertices 7 and 6 are peeled, the rest of the
    tail (with its sub-k fringe degrees) remains — the documented
    fixed-round portability contract, not a convergence promise."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 7)],
        "a long, b long",
    )
    got = {r.node_id: r.degree
           for r in g.kcore_peel(edges, k=2, max_rounds=2).collect()}
    assert got == {1: 2, 2: 2, 3: 3, 4: 2, 5: 1}


def test_kcore_peel_k3_keeps_only_the_clique(spark):
    """K4 plus a pendant triangle at one corner, k=3: the triangle
    (degree 2) peels away, K4 survives with degree 3; self-loops and
    duplicate/reversed edges are dropped before peeling."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    extra = [(4, 5), (4, 6), (5, 6), (5, 5), (2, 1)]
    edges = spark.createDataFrame(k4 + extra, "a long, b long")
    got = {r.node_id: r.degree
           for r in g.kcore_peel(edges, k=3, max_rounds=6).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
