"""Round-9 mechanism pins: the rank_cells packed-vs-window dual path
and the global_line_dedup literal-separator contract (r8 ADVICE)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _vectors(spark, n=40, dim=6):
    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def _centroids(spark, k=5, dim=6):
    rows = [
        (c, [float((c * 5 + j) % 7) - 3.0 for j in range(dim)])
        for c in range(k)
    ]
    return spark.createDataFrame(rows, "cell int, centroid array<double>")


def test_rank_cells_window_path_identical(spark):
    """The >RANK_CELLS_PACKED_MAX_CELLS fallback (crossJoin + window)
    must be value- AND order-identical to the packed projection,
    including cosine ties (duplicate centroids) resolved by cell ASC."""
    from _event_intelligence_data_warehouse_spark.operators import (
        similarity as sim,
    )

    v = _vectors(spark)
    # duplicate centroid 0 as cell 4 -> guaranteed cell_sim tie
    c = _centroids(spark, k=4)
    c = c.unionByName(
        c.filter(F.col("cell") == 0).select(
            F.lit(4).cast("int").alias("cell"), "centroid"
        )
    )
    packed = {
        (r.vec_id, r.cell_rank): (r.cell, r.cell_sim)
        for r in sim.rank_cells(v, c).collect()
    }
    windowed = {
        (r.vec_id, r.cell_rank): (r.cell, r.cell_sim)
        for r in sim._rank_cells_window(v, c).collect()
    }
    assert packed == windowed
    # tie actually exercised: for every vector, duplicate cells 0 and 4
    # have equal sims, with the tie broken cell-ASC (0 before 4)
    by_vec = {}
    for (vid, rk), (cell, s) in packed.items():
        by_vec.setdefault(vid, {})[cell] = (rk, s)
    for vid, cells in by_vec.items():
        r0, s0 = cells[0]
        r4, s4 = cells[4]
        assert s0 == s4 and r0 < r4, (vid, cells)


def test_rank_cells_cap_routes_to_window(spark, monkeypatch):
    """Above the packed cap rank_cells must route to the window
    formulation (no single-row model collect) and still agree."""
    from _event_intelligence_data_warehouse_spark.operators import (
        similarity as sim,
    )

    v = _vectors(spark, n=10)
    c = _centroids(spark, k=5)
    monkeypatch.setattr(sim, "RANK_CELLS_PACKED_MAX_CELLS", 3)
    routed = sim.rank_cells(v, c)
    assert "row_number" in routed._jdf.queryExecution().analyzed().toString()
    got = {(r.vec_id, r.cell_rank): r.cell for r in routed.collect()}
    monkeypatch.setattr(sim, "RANK_CELLS_PACKED_MAX_CELLS", 4096)
    want = {
        (r.vec_id, r.cell_rank): r.cell
        for r in sim.rank_cells(v, c).collect()
    }
    assert got == want


def test_global_line_dedup_literal_separator(spark):
    """sep is documented as a LITERAL: a regex-metacharacter separator
    ('.') must split on dots only, and the md5 reconstruction must
    match a hand rebuild of the surviving segments."""
    import hashlib

    from _event_intelligence_data_warehouse_spark.operators import (
        dedup as dd,
    )

    docs = spark.createDataFrame(
        [(1, "aa.bb.cc"), (2, "bb.dd")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dd.global_line_dedup(docs, sep=".").collect()
    }
    # doc 1 keeps all three segments; doc 2 loses 'bb' (first seen in
    # doc 1) and keeps 'dd'
    assert out[1].n_lines_kept == 3
    assert out[2].n_lines_kept == 1
    assert out[1].rebuilt_md5 == hashlib.md5(b"aa.bb.cc").hexdigest()
    assert out[2].rebuilt_md5 == hashlib.md5(b"dd").hexdigest()


# ---------------------------------------------------------------------------
# Round-9 additions: Apriori, link prediction, DBSCAN, ROUGE, frame sampling
# ---------------------------------------------------------------------------


def test_frequent_itemsets_matches_bruteforce(spark):
    """Level-wise Apriori == itertools enumeration on a crafted corpus
    with a NON-EMPTY level 3 and a genuinely pruned branch."""
    from itertools import combinations

    from _event_intelligence_data_warehouse_spark.operators import mining as mn

    baskets = {
        1: {"a", "b", "c"},
        2: {"a", "b", "c"},
        3: {"a", "b", "c", "d"},
        4: {"a", "b"},
        5: {"b", "c"},
        6: {"a", "c"},
        7: {"d", "e"},
        8: {"d", "e"},
        9: {"e", "f"},
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, ["basket_id", "item"])
    minsup = 2
    got = {
        (r.itemset, r.k): r.support
        for r in mn.frequent_itemsets(
            df, min_support=minsup, max_k=3
        ).collect()
    }
    expected = {}
    for k in (1, 2, 3):
        for combo in combinations(sorted({i for s in baskets.values() for i in s}), k):
            sup = sum(1 for s in baskets.values() if set(combo) <= s)
            if sup >= minsup:
                expected[("|".join(combo), k)] = sup
    assert got == expected
    # the crafted corpus really exercises level 3 and real pruning
    assert ("a|b|c", 3) in expected
    assert ("e", 1) in expected and ("e|f", 2) not in expected


def test_frequent_itemsets_max_k_one(spark):
    from _event_intelligence_data_warehouse_spark.operators import mining as mn

    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], ["basket_id", "item"]
    )
    out = mn.frequent_itemsets(df, min_support=2, max_k=1).collect()
    assert [(r.itemset, r.k, r.support) for r in out] == [("x", 1, 2)]


def test_common_neighbors_crafted(spark):
    """Wedge counting, degree product, edge exclusion, hub cap."""
    from _event_intelligence_data_warehouse_spark.operators import graph as g

    # path 1-2-3 plus hub 9 connected to 1,3,4 (degree 3)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (9, 1), (9, 3), (9, 4)], ["src", "dst"]
    )
    out = {
        (r.node_a, r.node_b): (r.common_neighbors, r.degree_product)
        for r in g.common_neighbors(edges).collect()
    }
    # 1-3 share neighbors {2, 9}; deg(1)=2, deg(3)=2
    assert out[(1, 3)] == (2, 4)
    # 1-4 share {9}; 3-4 share {9}; 2-9 share {1, 3}
    assert out[(1, 4)] == (1, 2) and out[(3, 4)] == (1, 2)
    assert out[(2, 9)] == (2, 6)
    # adjacent pairs never appear
    assert (1, 2) not in out and (9, 1) not in out
    # hub cap: with max_hub_degree=2, node 9 stops serving as middle
    capped = {
        (r.node_a, r.node_b): r.common_neighbors
        for r in g.common_neighbors(edges, max_hub_degree=2).collect()
    }
    assert capped == {(1, 3): 1, (2, 9): 2}


def test_common_neighbors_normalizes_direction(spark):
    from _event_intelligence_data_warehouse_spark.operators import graph as g

    # duplicate edge given in both directions + a self loop: one edge
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 2), (2, 3)], ["src", "dst"]
    )
    out = {(r.node_a, r.node_b): r.common_neighbors
           for r in g.common_neighbors(edges).collect()}
    assert out == {(1, 3): 1}


def _pure_dbscan(vecs: dict, eps_sim: float, min_pts: int):
    """Brute-force single-cell DBSCAN reference (cosine neighbors)."""
    import math

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    nbrs = {i: set() for i in vecs}
    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i < j and cos(vecs[i], vecs[j]) >= eps_sim:
                nbrs[i].add(j)
                nbrs[j].add(i)
    core = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    # components over core-core edges, labelled by min core id
    label = {i: i for i in core}
    changed = True
    while changed:
        changed = False
        for i in core:
            for j in nbrs[i]:
                if j in core and label[j] < label[i]:
                    label[i] = label[j]
                    changed = True
    out = {}
    for i in ids:
        if i in core:
            out[i] = ("core", label[i])
        else:
            adj = [label[j] for j in nbrs[i] if j in core]
            out[i] = ("border", min(adj)) if adj else ("noise", -1)
    return out


def test_dbscan_single_cell_matches_bruteforce(spark):
    """n_cells=1 turns the cell restriction off: dbscan_cells must equal
    the textbook DBSCAN on a corpus with planted density (two dense
    groups, one chain border, isolated noise)."""
    from _event_intelligence_data_warehouse_spark.operators import (
        similarity as sim,
    )

    base = {
        # dense cluster around +x (4 points: all cores at min_pts=3)
        0: [1.0, 0.0, 0.0, 0.0], 1: [0.999, 0.01, 0.0, 0.0],
        2: [0.998, 0.02, 0.0, 0.0], 3: [0.997, 0.03, 0.0, 0.0],
        # pair near +y: not enough for cores
        10: [0.0, 1.0, 0.0, 0.0], 11: [0.0, 0.999, 0.01, 0.0],
        # isolated
        20: [0.0, 0.0, 0.0, 1.0],
    }
    expected = _pure_dbscan(base, 0.99, 3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in base.items()],
        ["vec_id", "embedding"],
    )
    got = {
        r.vec_id: (r.role, r.cluster_id)
        for r in sim.dbscan_cells(
            df, eps_sim=0.99, min_pts=3, n_cells=1
        ).collect()
    }
    assert got == expected
    roles = {v[0] for v in got.values()}
    assert roles == {"core", "noise"}


def test_dbscan_border_attaches_to_min_cluster(spark):
    """A non-core point adjacent to cores of TWO clusters takes the
    smaller cluster id (deterministic election)."""
    from _event_intelligence_data_warehouse_spark.operators import (
        similarity as sim,
    )

    # two tight triangles (cores) + one bridge point near both, not core
    vecs = {
        0: [1.0, 0.0, 0.0], 1: [1.0, 0.001, 0.0], 2: [1.0, 0.002, 0.0],
        10: [0.0, 1.0, 0.0], 11: [0.0, 1.0, 0.001], 12: [0.0, 1.0, 0.002],
        5: [0.71, 0.704, 0.0],  # close-ish to both, neighbor of none
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        ["vec_id", "embedding"],
    )
    expected = _pure_dbscan(vecs, 0.999, 3)
    got = {
        r.vec_id: (r.role, r.cluster_id)
        for r in sim.dbscan_cells(
            df, eps_sim=0.999, min_pts=3, n_cells=1
        ).collect()
    }
    assert got == expected
    assert got[0] == ("core", 0) and got[10] == ("core", 10)


def test_rouge_recall_hand_computed(spark):
    from _event_intelligence_data_warehouse_spark.operators import text as tx

    corpus = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),       # bigrams cover bench 100
            (2, "the cat ran off"),              # shares 'the cat' only
            (3, "dogs bark loudly at night"),    # disjoint
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the cat sat on the mat")], ["doc_id", "text"]
    )
    out = {
        (r.doc_id, r.bench_id): (
            r.shared_ngrams, r.bench_ngrams, r.rouge_recall_ppm
        )
        for r in tx.rouge_recall(corpus, bench, n=2).collect()
    }
    # bench distinct bigrams: the cat / cat sat / sat on / on the /
    # the mat -> 5
    assert out[(1, 100)] == (5, 5, 1000000)
    assert out[(2, 100)] == (1, 5, 200000)
    assert (3, 100) not in out
    # threshold drops the weak pair
    strict = tx.rouge_recall(corpus, bench, n=2, min_recall_ppm=500000)
    assert [r.doc_id for r in strict.collect()] == [1]


def test_sample_frames_reference(spark):
    import hashlib

    from _event_intelligence_data_warehouse_spark.operators import (
        multimodal as mm,
    )

    video = mm.synthetic_video(spark, 3, frame_bytes=32)
    out = {
        (r.media_id, r.frame_no): (r.frame_hex, r.byte_sum)
        for r in mm.sample_frames_stride(video, every_k=4, frame_bytes=32).collect()
    }
    # media 0 has 24 frames -> sampled 0,4,...,20 (6 frames); media 1: 32
    assert sorted(f for m, f in out if m == 0) == [0, 4, 8, 12, 16, 20]
    assert sorted(f for m, f in out if m == 1) == [0, 4, 8, 12, 16, 20, 24, 28]
    for (m, f), (hx, bs) in out.items():
        raw = (hashlib.md5(f"video{m}:{f}:0".encode()).digest()
               + hashlib.md5(f"video{m}:{f}:1".encode()).digest())
        assert hx == raw.hex()
        assert bs == sum(raw)


def test_sample_frames_drops_trailing_partial(spark):
    from pyspark.sql import types as T

    from _event_intelligence_data_warehouse_spark.operators import (
        multimodal as mm,
    )

    # 70 bytes at frame_bytes=32 -> 2 whole frames, 6 trailing bytes gone
    df = spark.createDataFrame(
        [(7, "video", bytearray(range(70 % 256)) * 1, ("raw", 1, 1, None, 2))],
        mm.MEDIA_SCHEMA,
    )
    out = mm.sample_frames_stride(df, every_k=1, frame_bytes=32).collect()
    assert sorted(r.frame_no for r in out) == [0, 1]
    assert all(len(r.frame_hex) == 64 for r in out)


def test_clustering_coefficient_crafted(spark):
    from _event_intelligence_data_warehouse_spark.operators import graph as g

    # triangle 1-2-3 plus pendant 4 on node 1; isolated edge 8-9
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4), (8, 9)], ["src", "dst"]
    )
    out = {r.node_id: (r.degree, r.n_triangles, r.lcc_ppm)
           for r in g.clustering_coefficient(edges).collect()}
    assert out[2] == (2, 1, 1000000) and out[3] == (2, 1, 1000000)
    # node 1: deg 3, one triangle among its 3 neighbor pairs -> 1/3
    assert out[1] == (3, 1, 333333)
    assert out[4] == (1, 0, 0) and out[8] == (1, 0, 0)


def test_clustering_coefficient_hub_cap(spark):
    from _event_intelligence_data_warehouse_spark.operators import graph as g

    # star center 0 with 4 leaves + one leaf-leaf edge (triangle 0-1-2)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)], ["src", "dst"]
    )
    full = {r.node_id: r.n_triangles
            for r in g.clustering_coefficient(edges).collect()}
    assert full[0] == 1 and full[1] == 1
    # capping center degree at 3 removes node 0 as a wedge CENTER
    # (its own triangle count drops) but leaves 1-2's count intact,
    # since their wedges run through each other and node 0 as leaves
    capped = {r.node_id: r.n_triangles
              for r in g.clustering_coefficient(
                  edges, max_hub_degree=3).collect()}
    assert capped[0] == 0 and capped[1] == 1 and capped[2] == 1


def test_matryoshka_prefix_recall_bounds(spark):
    """Prefix-dim approx recall: perfect when the prefix carries all
    the signal, and always within [0, n_exact]."""
    from _event_intelligence_data_warehouse_spark.operators import (
        similarity as sim,
    )

    # 20 vectors whose LAST 48 dims are constant: the 16-dim prefix is
    # fully informative, so prefix top-k == full top-k.
    import random

    rnd = random.Random(9)
    rows = []
    for i in range(20):
        head = [rnd.uniform(-1, 1) for _ in range(16)]
        rows.append((i, [float(x) for x in head] + [0.25] * 48))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pre = df.selectExpr("vec_id", "slice(embedding, 1, 16) AS embedding")
    q = df.filter("vec_id < 5")
    qp = pre.filter("vec_id < 5")
    rec = sim.topk_recall(
        sim.brute_force_topk(df, q, k=3),
        sim.brute_force_topk(pre, qp, k=3),
    ).collect()
    assert len(rec) == 5
    for r in rec:
        assert 0 <= r.n_overlap <= r.n_exact
    # constant tail shifts all cosines monotonically? not exactly — but
    # the ORDER can differ between prefix and full when the tail adds a
    # shared component; assert instead on the fully-degenerate case:
    flat = spark.createDataFrame(
        [(i, [float((i >> b) & 1) for b in range(16)] + [0.0] * 48)
         for i in range(1, 21)],  # skip i=0: the all-zero vector has no cosine
        ["vec_id", "embedding"],
    )
    fpre = flat.selectExpr("vec_id", "slice(embedding, 1, 16) AS embedding")
    rec2 = sim.topk_recall(
        sim.brute_force_topk(flat, flat.filter("vec_id <= 5"), k=3),
        sim.brute_force_topk(fpre, fpre.filter("vec_id <= 5"), k=3),
    ).collect()
    assert all(r.n_overlap == r.n_exact and r.top1_match for r in rec2)


def test_curation_v6_stage_coupling(spark, tmp_path):
    """The v6 chain on a crafted corpus: the duplicate drops FIRST (so
    decontamination never sees it), the contaminated doc drops SECOND,
    and the packed offsets reflect both removals."""
    import os

    from _event_intelligence_data_warehouse_spark.contract import QUERIES

    rows = [
        # bench doc (id % 20 == 0)
        (0, "alpha beta gamma delta epsilon", "s1"),
        # wholesale contamination of the bench doc -> dropped by rouge
        (1, "alpha beta gamma delta epsilon zeta", "s1"),
        # clean doc
        (2, "one two three four five six", "s1"),
        # exact duplicate of 2 (different id) -> dropped by dedup
        (3, "one two three four five six", "s1"),
        # clean doc in another shard
        (4, "seven eight nine", "s2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    sf = str(tmp_path)
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    out = {r.doc_id: (r.shard, r.n_tokens, r.start_token, r.bin_id,
                      r.bin_offset)
           for r in QUERIES["curation_pipeline_v6"](spark, sf).collect()}
    # corpus adds +100000 copies of ids % 5 == 0 (0 -> 100000); dedup
    # keeps the originals; rouge drops 1 (6 shared bigrams / 4 bench
    # bigrams... recall = 4/4 = 100%); 3 is an exact dup of 2.
    assert set(out) == {0, 2, 4}
    assert out[0] == ("s1", 5, 0, 0, 0)
    assert out[2] == ("s1", 6, 5, 0, 5)   # packs AFTER doc 0 only
    assert out[4] == ("s2", 3, 0, 0, 0)
