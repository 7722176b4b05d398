"""Round-7 operator units: synchronous label propagation, mutual-kNN
graph construction, and exact-integer LTTB downsampling — hand-sized
fixtures with worked-out expected outputs (the contract queries pin the
same mechanisms against DuckDB oracles at SF scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.operators import graph as g
from _event_intelligence_data_warehouse_spark.operators import (
    similarity as sim,
)
from _event_intelligence_data_warehouse_spark.operators import (
    timeseries as ts,
)


def test_label_propagation_splits_bridged_triangles(spark):
    # two triangles joined by one bridge edge: CC would merge them into
    # one component; 3-round LPA keeps two communities
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src long, dst long",
    )
    got = {
        r.node_id: r.community
        for r in g.label_propagation(edges, iterations=3).collect()
    }
    assert len(got) == 6
    left = {got[1], got[2], got[3]}
    right = {got[4], got[5], got[6]}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_label_propagation_deterministic_and_fixed_rounds(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "src long, dst long"
    )
    a = sorted(map(tuple, g.label_propagation(edges, iterations=2).collect()))
    b = sorted(map(tuple, g.label_propagation(edges, iterations=2).collect()))
    assert a == b
    # 0 iterations = identity labels
    ident = g.label_propagation(edges, iterations=0)
    assert all(r.node_id == r.community for r in ident.collect())


def test_knn_graph_keeps_only_mutual_edges(spark):
    # two tight pairs plus one outlier that points at a pair member
    # without being pointed back at (k=1)
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),
            (3, [0.0, 1.0, 0.0]),
            (4, [0.01, 0.999, 0.0]),
            (5, [0.6, 0.55, 0.0]),  # nearest to 2, but 2's nearest is 1
        ],
        "vec_id long, embedding array<float>",
    )
    edges = {(r.vec_a, r.vec_b) for r in sim.knn_graph(vecs, k=1).collect()}
    assert edges == {(1, 2), (3, 4)}
    # non-mutual mode is the directed kNN list: the outlier's outbound
    # edge (5 -> 2) survives even though 2 never points back
    all_edges = {
        (r.vec_a, r.vec_b)
        for r in sim.knn_graph(vecs, k=1, mutual=False).collect()
    }
    assert (5, 2) in all_edges
    assert len(all_edges) == 5


def test_lttb_keeps_endpoints_and_spikes(spark):
    # flat series with one spike per half: LTTB must keep both spikes;
    # a bucket-mean downsample would flatten them
    rows = [(x, 10) for x in range(20)]
    rows[5] = (5, 100)
    rows[14] = (14, 90)
    df = spark.createDataFrame(rows, "x long, y long")
    out = ts.lttb_downsample(df, n_buckets=4)
    got = {r.x: (r.y, r.bucket) for r in out.collect()}
    assert got[0][1] == -1 and got[19][1] == 4      # endpoints kept
    assert 5 in got and got[5][0] == 100            # spike 1 kept
    assert 14 in got and got[14][0] == 90           # spike 2 kept
    assert len(got) == 6                            # 4 buckets + 2 ends


def test_lttb_tie_breaks_to_smaller_x(spark):
    # all-equal series: every area is 0, each bucket picks its smallest x
    df = spark.createDataFrame(
        [(x, 7) for x in range(10)], "x long, y long"
    )
    out = {r.bucket: r.x for r in ts.lttb_downsample(df, n_buckets=2).collect()}
    assert out[-1] == 0 and out[2] == 9
    interior = sorted(x for b, x in out.items() if b in (0, 1))
    assert interior == [1, 5]


def test_knn_graph_ranks_consistent_with_bruteforce(spark):
    import random

    random.seed(7)
    vecs = spark.createDataFrame(
        [
            (i, [random.uniform(-1, 1) for _ in range(8)])
            for i in range(30)
        ],
        "vec_id long, embedding array<float>",
    )
    topk = {
        (r.query_id, r.neighbor_id): r.rank
        for r in sim.brute_force_topk(vecs, vecs, 4).collect()
    }
    for r in sim.knn_graph(vecs, k=4).collect():
        assert topk[(r.vec_a, r.vec_b)] == r.rank_ab
        assert topk[(r.vec_b, r.vec_a)] == r.rank_ba


def test_ngram_jaccard_lsh_regime_subset_and_recall(spark):
    """Regime 3 of ngram_jaccard_pairs (dense universe + corpus past the
    all-pairs budget): LSH-prefiltered exact verify must emit a SUBSET
    of the exact all-pairs result with identical scores, and recall
    >= 90% on comfortably-above-threshold near-dups."""
    from _event_intelligence_data_warehouse_spark.operators import dedup as dd

    words = ["aba", "bab", "abc", "cab", "bca", "cba"]
    rows = []
    for i in range(120):
        base = " ".join(words[(i + j) % len(words)] for j in range(12))
        rows.append((i, base))
        if i % 3 == 0:
            # planted near-dup: one word swapped
            rows.append((i + 10_000, base.replace(words[i % 6], words[(i + 1) % 6], 1)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(
            df, n=3, threshold=0.6, dense_allpairs_max_docs=10**9
        ).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dd.ngram_jaccard_pairs(
            df, n=3, threshold=0.6, dense_allpairs_max_docs=10
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-12          # verify stays exact
    strong = {k for k, v in exact.items() if v >= 0.75}
    if strong:
        got = len(strong & set(lsh)) / len(strong)
        assert got >= 0.9, f"LSH recall {got:.2f} on planted near-dups"


def test_audio_vad_frames_and_islands(spark):
    """Frame energies are exact int64 over payload bytes; island
    segmentation collapses contiguous active frames and splits on
    gaps."""
    import hashlib

    import numpy as np

    from _event_intelligence_data_warehouse_spark.operators import (
        multimodal as mm,
    )

    audio = mm.synthetic_audio(spark, 8)
    frames = {
        (r.media_id, r.frame_no): r.energy
        for r in mm.audio_frame_energies(audio, frame_bytes=16).collect()
    }
    # recompute one media's energies in pure python
    for i in (0, 5):
        chunks = 8 + i % 5
        payload = b"".join(
            hashlib.md5(f"audio{i}:{k}".encode()).digest()
            for k in range(chunks)
        )
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
        for k in range(chunks):
            e = int(((arr[16 * k:16 * (k + 1)] - 128) ** 2).sum())
            assert frames[(i, k)] == e
    # hand-built island fixture
    fr = spark.createDataFrame(
        [(1, 0, 100), (1, 1, 100), (1, 2, 1), (1, 3, 100),
         (2, 0, 1), (2, 1, 1)],
        "media_id long, frame_no long, energy long",
    )
    segs = {
        (r.media_id, r.seg_start, r.seg_end): (r.n_frames, r.energy_sum)
        for r in mm.vad_segments(fr, threshold=50).collect()
    }
    assert segs == {(1, 0, 1): (2, 200), (1, 3, 3): (1, 100)}


def test_knn_graph_ivf_regime_recall(spark):
    """Above exact_max_vectors knn_graph switches to IVF-bounded
    candidates: edges must be a subset of... NOT generally of the exact
    graph (a rank can shift when a true neighbor sits outside probed
    cells), but on a clusterable corpus recall of the exact mutual
    edges stays high. Pin >= 80% with modest probing."""
    import random

    random.seed(11)
    centers = [[1.0 if d == c else 0.0 for d in range(8)] for c in range(4)]
    rows = []
    for i in range(240):
        c = centers[i % 4]
        rows.append(
            (i, [x + random.uniform(-0.15, 0.15) for x in c])
        )
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.vec_a, r.vec_b)
        for r in sim.knn_graph(vecs, k=4, exact_max_vectors=10**6).collect()
    }
    approx = {
        (r.vec_a, r.vec_b)
        for r in sim.knn_graph(
            vecs, k=4, exact_max_vectors=10, n_cells=4, nprobe=2
        ).collect()
    }
    assert exact, "fixture produced no mutual edges"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF-regime mutual-kNN recall {recall:.2f}"


def test_semantic_dedup_sqrtn_regime_planted_recall(spark):
    """Above fixed_cells_max_vectors semantic_dedup sizes cells ~sqrt(n)
    (the r8 scale fix for the 10.1x sf1 ratio the fixed 16 cells
    measured). Exact copies have identical vectors, hence identical
    centroid scores, hence the same cell under ANY cell count — so
    planted-copy recall must be 100% in the sqrt-n regime, and the
    election still keeps exactly one member per duplicate group."""
    import random

    random.seed(23)
    centers = [[1.0 if d == c else 0.0 for d in range(8)] for c in range(4)]
    rows = []
    for i in range(300):
        c = centers[i % 4]
        rows.append((i, [x + random.uniform(-0.2, 0.2) for x in c]))
    # plant exact copies of every 10th vector
    planted = [(i + 100000, v) for i, v in rows if i % 10 == 0]
    vecs = spark.createDataFrame(
        rows + planted, "vec_id long, embedding array<float>"
    )
    # fixed_cells_max_vectors=50 forces the sqrt-n regime: 330 vectors
    # -> isqrt(330) = 18 cells (> the pinned 16)
    out = sim.semantic_dedup(
        vecs, threshold=0.999, fixed_cells_max_vectors=50
    ).collect()
    comp = {r.vec_id: r.component_id for r in out}
    kept = {r.vec_id for r in out if r.is_kept == 1}
    for i, _ in rows:
        if i % 10 == 0:
            assert comp[i] == comp[i + 100000], (i, "copy split from original")
            # exactly one survivor per planted pair's component
            members = [v for v, c in comp.items() if c == comp[i]]
            assert len([m for m in members if m in kept]) == 1
    # defaults keep the pinned regime on small corpora: same corpus under
    # the default threshold must produce the identical component map as
    # an explicit n_cells=16 run (oracle-regime invariance)
    out16 = sim.semantic_dedup(vecs, threshold=0.999, n_cells=16).collect()
    assert {r.vec_id: r.component_id for r in out16} == {
        r.vec_id: r.component_id
        for r in sim.semantic_dedup(vecs, threshold=0.999).collect()
    }


def test_lttb_duplicate_x_is_deterministic(spark):
    """Callers pre-aggregate to distinct x, but if duplicate x values
    arrive the rank orders on (x, y) — so repeated runs over a
    shuffled duplicate-x frame must produce the identical output set
    (r7 ADVICE: bare orderBy(x) made idx nondeterministic)."""
    rows = [(1, 10), (2, 5), (2, 50), (2, 7), (3, 1), (4, 9), (5, 2)]
    outs = []
    for seed in (1, 2, 3):
        df = (
            spark.createDataFrame(rows, "x long, y long")
            .repartition(4)  # scramble physical order across runs
        )
        outs.append(
            sorted(
                (r.x, r.y, r.bucket)
                for r in ts.lttb_downsample(df, n_buckets=3).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
    xs = [(x, y) for x, y, _ in outs[0]]
    assert (1, 10) in xs and (5, 2) in xs  # endpoints kept


def test_ivf_range_search_exact_on_candidates_and_subset(spark):
    """Range results are (a) truly above the threshold — scoring on
    candidates is exact — and (b) a subset of the exact brute-force
    range set; on a clusterable corpus recall stays high."""
    import math
    import random

    random.seed(31)
    centers = [[1.0 if d == c else 0.0 for d in range(8)] for c in range(4)]
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, [x + random.uniform(-0.2, 0.2) for x in c]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = vecs.filter(F.col("vec_id") < 8)
    got = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_range_search(
            vecs, qs, 0.9, n_cells=4, nprobe=2
        ).collect()
    }
    by_id = {i: v for i, v in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    exact = {
        (q, n)
        for q in range(8)
        for n in by_id
        if n != q and cos(by_id[q], by_id[n]) >= 0.9
    }
    assert got, "range search returned nothing on a clustered corpus"
    assert got <= exact, "range result contains a below-threshold pair"
    assert len(got) / len(exact) >= 0.8, (len(got), len(exact))


def test_global_line_dedup_first_occurrence_and_reconstruction(spark):
    """Hand-checked corpus: each line survives only at its first
    (doc_id, pos); docs rebuild from surviving lines in order; a doc
    whose every line occurred earlier vanishes."""
    import hashlib

    from _event_intelligence_data_warehouse_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta"),
            (2, "beta\ngamma"),
            (3, "alpha\ngamma"),          # both lines seen -> vanishes
            (4, "beta\ndelta\nbeta"),     # in-doc repeat also dedups
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dd.global_line_dedup(docs).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert set(out) == {1, 2, 4}
    assert (out[1].n_lines_kept, out[1].rebuilt_md5) == (2, md5("alpha\nbeta"))
    assert (out[2].n_lines_kept, out[2].rebuilt_md5) == (1, md5("gamma"))
    assert (out[4].n_lines_kept, out[4].rebuilt_md5) == (1, md5("delta"))
