"""Round-13 optimization pins: rewrites that must stay result-identical
to the lowering they replaced."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def test_lpa_mode_round_equals_two_level_argmax(spark):
    """label_propagation's per-round argmax is mode(nbr_lbl,
    deterministic=true) — ONE aggregation (r13). It must equal the r12
    two-level lowering (count per (u, lbl), then max_by(lbl,
    struct(n, -lbl))): most frequent label, ties to the SMALLEST label.
    Pinned on a random multigraph-vote frame with forced ties so a
    future Spark changing mode's deterministic tie-break fails here,
    not in the oracle gate."""
    rng = random.Random(13)
    rows = [
        (rng.randrange(40), rng.randrange(6)) for _ in range(4000)
    ]
    # forced exact ties: two labels with identical counts for one node
    rows += [(999, 3)] * 5 + [(999, 1)] * 5
    votes = spark.createDataFrame(rows, "u long, nbr_lbl long")
    two_level = (
        votes.groupBy("u", "nbr_lbl")
        .agg(F.count("*").alias("n"))
        .groupBy("u")
        .agg(
            F.max_by(
                "nbr_lbl",
                F.struct(F.col("n"), (-F.col("nbr_lbl"))),
            ).alias("community")
        )
    )
    one_pass = votes.groupBy("u").agg(
        F.mode("nbr_lbl", True).alias("community")
    )
    a = sorted(map(tuple, two_level.collect()))
    b = sorted(map(tuple, one_pass.collect()))
    assert a == b
    # the forced tie resolved to the smallest label
    tied = dict(b)[999]
    assert tied == 1


def test_knn_mutual_aggregation_equals_self_join(spark):
    """knn_graph's mutual check is one canonicalized groupBy (r13); it
    must equal the r12 two-orientation self-join on the same rank
    list. Pinned on a synthetic unique-(query, neighbor) rank frame
    with asymmetric edges (a knows b, b doesn't know a) so the
    both-orientations-required filter is exercised."""
    rng = random.Random(7)
    seen = set()
    rows = []
    for q in range(30):
        ranks = list(range(1, 6))
        rng.shuffle(ranks)
        nbrs = rng.sample([n for n in range(30) if n != q], 5)
        for n, r in zip(nbrs, ranks):
            assert (q, n) not in seen
            seen.add((q, n))
            rows.append((q, n, r))
    topk = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rank long"
    )
    # r12 lowering
    a_side = topk.select(
        F.col("query_id").alias("vec_a"),
        F.col("neighbor_id").alias("vec_b"),
        F.col("rank").alias("rank_ab"),
    ).filter(F.col("vec_a") < F.col("vec_b"))
    b_side = topk.select(
        F.col("neighbor_id").alias("vec_a"),
        F.col("query_id").alias("vec_b"),
        F.col("rank").alias("rank_ba"),
    ).filter(F.col("vec_a") < F.col("vec_b"))
    joined = a_side.join(b_side, ["vec_a", "vec_b"]).select(
        "vec_a", "vec_b", "rank_ab", "rank_ba"
    )
    # r13 lowering
    qa, na = F.col("query_id"), F.col("neighbor_id")
    agg = (
        topk.select(
            F.least(qa, na).alias("vec_a"),
            F.greatest(qa, na).alias("vec_b"),
            F.when(qa < na, F.col("rank")).alias("r_ab"),
            F.when(qa > na, F.col("rank")).alias("r_ba"),
        )
        .groupBy("vec_a", "vec_b")
        .agg(
            F.min("r_ab").alias("rank_ab"),
            F.min("r_ba").alias("rank_ba"),
        )
        .filter(
            F.col("rank_ab").isNotNull() & F.col("rank_ba").isNotNull()
        )
    )
    x = sorted(map(tuple, joined.collect()))
    y = sorted(map(tuple, agg.collect()))
    assert x == y
    assert len(x) > 0  # the fixture produced at least one mutual pair
