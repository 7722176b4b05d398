"""Scale-fallback regression tests: the non-broadcast paths that round 1
documented but did not implement must (a) exist, (b) produce results
identical to their broadcast twins, and (c) actually avoid broadcasting
corpus-sized frames (asserted on the executed plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.operators import dedup


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _dense_docs(spark, n: int = 40):
    """Docs over a 3-letter alphabet: <= 27 distinct 3-grams, far under
    DENSE_UNIVERSE_MAX, so ngram_jaccard auto-routes to the bitmap path."""
    alphabet = "abc"
    rows = []
    for i in range(n):
        # deterministic pseudo-text with overlapping gram sets
        s = "".join(alphabet[(i * 7 + j * j) % 3] for j in range(12 + i % 5))
        rows.append((i, s))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bitmap_jaccard_blocked_matches_broadcast(spark):
    docs = _dense_docs(spark)
    gsets = dedup.char_ngram_sets(docs, 3, "text", "doc_id", hashed=True)

    bcast = dedup._bitmap_jaccard_pairs(gsets, 0.3)
    blocked = dedup._bitmap_jaccard_pairs(
        gsets, 0.3, broadcast_max_docs=10
    )

    key = lambda r: (r["doc_a"], r["doc_b"])
    b_rows = sorted(bcast.collect(), key=key)
    # The 40-doc fixture proxies the >200k-doc regime where the blocked
    # path fires; since the packed frame is persisted (r12), AQE can see
    # its true (tiny, fixture-only) size and would broadcast it at
    # EXECUTION time — a conversion impossible at the real regime's
    # size. Pin the auto thresholds off around the blocked ACTION so
    # the fixture executes the at-scale plan shape; the dictionary's
    # broadcast is an explicit hint and survives.
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in prev:
            spark.conf.set(k, "-1")
        s_rows = sorted(blocked.collect(), key=key)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert b_rows == s_rows, "blocked plan changed the pair results"
    assert len(b_rows) > 0, "test corpus produced no pairs — not probative"

    # The blocked plan must join via the block-pair shuffle key, and the
    # only broadcast allowed is the tiny gram-position dictionary (its
    # build side carries the dictionary's idx column, never packed words).
    plan = _plan(blocked)
    assert "hashpartitioning(pk" in plan, (
        "blocked path did not shuffle on the block-pair key"
    )
    for section in plan.split("BroadcastExchange")[1:]:
        head = section.splitlines()[0]
        assert "w0" not in head and "sz" not in head, (
            "a packed corpus frame is still broadcast in the blocked plan"
        )


def test_bitmap_jaccard_blocked_exact_under_block_skew(spark):
    """Adversarial block skew (r2 verdict item 7): every doc hashes into
    just 2 of 8 blocks, so 6 blocks are empty, one block pair carries
    ~half of all comparisons, and the diagonal dedup rule does most of
    the work. Pair sets must still match the broadcast plan exactly."""
    nb = 8
    # Select doc ids whose murmur3 block is 0 or 1 USING SPARK'S OWN hash
    # (test must not re-implement it): probe a candidate range first.
    cand = (
        spark.range(0, 5000)
        .select("id", F.pmod(F.hash(F.col("id")), F.lit(nb)).alias("blk"))
        .filter(F.col("blk") < 2)
        .limit(40)
    )
    ids = [r.id for r in cand.collect()]
    assert len(ids) == 40, "candidate range too small for the skew setup"

    alphabet = "abc"
    rows = []
    for i, doc_id in enumerate(ids):
        s = "".join(alphabet[(i * 7 + j * j) % 3] for j in range(12 + i % 5))
        rows.append((doc_id, s))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    gsets = dedup.char_ngram_sets(docs, 3, "text", "doc_id", hashed=True)

    bcast = dedup._bitmap_jaccard_pairs(gsets, 0.3)
    blocked = dedup._bitmap_jaccard_pairs(
        gsets, 0.3, broadcast_max_docs=10, n_blocks=nb
    )
    key = lambda r: (r["doc_a"], r["doc_b"])
    b_rows = sorted(bcast.collect(), key=key)
    s_rows = sorted(blocked.collect(), key=key)
    assert b_rows == s_rows, "block skew changed the blocked plan's pairs"
    assert len(b_rows) > 0, "skewed corpus produced no pairs — not probative"


def test_bitmap_jaccard_self_and_duplicate_pairs_excluded(spark):
    docs = _dense_docs(spark, 25)
    gsets = dedup.char_ngram_sets(docs, 3, "text", "doc_id", hashed=True)
    rows = dedup._bitmap_jaccard_pairs(
        gsets, 0.3, broadcast_max_docs=5
    ).collect()
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"], "pair not normalized to a < b"
        pair = (r["doc_a"], r["doc_b"])
        assert pair not in seen, f"duplicate pair {pair}"
        seen.add(pair)


def _toy_graph(spark):
    vertices = spark.createDataFrame(
        [(i,) for i in range(12)], "doc_id long"
    )
    # components: {0,1,2,3} (chain), {4,5,6} (triangle), {7}, {8,9}, {10,11}
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (4, 6), (8, 9), (10, 11)],
        "doc_a long, doc_b long",
    )
    return vertices, edges


def test_connected_components_shuffle_path_matches_broadcast(spark):
    vertices, edges = _toy_graph(spark)
    by_id = lambda r: r["doc_id"]
    bcast = sorted(
        dedup.connected_components(
            vertices, edges, broadcast_labels=True
        ).collect(),
        key=by_id,
    )
    shuffled = sorted(
        dedup.connected_components(
            vertices, edges, broadcast_labels=False
        ).collect(),
        key=by_id,
    )
    assert bcast == shuffled, "non-broadcast CC diverged from broadcast CC"
    comp = {r["doc_id"]: r["component_id"] for r in bcast}
    assert comp[3] == 0 and comp[6] == 4 and comp[7] == 7
    assert comp[9] == 8 and comp[11] == 10


def test_connected_components_auto_threshold_disables_broadcast(spark):
    vertices, edges = _toy_graph(spark)
    # With the threshold below the vertex count, auto mode must take the
    # shuffle path and still converge to the same labels.
    out = sorted(
        dedup.connected_components(
            vertices, edges, broadcast_max_vertices=4
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    comp = {r["doc_id"]: r["component_id"] for r in out}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7,
                    8: 8, 9: 8, 10: 10, 11: 10}


def test_lsh_hot_bucket_guard_bounds_template_corpus(spark):
    """Adversarial template corpus: 300 docs with IDENTICAL token sets
    (mass-produced pages) share every band bucket, so the uncapped
    self-join would emit C(300,2)=44850 candidate pairs. With
    max_bucket=50 every band's bucket truncates to the 50 lowest ids:
    candidates are bounded by C(50,2), and the telemetry view names the
    capped buckets."""
    docs = spark.createDataFrame(
        [(i, "the same template page body repeated verbatim") for i in range(300)],
        "doc_id long, text string",
    )
    sets_ = dedup.doc_token_sets(docs)
    sigs = dedup.minhash_signatures(sets_)

    capped = dedup.minhash_lsh_candidates(sigs, max_bucket=50)
    n = capped.count()
    assert n == 50 * 49 // 2, n  # all bands keep the same 50-id prefix

    hot = dedup.lsh_hot_buckets(sigs, max_bucket=50).collect()
    assert len(hot) == dedup.MINHASH_BANDS  # every band has one hot bucket
    assert all(r["n_docs"] == 300 for r in hot)

    # deterministic truncation: lowest doc_ids win
    ids = {r for row in capped.select("doc_a", "doc_b").collect()
           for r in (row["doc_a"], row["doc_b"])}
    assert ids == set(range(50))

    # healthy corpus: the guard is a no-op (same pairs with and without)
    healthy = spark.createDataFrame(
        [(i, f"doc {i} unique words alpha{i} beta{i % 7} gamma{i % 3}")
         for i in range(60)],
        "doc_id long, text string",
    )
    hsigs = dedup.minhash_signatures(dedup.doc_token_sets(healthy))
    with_guard = set(
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(hsigs).collect()
    )
    without = set(
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_candidates(hsigs, max_bucket=None).collect()
    )
    assert with_guard == without
    assert dedup.lsh_hot_buckets(hsigs).count() == 0
