"""Link-analysis operators over entity graphs: fixed-iteration PageRank
and blocked fuzzy entity matching.

PageRank is the standard crawl-prioritization / host-authority signal in
web-corpus curation (CommonCrawl ranks hosts with harmonic/PageRank
centrality; quality classifiers use link authority as a feature). The
implementation here is the classic synchronous power iteration expressed
as DataFrame joins — one shuffle per iteration, partitioned by vertex id
— with the numerics done in integer parts-per-billion so the result is
bit-exact across engines and partition orders (same discipline as the
bigram-LM surprise scorer in operators/text.py).

Why integer ppb instead of doubles: a floating-point PageRank sums
incoming contributions in partition order, so two runs (or two engines)
legitimately differ in the last ulp, which a hash-comparing oracle
cannot tolerate. With rank held in int64 billionths and every division a
floor division of non-negative values, Spark's `div` and DuckDB's `//`
agree exactly, sums are order-independent, and the fixpoint is
reproducible. Total mass leaks a few ppb per iteration to flooring —
irrelevant for ranking, and the leak itself is deterministic.

Scale: vertices and edges stay distributed end-to-end; each iteration is
one (edges ⋈ ranks) shuffle-hash join on src plus a groupBy(dst) — the
same shape GraphX/Pregel lowers to. The edge table is hash-partitioned
once and reused via localCheckpoint (outputPartitioning preserved), so
per-iteration movement is O(|V|) rank rows, not O(|E|). Dangling mass is
a 1-row aggregate broadcast into the update expression.

Fuzzy blocked matching is the entity-resolution primitive (record
linkage): a cheap deterministic blocking key bounds the candidate space,
then an exact edit-distance verify runs only within blocks — the same
two-phase shape as the MinHash/LSH dedup family in operators/dedup.py,
with the same hot-block cap to bound the quadratic worst case.

Reference parity note: the reference warehouse (scripts/run_pipeline.py,
transform/transform_events.sql) has no graph operators; these extend the
engine for training-data curation per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

PPB = 1_000_000_000


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    vertices: DataFrame | None = None,
    id_col: str = "node_id",
    start_ranks: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank with int64 parts-per-billion arithmetic.

    Returns (node_id, rank_ppb) for every vertex. The vertex set is the
    union of edge endpoints unless an explicit ``vertices`` frame is
    given (isolated vertices then participate and collect the teleport +
    dangling share). With an explicit ``vertices`` frame, edge
    endpoints must be WITHIN it (r12 advice): the union-zero-arm rank
    update emits every node that receives a contribution, so an edge
    dst missing from ``vertices`` appears in the output (the pre-r12
    verts-left-join lowering dropped it). Both in-repo callers pass
    ``vertices=None``, where coverage holds by construction.

    Per iteration, for damping d = damping_pct/100 over n vertices::

        contrib(v)   = rank_ppb(v) div outdeg(v)        # per out-edge
        dangling     = sum(rank_ppb(v) for outdeg(v)=0) div n
        rank'_ppb(u) = ((100-d)*PPB div 100) div n
                       + d * (sum_in(contrib) + dangling) div 100

    Every division floors non-negative int64s, so the sequence is exact
    and engine-portable. ``iterations`` is fixed (no convergence probe)
    so an external oracle can unroll the identical recurrence.

    ``start_ranks`` (node_id, rank_ppb) warm-starts the iteration from a
    previously computed fixpoint — the steady-state path when the graph
    changes incrementally (same pattern as the incremental MinHash / CC
    / semantic-dedup variants): ranks are already near the new fixpoint,
    so a couple of refinement iterations replace a full cold run. Nodes
    absent from ``start_ranks`` (new pages) initialize to the uniform
    share; departed nodes drop out with the vertex set.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if not (0 <= damping_pct <= 100):
        raise ValueError("damping_pct must be in [0, 100]")
    e = edges.select(
        F.col(src_col).cast("bigint").alias("src"),
        F.col(dst_col).cast("bigint").alias("dst"),
    ).distinct()
    if vertices is None:
        verts = (
            e.select(F.col("src").alias("node_id"))
            .unionByName(e.select(F.col("dst").alias("node_id")))
            .distinct()
        )
    else:
        verts = vertices.select(F.col(id_col).cast("bigint").alias("node_id")).distinct()
    # Hash-partition edges by src ONCE; localCheckpoint preserves the
    # partitioning so each iteration's rank join reuses it and only the
    # O(|V|) rank frame shuffles per round.
    e = e.repartition(F.col("src")).localCheckpoint()
    verts = verts.localCheckpoint()
    n = verts.count()
    if n == 0:
        return verts.withColumn("rank_ppb", F.lit(0).cast("bigint"))

    # Materialized once: `ranked` below is lazy, so outdeg is a subplan
    # of BOTH the dangling aggregate and the contrib join — without the
    # checkpoint each iteration re-runs this edge-scale groupBy twice
    # (guide §1.2: remove recomputed passes before tuning anything else).
    # The frame is O(|V|) and its lineage dies here, so the checkpoint
    # is one cheap job paid once, not per iteration.
    outdeg = e.groupBy("src").agg(
        F.count("*").alias("outdeg")
    ).localCheckpoint()
    teleport = (100 - damping_pct) * PPB // 100 // n

    if start_ranks is None:
        ranks = verts.withColumn("rank_ppb", F.lit(PPB // n).cast("bigint"))
    else:
        ranks = (
            verts.join(
                start_ranks.select(
                    F.col("node_id").cast("bigint").alias("node_id"),
                    F.col("rank_ppb").cast("bigint").alias("_warm"),
                ),
                "node_id",
                "left",
            )
            .select(
                "node_id",
                F.coalesce(F.col("_warm"), F.lit(PPB // n))
                .cast("bigint").alias("rank_ppb"),
            )
            .localCheckpoint()
        )
    for _ in range(iterations):
        ranked = ranks.join(outdeg, ranks.node_id == outdeg.src, "left").select(
            "node_id", "rank_ppb", "outdeg"
        )
        # Dangling mass: one tiny aggregate, crossed into the update as
        # a broadcast-1-row frame (never a driver collect of vertex data).
        dang = ranked.agg(
            F.coalesce(
                F.sum(F.when(F.col("outdeg").isNull(), F.col("rank_ppb"))),
                F.lit(0),
            ).alias("_dangling")
        ).select(F.expr(f"_dangling div {n}").cast("bigint").alias("_dang_share"))
        # in-sum as ONE aggregation over (edge contributions UNION a
        # zero row per vertex): identical to the former groupBy +
        # verts-left-join lowering — isolated vertices come through the
        # zero arm instead of a NULL coalesce — one exchange cheaper
        # per iteration (guide §2.4).
        contrib = (
            e.join(
                ranked.filter(F.col("outdeg").isNotNull()).select(
                    F.col("node_id").alias("src"),
                    F.expr("rank_ppb div outdeg").alias("contrib"),
                ),
                "src",
            )
            .select(F.col("dst").alias("node_id"), "contrib")
            .unionByName(
                verts.select(
                    "node_id", F.lit(0).cast("bigint").alias("contrib")
                )
            )
            .groupBy("node_id")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        ranks = (
            contrib.crossJoin(F.broadcast(dang))
            .select(
                "node_id",
                (
                    F.lit(teleport)
                    + F.expr(
                        f"({damping_pct} * (in_sum"
                        f" + _dang_share)) div 100"
                    )
                ).cast("bigint").alias("rank_ppb"),
            )
            .localCheckpoint()
        )
    return ranks


def _block_key(name_col: str, block: Column | str | None) -> Column:
    """The shared blocking-key expression (default: last whitespace
    token of the lowercased name) — one definition so the candidate
    join and the hot-block telemetry can never disagree on what a
    block is."""
    if block is None:
        return F.element_at(
            F.split(F.lower(F.trim(F.col(name_col))), r"\s+"), -1
        )
    if isinstance(block, str):
        return F.col(block)
    return block


def fuzzy_blocked_pairs(
    df: DataFrame,
    *,
    id_col: str,
    name_col: str,
    block: Column | str | None = None,
    max_distance: int = 4,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Blocked fuzzy entity matching: candidate pairs share a blocking
    key, survivors have ``levenshtein(name_a, name_b) <= max_distance``.

    Returns (id_a, id_b, name_a, name_b, distance) with id_a < id_b.

    The blocking key defaults to the last whitespace token of the
    lowercased name (for "modifier noun" entity names the noun is the
    stable part; swap in soundex/prefix/q-gram keys per domain). The
    self-join is an equi-join on the key, so candidates are
    sum-over-blocks(|b|²) instead of n² — the record-linkage analogue of
    LSH banding.

    Hot-block guard (same rationale as minhash_lsh_candidates'
    membership cap): a degenerate corpus where one key covers the whole
    table would regenerate the quadratic blow-up blocking exists to
    prevent, so blocks above ``max_block_size`` members are dropped from
    the candidate join and surfaced via the ``fuzzy_hot_blocks``
    accessor on the returned frame's attached telemetry — at 100 TB you
    route those to a sharded q-gram pass instead of silently stalling.
    """
    blk = _block_key(name_col, block)
    base = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(name_col).alias("name"),
        blk.alias("bkey"),
    ).filter(F.col("bkey").isNotNull() & (F.col("bkey") != ""))
    sizes = base.groupBy("bkey").agg(F.count("*").alias("_bn"))
    # Exclude via the HOT set, not an inclusion join on the surviving
    # keys: the hot set is n/max_block_size at worst (vs the unbounded
    # surviving-key dictionary) — usually tiny, but still linear in n,
    # so let AQE pick broadcast vs shuffle instead of forcing the hint
    # (a skewed 10^12-row corpus could hold 10^8 hot keys).
    hot = sizes.filter(F.col("_bn") > max_block_size).select("bkey")
    bounded = base.join(hot, "bkey", "left_anti")
    a = bounded.select(
        "bkey", F.col("id").alias("id_a"), F.col("name").alias("name_a")
    )
    b = bounded.select(
        "bkey", F.col("id").alias("id_b"), F.col("name").alias("name_b")
    )
    return (
        a.join(b, "bkey")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("name_a", "name_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )


def fuzzy_hot_blocks(
    df: DataFrame,
    *,
    name_col: str,
    block: Column | str | None = None,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Telemetry companion to fuzzy_blocked_pairs: the blocking keys
    whose membership exceeded the cap (and were therefore excluded from
    the candidate join), with their sizes."""
    blk = _block_key(name_col, block)
    return (
        df.select(blk.alias("bkey"))
        .filter(F.col("bkey").isNotNull() & (F.col("bkey") != ""))
        .groupBy("bkey")
        .agg(F.count("*").alias("block_size"))
        .filter(F.col("block_size") > max_block_size)
    )


def common_neighbors(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    min_common: int = 1,
    max_hub_degree: int | None = None,
) -> DataFrame:
    """Link prediction by common-neighbor counting (the Liben-Nowell &
    Kleinberg 2003 baseline): for every NON-adjacent node pair sharing
    at least ``min_common`` neighbors in the undirected graph, emit the
    common-neighbor count plus the degree product (the preferential-
    attachment score — the zero-overlap fallback signal). In a curation
    graph (co-purchase, co-citation, near-dup adjacency) these are the
    "probably related but unlinked" candidates: transitive near-dup
    suspects, basket recommendations, entity-merge proposals.

    ``edges`` is read as an undirected simple graph: rows are
    normalized to (min, max), deduped, self-loops dropped. Output:
    (node_a, node_b, common_neighbors, degree_product), node_a <
    node_b, existing edges excluded by an anti-join.

    Scale shape: the only quadratic surface is the per-shared-neighbor
    fan-out (deg² wedges per node). ``max_hub_degree`` bounds it the
    way dedup hot buckets are bounded (operators/dedup.py): nodes above
    the cap do not SERVE as the shared middle node (their own links
    are unaffected) — a documented semantic knob, mirrored by any
    oracle, not a silent truncation. Degrees and wedge counts are
    map-side-combinable aggregates; the anti-join runs on the (sparse)
    candidate output, never on the wedge space."""
    from _event_intelligence_data_warehouse_spark import cache

    # Persisted (stage-shared): the normalized edge set feeds the wedge
    # join (twice via sym), the degree aggregate AND the final
    # anti-join — recomputing the upstream edge derivation (often a
    # co-occurrence aggregate) per consumer is the 42-exchange plan
    # this persist deletes.
    e = cache.persist(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("_a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("_b"),
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    sym = e.select(F.col("_a").alias("n"), F.col("_b").alias("m")) \
        .unionByName(e.select(F.col("_b").alias("n"), F.col("_a").alias("m")))
    deg = cache.persist(
        sym.groupBy("n").agg(F.count(F.lit(1)).alias("_deg"))
    )
    mid = sym.withColumnRenamed("n", "mid").withColumnRenamed("m", "leaf")
    if max_hub_degree is not None:
        mid = mid.join(
            F.broadcast(deg.filter(F.col("_deg") <= max_hub_degree)
                        .select(F.col("n").alias("mid"))),
            "mid",
        )
    wedges = (
        mid.alias("x")
        .join(mid.alias("y"),
              (F.col("x.mid") == F.col("y.mid"))
              & (F.col("x.leaf") < F.col("y.leaf")))
        .groupBy(F.col("x.leaf").alias("node_a"),
                 F.col("y.leaf").alias("node_b"))
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
        .filter(F.col("common_neighbors") >= min_common)
    )
    cand = wedges.join(
        e.withColumnRenamed("_a", "node_a").withColumnRenamed("_b", "node_b"),
        ["node_a", "node_b"],
        "left_anti",
    )
    da = deg.select(F.col("n").alias("node_a"), F.col("_deg").alias("_da"))
    db = deg.select(F.col("n").alias("node_b"), F.col("_deg").alias("_db"))
    return (
        cand.join(da, "node_a").join(db, "node_b")
        .select(
            F.col("node_a").cast("bigint").alias("node_a"),
            F.col("node_b").cast("bigint").alias("node_b"),
            F.col("common_neighbors").cast("bigint")
            .alias("common_neighbors"),
            (F.col("_da") * F.col("_db")).cast("bigint")
            .alias("degree_product"),
        )
    )


def clustering_coefficient(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hub_degree: int | None = None,
) -> DataFrame:
    """Per-node triangle count and local clustering coefficient
    (Watts-Strogatz): lcc(v) = 2·tri(v) / (deg(v)·(deg(v)-1)) in exact
    ppm — the local-density profile of a graph (near-dup adjacency,
    co-purchase, citation): high-lcc nodes sit inside cliquish template
    families, zero-lcc high-degree nodes are hubs gluing unrelated
    regions (exactly the nodes hot-bucket caps exist for).

    ``edges`` is normalized to an undirected simple graph (like
    :func:`common_neighbors`). Output: (node_id, degree, n_triangles,
    lcc_ppm) for EVERY node; degree-0/1 nodes carry lcc_ppm = 0.

    Scale shape: triangles per node are wedges-at-v verified against
    the edge list — one self-join on the wedge center plus one
    semi-shaped equi-join on the (sorted) leaf pair, both
    map-side-combinable counts; no enumeration of global triangles.
    ``max_hub_degree`` (mirrored by any oracle) excludes super-hub
    CENTERS from wedge generation, bounding the deg² fan-out the same
    way :func:`common_neighbors` does."""
    from _event_intelligence_data_warehouse_spark import cache

    e = cache.persist(
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("_a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("_b"),
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    sym = e.select(F.col("_a").alias("n"), F.col("_b").alias("m")) \
        .unionByName(e.select(F.col("_b").alias("n"), F.col("_a").alias("m")))
    deg = cache.persist(
        sym.groupBy("n").agg(F.count(F.lit(1)).alias("_deg"))
    )
    centers = sym
    if max_hub_degree is not None:
        centers = centers.join(
            F.broadcast(deg.filter(F.col("_deg") <= max_hub_degree)
                        .select("n")),
            "n",
        )
    tri = (
        centers.alias("x")
        .join(centers.alias("y"),
              (F.col("x.n") == F.col("y.n"))
              & (F.col("x.m") < F.col("y.m")))
        .join(e, (F.col("_a") == F.col("x.m"))
              & (F.col("_b") == F.col("y.m")))
        .groupBy(F.col("x.n").alias("n"))
        .agg(F.count(F.lit(1)).alias("_tri"))
    )
    return (
        deg.join(tri, "n", "left")
        .select(
            F.col("n").cast("bigint").alias("node_id"),
            F.col("_deg").cast("bigint").alias("degree"),
            F.coalesce(F.col("_tri"), F.lit(0)).cast("bigint")
            .alias("n_triangles"),
            F.when(
                F.col("_deg") >= 2,
                F.expr("2000000 * coalesce(_tri, 0) "
                       "div (_deg * (_deg - 1))"),
            ).otherwise(F.lit(0)).cast("bigint").alias("lcc_ppm"),
        )
    )


def khop_min_hops(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node_id",
) -> DataFrame:
    """Bounded breadth-first search: minimum hop count (0..k) from a
    seed set over a directed edge list — (node_id, hops) for every node
    within k hops.

    BFS level order makes min-hops structural: a node is labelled the
    FIRST time a frontier reaches it, and the left-anti join against
    the visited set keeps later (longer) paths from relabelling it —
    no min() aggregation needed. k is a fixed small constant, so this
    is k shuffle-joins, each frontier-proportional; the edge list is
    never materialized on the driver. For unbounded reachability use
    operators.dedup's incremental connected components instead; this
    operator's contract is hop-bounded neighborhoods (fraud blast
    radius, GNN sampling fan-out).
    """
    dist = seeds.select(
        F.col(node_col).cast("bigint").alias(node_col),
        F.lit(0).cast("bigint").alias("hops"),
    ).distinct().localCheckpoint()
    frontier = dist
    # Distinct + partition the edge list by src ONCE; localCheckpoint
    # truncates lineage so each level's join reuses the materialized
    # edges instead of re-deriving them (without this, the unrolled
    # plan re-scans edges per level and the DAG grows with k — the
    # audit measured 44 exchanges for k=3; checkpointed it is 3
    # frontier joins).
    e = (
        edges.select(
            F.col(src_col).cast("bigint").alias("src"),
            F.col(dst_col).cast("bigint").alias("dst"),
        )
        .distinct()
        .repartition(F.col("src"))
        .localCheckpoint()
    )
    for i in range(1, k + 1):
        nxt = (
            frontier.join(e, frontier[node_col] == e.src)
            .select(
                F.col("dst").alias(node_col),
                F.lit(i).cast("bigint").alias("hops"),
            )
            .distinct()
            .join(dist.select(node_col), node_col, "left_anti")
            .localCheckpoint()
        )
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist


# Fellegi-Sunter agreement/disagreement weights in milli-log2-odds,
# computed offline from the documented m/u probabilities (m = P(agree |
# match), u = P(agree | non-match)): w_agree = log2(m/u), w_disagree =
# log2((1-m)/(1-u)). Hardcoded integer constants keep the score exact
# and engine-portable (no libm at query time).
FS_WEIGHTS_MILLI: dict[str, tuple[int, int]] = {
    # field: (agreement_milli, disagreement_milli)   m     u
    "name":    (6_570, -4_307),                    # 0.95  0.01
    "nation":  (4_492, -3_263),                    # 0.90  0.04
    "segment": (2_170, -3_000),                    # 0.90  0.20
    "balband": (3_000, -2_170),                    # 0.80  0.10
}
FS_MATCH_MILLI = 9_000
FS_POSSIBLE_MILLI = 0


def fellegi_sunter_customer_links(
    df: DataFrame,
    *,
    block: Column | str | None = None,
    name_agree_distance: int = 1,
    max_distance: int = 4,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over blocked customer
    candidate pairs: per-field agreement flags weighted by fixed
    log-odds constants (FS_WEIGHTS_MILLI), summed to a match score and
    thresholded into match / possible / non-match.

    Fields: fuzzy name (levenshtein <= name_agree_distance on the
    blocked pair), nation key, market segment, account-balance
    1000-band. The candidate set comes from fuzzy_blocked_pairs
    (``block`` key, hot-block guarded), so the quadratic comparison
    space never materializes.
    All-integer scoring: bit-stable across engines and partitionings.
    """
    pairs = fuzzy_blocked_pairs(
        df.select(
            F.col("c_custkey").alias("id0"),
            F.col("c_name").alias("nm"),
        ).withColumnRenamed("id0", "c_custkey"),
        id_col="c_custkey",
        name_col="nm",
        block=block,
        max_distance=max_distance,
        max_block_size=max_block_size,
    )
    attrs = df.select(
        F.col("c_custkey").cast("bigint").alias("cid"),
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2)) / 1000)"
            " AS BIGINT)"
        ).alias("balband"),
    )
    a = attrs.select(
        F.col("cid").alias("id_a"),
        F.col("c_nationkey").alias("nat_a"),
        F.col("c_mktsegment").alias("seg_a"),
        F.col("balband").alias("band_a"),
    )
    b = attrs.select(
        F.col("cid").alias("id_b"),
        F.col("c_nationkey").alias("nat_b"),
        F.col("c_mktsegment").alias("seg_b"),
        F.col("balband").alias("band_b"),
    )
    j = pairs.join(a, "id_a").join(b, "id_b")

    def w(flag, field):
        wa, wd = FS_WEIGHTS_MILLI[field]
        return F.when(flag, F.lit(wa)).otherwise(F.lit(wd))

    scored = j.select(
        "id_a",
        "id_b",
        (F.col("distance") <= name_agree_distance).alias("name_agree"),
        (F.col("nat_a") == F.col("nat_b")).alias("nation_agree"),
        (F.col("seg_a") == F.col("seg_b")).alias("segment_agree"),
        (F.col("band_a") == F.col("band_b")).alias("band_agree"),
    ).withColumn(
        "score_milli",
        (
            w(F.col("name_agree"), "name")
            + w(F.col("nation_agree"), "nation")
            + w(F.col("segment_agree"), "segment")
            + w(F.col("band_agree"), "balband")
        ).cast("bigint"),
    )
    return scored.withColumn(
        "decision",
        F.when(F.col("score_milli") >= FS_MATCH_MILLI, "match")
        .when(F.col("score_milli") >= FS_POSSIBLE_MILLI, "possible")
        .otherwise("non-match"),
    )


def kcore_peel(
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 6,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Bounded k-core peeling over an undirected edge list: repeatedly
    delete every vertex with degree < k (and its edges) for up to
    ``max_rounds`` rounds, then return (node_id, degree) over the
    surviving subgraph. The k-core is the standard density sieve for
    entity/link graphs — spam-farm and boilerplate-hub detection keeps
    the dense core, and dup-cluster triage drops the chain fringe that
    transitive thresholds accrete.

    The ROUND BOUND is the contract, not a heuristic: each round's
    deletions are a deterministic function of the previous round's
    subgraph, so "peel exactly R rounds" is engine-portable (the oracle
    unrolls the same R rounds as plain CTE layers — no aggregates inside
    recursion, which SQL recursive CTEs disallow). Peeling past a
    fixpoint is a no-op, so the early exit below never changes the
    result, and a graph that hasn't converged in R rounds returns the
    same R-round approximant on every engine. True cores converge in
    few rounds on power-law graphs; pathological chains (each round
    removes one path endpoint) are exactly the structures the dedup
    diagnostics upstream already flag.

    Scale: the edge frame SHRINKS monotonically and is re-materialized
    per round via localCheckpoint, so round i re-filters the survivors
    of round i-1, never the original edge set; each round is one
    degree aggregate plus two semi-joins (AQE broadcasts the alive set
    once peeling localizes). The one count() per round is the
    convergence probe on an already-materialized frame."""
    ac = F.col(a_col).cast("bigint")
    bc = F.col(b_col).cast("bigint")
    # Canonicalize the undirected edge before distinct: a reversed
    # duplicate (b, a) is the same edge and must not double a degree.
    e = (
        edges.select(
            F.least(ac, bc).alias("a"), F.greatest(ac, bc).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    n = e.count()
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("a").alias("v"))
            .unionByName(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        )
        alive = deg.filter(F.col("d") >= k).select("v")
        # Convergence probe rides the checkpoint job via observe() —
        # one job per round instead of checkpoint + count (guide §1.2).
        obs = Observation()
        e = (
            e.join(alive, e.a == alive.v, "left_semi")
            .join(alive, e.b == alive.v, "left_semi")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        n2 = obs.get["n"]
        if n2 == n:
            break
        n = n2
    return (
        e.select(F.col("a").alias("node_id"))
        .unionByName(e.select(F.col("b").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )


def label_propagation(
    edges: DataFrame,
    *,
    iterations: int = 3,
    a_col: str = "src",
    b_col: str = "dst",
) -> DataFrame:
    """Synchronous label-propagation communities over an undirected
    graph: every node starts as its own label; each round it adopts the
    MODE of its neighbors' labels, ties broken toward the smallest
    label, isolated semantics irrelevant (vertices come from edges).
    Returns (node_id, community) after exactly ``iterations`` rounds.

    Community detection is the coarse-grained companion to connected
    components in dedup/link curation: CC answers "transitively
    touching?", LPA splits a weakly-bridged blob into its dense cores —
    e.g. two boilerplate families chained by one borderline pair.

    Fixed-round, deterministic by construction (mode + min-label
    tie-break has no randomness, unlike the textbook asynchronous LPA),
    so an external oracle can unroll the identical recurrence as plain
    CTE layers — the same engine-portability contract as
    :func:`pagerank` and :func:`kcore_peel`. Synchronous LPA can
    oscillate on bipartite structures rather than converge; a FIXED
    iteration count makes that a defined, reproducible output instead
    of a termination hazard.

    Scale: the symmetric edge frame is hash-partitioned once and
    localCheckpointed; each round moves one O(V) label frame through a
    join + two-level aggregate (count per (node, label), argmax per
    node) — the Pregel lowering, like pagerank's."""
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    ac = F.col(a_col).cast("bigint")
    bc = F.col(b_col).cast("bigint")
    und = (
        edges.select(ac.alias("u"), bc.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = (
        und.unionByName(und.select(F.col("v").alias("u"),
                                   F.col("u").alias("v")))
        .distinct()
        .repartition(F.col("v"))
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("u").alias("node_id"))
        .distinct()
        .withColumn("community", F.col("node_id"))
    )
    for _ in range(iterations):
        # Neighbor-mode as ONE aggregation (r13, guide §2.4): the r12
        # lowering was count per (u, nbr_lbl) then max_by per u — two
        # exchanges per round (hash(u, nbr_lbl) then hash(u)); under
        # AQE each exchange is its own scheduled job, and at sf0.1 the
        # per-job floor IS the round cost (measured: tasks/round are
        # already AQE-coalesced to a handful, so only the job count
        # moves the wall; at scale the removed exchange is an O(V·deg)
        # shuffle). mode(nbr_lbl, deterministic=true) computes the
        # identical argmax in one partially-aggregable pass: most
        # frequent label, ties -> LOWEST value — exactly (max n,
        # tie -> min label). Pinned against the two-level lowering on
        # random graphs in tests/test_round13_ops.py.
        labels = (
            sym.join(
                labels.select(
                    F.col("node_id").alias("v"),
                    F.col("community").alias("nbr_lbl"),
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.mode("nbr_lbl", True).alias("community"))
            .select(
                F.col("u").alias("node_id"),
                F.col("community"),
            )
            .localCheckpoint()
        )
    return labels.select(
        F.col("node_id").cast("bigint").alias("node_id"),
        F.col("community").cast("bigint").alias("community"),
    )
