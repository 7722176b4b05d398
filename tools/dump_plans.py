"""Regenerate PLANS.md: formatted physical plans for representative
queries, the direct evidence behind SCALE.md's claims (pushdown, column
pruning, broadcast star joins, shuffle-free projections, bucket-scan
co-location).

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

REPO = "/root/repo"
sys.path.insert(0, REPO)

SHOWCASE = [
    (
        "staging_cleanse",
        "Stateless cleanse projection — no Exchange anywhere; the scan "
        "carries ReadSchema limited to referenced columns.",
    ),
    (
        "fact_build_star",
        "Whole fact build: one window shuffle for batch dedup, all four "
        "dimension joins BroadcastHashJoin, no SortMergeJoin.",
    ),
    (
        "kpi_events_by_category",
        "KPI aggregate: partial/final HashAggregate pair (map-side "
        "combine) over the staged scan.",
    ),
    (
        "topk_recent_events",
        "ORDER BY + LIMIT compiles to TakeOrderedAndProject — no global "
        "sort.",
    ),
    (
        "dedup_minhash_lsh_pairs",
        "MinHash LSH: tokenize/sign as pure projection (reused via "
        "persisted signatures), band self-join and verify joins all "
        "broadcast; the candidate distinct is the only hash exchange.",
    ),
    (
        "similarity_ivf_topk",
        "IVF ANN: fixed-K quantizer trained on a bounded md5-rank sample "
        "(TakeOrderedAndProject selects it; (cell, pos) partial-sum "
        "HashAggregate updates centroids — no corpus-sized broadcast "
        "anywhere); per-query work bounded to probed cells via the cell "
        "equi-join; final top-k is a bounded window.",
    ),
    (
        "text_decontaminate",
        "Benchmark decontamination: gram hashes explode shuffle-free, the "
        "benchmark index is the BroadcastHashJoin build side, the corpus "
        "side streams — one pass, one small aggregate.",
    ),
    (
        "window_moving_avg_7d",
        "Framed window over the pre-aggregated daily series — the window "
        "input is ≤ days rows, never raw events.",
    ),
    (
        "text_pack_sequences",
        "Sequence packing: exactly ONE hashpartitioning exchange (the "
        "per-shard running-sum window); shards pack independently, no "
        "global ordering pass.",
    ),
    (
        "governance_validate_rules",
        "Constraint validation: all row-local + uniqueness rules fold "
        "into one multi-aggregate scan + stack unpivot; the referential "
        "rule is the single anti-join.",
    ),
    (
        "text_tfidf_top_terms",
        "TF-IDF: wordcount-shaped partial/final aggregates; the "
        "doc-frequency side joins on term (shuffle — a real vocabulary "
        "doesn't broadcast); 1-row doc count broadcast to every task.",
    ),
    (
        "dedup_canonical_keep_best",
        "Keep-best election: CC labels join quality scores, one window "
        "shuffle on component_id elects the survivor.",
    ),
    (
        "rollup_cascade_daily",
        "Continuous-aggregate daily level: read from the stored hourly "
        "partials (partition-pruned parquet), one combine aggregate — "
        "raw events never rescanned.",
    ),
    (
        "sketch_hll_distinct",
        "HLL: one wordcount-shaped register aggregate per column into "
        "256 rows; harmonic sum as exact BIGINT, single final division.",
    ),
    (
        "dedup_exact_substrings",
        "ExactSubstr spans (r4): n-gram digests from array ops (no "
        "explode before the digest), document-frequency filter over "
        "digests only, gaps-and-islands windows merge spans per doc.",
    ),
    (
        "sketch_bloom_membership",
        "Bloom membership (r4): the sparse word frame is the "
        "BroadcastHashJoin build side of the probe; corpus side "
        "streams; verdict is one per-doc min aggregate.",
    ),
    (
        "text_boilerplate_lines",
        "Boilerplate removal (r4): line digests shuffle to the "
        "document-frequency aggregate (never line text); reconstruction "
        "is one group-bounded collect per document.",
    ),
    (
        "text_gopher_filters",
        "Gopher rule battery (r5): all seven structural rules in ONE "
        "shuffle-free scan projection — no Exchange anywhere.",
    ),
    (
        "dedup_semantic_incremental",
        "Incremental SemDeDup (r5): the batch assigns against the "
        "broadcast stored centroids; pair joins hit only touched "
        "cells' members — the corpus is never re-assigned.",
    ),
    (
        "curation_pipeline_v4",
        "Composed curation v4 (r5): the Gopher gate is an inline "
        "predicate pushed at the scan (no metrics-frame self-join); "
        "the temperature plan broadcasts onto the corpus stream.",
    ),
    (
        "stats_numeric_correlations",
        "Correlation matrix (r5): one multi-aggregate scan; exact "
        "integer-scaled DECIMAL sums; coefficients explode from a "
        "single 1-row frame.",
    ),
    (
        "graph_pagerank",
        "PageRank (late r5): per-iteration shape is one edge-rank join "
        "on the ONCE-partitioned edge table + a groupBy(dst) partial "
        "sum; the dangling share rides a 1-row BroadcastExchange; every "
        "arithmetic node is int64 (bit-exact across retries).",
    ),
    (
        "text_bm25_search",
        "BM25 (late r5): isin prunes tokens BEFORE the tf shuffle; df "
        "and avgdl are broadcast 1-frames; DECIMAL-quantized per-term "
        "scores sum order-independently; the top-k is "
        "TakeOrderedAndProject, not a global window.",
    ),
    (
        "olap_pareto_frontier",
        "Skyline (r5s3): phase-1 windows partition by "
        "spark_partition_id (parallel local skylines), only survivors "
        "reach the exact single-partition pass — no dominance "
        "self-join, no CartesianProduct.",
    ),
    (
        "sketch_kmv_set_ops",
        "KMV set algebra (r5s3): the bottom-k tournament shows as "
        "per-salt window partitions before the O(16k)-row final "
        "window; merge/estimate subplans are constant-size; the exact "
        "audits are separate combinable aggregates.",
    ),
    (
        "stats_ks_two_sample",
        "Exact KS (r5s3): the two-level prefix sum — bucket totals, a "
        "tiny single-partition bucket prefix, then within-bucket "
        "windows partitioned by _bucket; no global ordered window ever "
        "sees the per-value rows.",
    ),
    (
        "olap_nation_market_share",
        "TPC-H Q8 shape (r5s3): the widest join tree in the registry — "
        "two independent dim paths, only nation/region broadcast by "
        "hint, AQE sizes part/customer/supplier; ONE aggregate pass "
        "carries numerator and denominator.",
    ),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from _event_intelligence_data_warehouse_spark.contract import QUERIES
    from _event_intelligence_data_warehouse_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — formatted physical plans of representative queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}`; regenerate "
        "after planner-relevant changes. These are the executed-plan "
        "artifacts behind SCALE.md's claims.",
        "",
    ]
    for name, note in SHOWCASE:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", note, "", "```", plan.rstrip(), "```", ""]
    with open(f"{REPO}/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
