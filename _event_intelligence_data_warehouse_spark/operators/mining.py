"""Frequent-itemset mining (Apriori) over transaction baskets.

Level-wise Apriori expressed as DataFrame joins: L1 counts item
supports, every next level joins the frequent (k-1)-itemsets back onto
the basket table and applies the Apriori prune (every (k-1)-subset of a
surviving candidate must itself be frequent) BEFORE the support count —
the candidate space never materializes beyond what the prune admits.
This is the declarative complement to MLlib's FP-Growth: the join-based
formulation keeps every step inside Catalyst (pushdown, partial
aggregation, broadcast pruning) and stays oracle-checkable in plain SQL.

Scale shape: the within-basket k-way self-join fans out by
items-per-basket (bounded and small for real baskets — order lines,
session pages, doc shingles), NEVER item-universe x item-universe; the
frequent-set frames used for pruning are support-thresholded aggregates
(bounded by the threshold, broadcast when small); support counting is a
map-side-combinable groupBy. Hot baskets (pathologically many distinct
items) bound the fan-out — cap them upstream the way dedup hot buckets
are capped (operators/dedup.py).

Reference parity note: the reference warehouse (SURVEY.md §2) has no
mining operators; this extends the engine per the build brief's
training-data-pipeline mandate (co-occurrence structure mining is the
same shape curation uses for tag/topic co-occurrence audits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark import cache


def frequent_itemsets(
    baskets: DataFrame,
    *,
    min_support: int,
    max_k: int = 3,
    basket_col: str = "basket_id",
    item_col: str = "item",
    broadcast_frequent_max: int = 1_000_000,
) -> DataFrame:
    """Apriori frequent itemsets up to ``max_k`` items.

    ``baskets`` must be DISTINCT (basket, item) rows (de-dup upstream —
    support is set-semantics by definition). Returns one row per
    frequent itemset: ``(itemset, k, support)`` where ``itemset`` is the
    lexicographically sorted items joined by ``'|'`` (items are cast to
    string), ``k`` the level, ``support`` the exact basket count. An
    itemset appears iff support >= ``min_support`` AND every subset is
    frequent (Apriori closure — guaranteed by construction, since level
    k candidates are built only from level k-1 survivors).

    Physical plan per level: the level-(k-1) frequent frame (bounded by
    the support threshold) semi-joins the basket rows down to frequent
    items only, then ONE self-join per level extension with an
    item-order predicate (a < b < c ...) keeps each candidate counted
    once; the Apriori prune joins candidates against the broadcast
    frequent-(k-1) set before counting. All joins on (basket, item)
    keys — no cartesian anywhere.
    """
    if max_k < 1:
        raise ValueError("max_k must be >= 1")
    b = baskets.select(
        F.col(basket_col).alias("b"),
        F.col(item_col).cast("string").alias("i1"),
    )
    # L1: plain support count; frequent items gate every later level.
    # Persisted (stage-shared): l1 feeds the output, the item prune AND
    # every level's broadcast — without it each level rescans baskets.
    # localCheckpoint (not bare persist): support-thresholded = small,
    # and truncating here keeps every level's plan from nesting the
    # basket lineage (see the level loop below).
    l1 = (
        b.groupBy("i1")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
        .localCheckpoint()
    )

    def _gate(df: DataFrame, n: int) -> DataFrame:
        # Auto-select like connected_components' broadcast_max_vertices:
        # broadcast the frequent frame only while it actually fits the
        # cap — a low support threshold can make the frequent set huge,
        # and an unconditional hint would OOM executors where the
        # shuffle join works. Counts are taken ONCE per level on the
        # persisted frequent frame (the count doubles as its
        # materialization), never per broadcast site.
        return F.broadcast(df) if n <= broadcast_frequent_max else df

    n_l1 = l1.count()
    out = l1.select(
        F.col("i1").alias("itemset"),
        F.lit(1).cast("bigint").alias("k"),
        F.col("support").cast("bigint").alias("support"),
    )
    # Basket rows restricted to frequent items once — every level
    # extends from this pruned frame, so infrequent items never join.
    # Persisted: level k joins fb against the level-(k-1) occurrences,
    # so fb is read max_k-1 times.
    fb = cache.persist(
        b.join(_gate(l1.select("i1"), n_l1), "i1").select("b", "i1")
    )
    prev = None  # frequent itemsets of the previous level, as sorted arrays
    n_prev = 0
    for k in range(2, max_k + 1):
        if k == 2:
            cand = (
                fb.alias("a")
                .join(
                    fb.withColumnRenamed("i1", "i2").alias("c"),
                    (F.col("a.b") == F.col("c.b"))
                    & (F.col("a.i1") < F.col("c.i2")),
                )
                .select(F.col("a.b").alias("b"),
                        F.array("a.i1", "c.i2").alias("items"))
            )
        else:
            # Extend each level-(k-1) occurrence by one frequent item
            # greater than its max element (keeps candidates unique),
            # then Apriori-prune: the suffix (k-1)-subset dropping the
            # FIRST element must be frequent too (all other subsets
            # are frequent by the inductive construction of `occ`).
            occ = prev_occ  # (b, items array, sorted) from last level
            ext = (
                occ.alias("o")
                .join(
                    fb.withColumnRenamed("i1", "inew").alias("e"),
                    (F.col("o.b") == F.col("e.b"))
                    & (F.col("e.inew")
                       > F.element_at(F.col("o.items"), -1)),
                )
                .select(F.col("o.b").alias("b"),
                        F.concat(F.col("o.items"),
                                 F.array(F.col("e.inew"))).alias("items"))
            )
            pruned_sets = prev.select(
                F.col("items").alias("_sfx")
            )
            cand = ext.join(
                _gate(pruned_sets, n_prev),
                F.slice(F.col("items"), 2, k - 1) == F.col("_sfx"),
            ).select("b", "items")
        # cand feeds BOTH the support count and the next level's
        # occurrence frame — persist so the within-basket join runs once.
        cand = cache.persist(cand)
        # The level's frequent set feeds the output, the next level's
        # prune AND the occurrence filter. localCheckpoint (not bare
        # persist): the frame is support-thresholded (small by
        # construction) and each level's plan otherwise NESTS the whole
        # lineage of every previous level — the un-truncated v1 plan
        # string hit 1.6 MB / thousands of nested-Exchange repeats at
        # max_k=3, and Catalyst re-optimizes that tree for every
        # downstream action (guide §7.3: planning time on huge plans is
        # driver-side, single-threaded cost). The count doubles as the
        # broadcast gate on the already-materialized frame.
        sup = (
            cand.groupBy("items")
            .agg(F.count(F.lit(1)).alias("support"))
            .filter(F.col("support") >= min_support)
            .localCheckpoint()
        )
        n_sup = sup.count()
        lv = sup.select(
            F.array_join("items", "|").alias("itemset"),
            F.lit(k).cast("bigint").alias("k"),
            F.col("support").cast("bigint").alias("support"),
        )
        out = out.unionByName(lv)
        prev = sup.select("items")
        n_prev = n_sup
        # Occurrences of this level's FREQUENT itemsets, for extension.
        prev_occ = cand.join(_gate(prev, n_sup), "items").select(
            "b", "items"
        )
    return out
