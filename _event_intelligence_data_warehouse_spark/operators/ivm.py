"""Incremental view maintenance with retractions.

The rollup cascade (plans/rollups.py) refreshes APPEND-ONLY aggregates:
new partials merge additively. CDC feeds are not append-only — an
upstream update arrives as (delete old row, insert new row), and a GDPR
erasure as bare deletes. This module maintains an aggregate view under
such a signed delta stream the way Flink/Materialize-style dataflow
engines do: every delta row carries an op sign (+1 insert, -1
retraction), the batch folds to ONE signed partial per group, and the
stored view absorbs it with pure addition — count and sums are abelian,
so a retraction is just a negative contribution, and a group whose
count reaches zero leaves the view entirely.

The abelian restriction is the contract, not a limitation to hide:
count / sum / avg-derivable measures retract exactly; min/max and
distinct counts do NOT (dropping the current max cannot reveal the
runner-up without history) and belong to the re-scan path
(plans/rollups.py recomputes touched partitions) or the sketch family.

Scale: the delta batch folds map-side to |touched groups| partial rows
before the single shuffle; the view join touches only those groups
(broadcast under AQE when the batch is narrow). Nothing ever re-reads
the base table — that is the point: at 100 TB the view's history is
unreachable on a per-batch budget, so correctness must come from the
delta algebra alone. Equality with a full recompute is enforced by the
ivm_retraction_roundtrip contract query's oracle.

Reference parity note: the reference warehouse rebuilds its KPI views
from scratch per run (scripts/run_pipeline.py); incremental maintenance
extends the engine for the scales where rebuilds are impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OP_COL = "_op"


def agg_base(
    rows: DataFrame, keys: list[str], sum_cols: dict[str, str]
) -> DataFrame:
    """Initial materialization of the maintained view: one row per key
    group with ``n_rows`` plus one summed measure per ``sum_cols``
    entry (output name -> input expression)."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    aggs += [
        F.sum(F.expr(expr)).cast("bigint").alias(name)
        for name, expr in sum_cols.items()
    ]
    return rows.groupBy(*keys).agg(*aggs)


def agg_delta_apply(
    view: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    *,
    op_col: str = OP_COL,
) -> DataFrame:
    """Fold a signed delta batch (op_col = +1 insert / -1 retraction,
    measure expressions evaluate to the ROW's values, not pre-signed)
    into the maintained view. ``sum_cols`` maps each view sum column to
    its delta-side expression — the same mapping agg_base used. Groups
    new to the view appear; groups whose count reaches zero disappear;
    a count driven NEGATIVE (retraction of a row that was never
    inserted — an upstream CDC bug) fails loudly rather than silently
    clamping."""
    sign = F.col(op_col).cast("bigint")
    partial = delta.groupBy(*keys).agg(
        F.sum(sign).cast("bigint").alias("_dn"),
        *[
            F.sum(sign * F.expr(expr).cast("bigint")).cast("bigint")
            .alias(f"_d_{name}")
            for name, expr in sum_cols.items()
        ],
    )
    # Validity is part of the algebra and stays LAZY (no extra job at
    # build time): a negative count — a retraction for a row the view
    # never absorbed, i.e. an upstream CDC bug — raises at execution
    # inside the expression instead of being silently clamped.
    n_new = (
        "coalesce(n_rows, CAST(0 AS BIGINT))"
        " + coalesce(_dn, CAST(0 AS BIGINT))"
    )
    merged = view.join(partial, keys, "full_outer").select(
        *keys,
        F.expr(
            f"CASE WHEN {n_new} >= 0 THEN CAST({n_new} AS BIGINT) "
            "ELSE CAST(raise_error('IVM retraction without a matching "
            "insert: upstream CDC emitted a delete the view never "
            "absorbed') AS BIGINT) END"
        ).alias("n_rows"),
        *[
            (
                F.coalesce(F.col(name), F.lit(0))
                + F.coalesce(F.col(f"_d_{name}"), F.lit(0))
            ).cast("bigint").alias(name)
            for name in sum_cols
        ],
    )
    return merged.filter(F.col("n_rows") > 0)
