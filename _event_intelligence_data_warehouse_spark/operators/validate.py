"""Declarative constraint validation — the reference's five hardcoded
quality checks (data_quality.sql) generalized into a reusable rules
engine: declare (name, kind, params) rules, get one violations row per
rule. Citation for parity: /root/reference data_quality.sql implements
exactly these kinds inline (NULL probes, duplicate grouping, accepted
status values, orphan FK probes); here they compose over any frame.

Scale design: every ROW-LOCAL rule (not_null, accepted_values, range)
plus every uniqueness rule compiles into ONE multi-aggregate pass over
the frame — a single scan no matter how many rules, exactly like the
warehouse's one-pass quality battery. Referential rules each cost one
anti-join against their (dimension-sized, broadcastable) reference —
the unavoidable probe — and union onto the same report. No UDFs, no
collects; the report is rules-sized.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str  # not_null | unique | accepted_values | range | referential
    params: dict = field(default_factory=dict)


def not_null(name: str, col: str) -> Rule:
    return Rule(name, "not_null", {"col": col})


def unique(name: str, cols: list[str]) -> Rule:
    return Rule(name, "unique", {"cols": cols})


def accepted_values(name: str, col: str, values: list) -> Rule:
    return Rule(name, "accepted_values", {"col": col, "values": values})


def value_range(name: str, col: str, lo, hi) -> Rule:
    return Rule(name, "range", {"col": col, "lo": lo, "hi": hi})


def referential(name: str, col: str, ref: DataFrame, ref_col: str) -> Rule:
    return Rule(name, "referential", {"col": col, "ref": ref,
                                      "ref_col": ref_col})


def _violation_expr(rule: Rule):
    p = rule.params
    if rule.kind == "not_null":
        return F.sum(
            F.when(F.col(p["col"]).isNull(), 1).otherwise(0)
        )
    if rule.kind == "accepted_values":
        ok = F.col(p["col"]).isin(p["values"])
        # NULL is not a value-set violation — not_null owns that rule.
        return F.sum(
            F.when(F.col(p["col"]).isNotNull() & ~ok, 1).otherwise(0)
        )
    if rule.kind == "range":
        c = F.col(p["col"])
        out = (c < F.lit(p["lo"])) | (c > F.lit(p["hi"]))
        return F.sum(F.when(c.isNotNull() & out, 1).otherwise(0))
    if rule.kind == "unique":
        # duplicate surplus: rows minus distinct keys — the same
        # one-aggregate folding the quality battery uses for A8.
        # Key identity is the column TUPLE (struct), never a string
        # concat: a delimited concat can collide when the delimiter
        # occurs in data, and concat_ws silently skips NULL components
        # so distinct NULL-bearing keys fold together. A key
        # participates only when every component is non-null, matching
        # the oracle's COUNT(col)/COUNT(DISTINCT col) NULL exclusion.
        valid = F.lit(True)
        for c in p["cols"]:
            valid = valid & F.col(c).isNotNull()
        key = F.when(valid, F.struct(*[F.col(c) for c in p["cols"]]))
        return F.count(key) - F.count_distinct(key)
    raise ValueError(f"unknown row-local rule kind {rule.kind!r}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Violations report: one row per rule — (rule_name, kind,
    n_violations, passed). Row-local and uniqueness rules share a single
    scan; referential rules add one anti-join each."""
    local = [r for r in rules if r.kind != "referential"]
    refs = [r for r in rules if r.kind == "referential"]

    parts: list[DataFrame] = []
    if local:
        agg = df.agg(
            *[
                _violation_expr(r).cast("bigint").alias(f"v{i}")
                for i, r in enumerate(local)
            ]
        )
        # unpivot the single aggregate row into one report row per rule
        stack = ", ".join(
            f"'{r.name}', '{r.kind}', v{i}" for i, r in enumerate(local)
        )
        parts.append(
            agg.select(
                F.expr(
                    f"stack({len(local)}, {stack}) AS "
                    "(rule_name, kind, n_violations)"
                )
            )
        )
    for r in refs:
        p = r.params
        orphans = (
            df.select(F.col(p["col"]))
            .filter(F.col(p["col"]).isNotNull())
            .join(
                p["ref"].select(
                    F.col(p["ref_col"]).alias(p["col"])
                ).distinct(),
                p["col"],
                "left_anti",
            )
            .agg(F.count("*").cast("bigint").alias("n_violations"))
            .select(
                F.lit(r.name).alias("rule_name"),
                F.lit("referential").alias("kind"),
                "n_violations",
            )
        )
        parts.append(orphans)
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out.withColumn("passed", F.col("n_violations") == 0)


def k_anonymity(
    df: DataFrame,
    quasi_identifiers: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns — the
    standard re-identification screen (Sweeney 2002) a governance layer
    runs before releasing or training on user-adjacent tables.

    Returns one row per equivalence class (distinct quasi-identifier
    combination): the QI columns, ``group_size``, ``is_k_anonymous``
    (group_size >= k), and ``risk_ppm`` = 1_000_000 div group_size (the
    re-identification probability 1/|class| in exact integer ppm).

    Scale shape: a single wordcount aggregate on the QI tuple — partial
    map-side combine, one shuffle on the composite key; no windows, no
    driver collection. Suppression/generalization decisions downstream
    consume this frame as a broadcast (classes, not rows)."""
    if not quasi_identifiers:
        raise ValueError("quasi_identifiers must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    return (
        df.groupBy(*quasi_identifiers)
        .agg(F.count("*").alias("group_size"))
        .select(
            *quasi_identifiers,
            F.col("group_size").cast("bigint").alias("group_size"),
            (F.col("group_size") >= k).alias("is_k_anonymous"),
            F.expr("1000000 div group_size").cast("bigint").alias("risk_ppm"),
        )
    )


def mask_columns(df: DataFrame, policies: dict[str, tuple]) -> DataFrame:
    """Column-level masking for governed reads — the release-side
    complement to k_anonymity's audit: apply a per-column policy and
    return the masked frame (serve it as a view; the raw table never
    leaves the warehouse). Policies:

    - ``("hash",)``          -> sha256 hex of the string value (stable
      join key across datasets without revealing the value)
    - ``("band", width)``    -> numeric generalization to
      floor(v / width) * width (k-anonymity-style coarsening)
    - ``("null",)``          -> full suppression
    - ``("keep_last", n)``   -> redact all but the last n characters

    All pure column algebra (codegen, engine-portable); unlisted
    columns pass through untouched."""
    out = []
    for c in df.columns:
        pol = policies.get(c)
        # df[c] (not F.col) binds the exact column whatever its name —
        # dots/spaces/backticks never parse as struct access or SQL
        col = df[c]
        if pol is None:
            out.append(col)
            continue
        kind = pol[0]
        if kind == "hash":
            out.append(F.sha2(col.cast("string"), 256).alias(c))
        elif kind == "band":
            width = int(pol[1])
            if width <= 0:
                raise ValueError(f"band width must be positive for {c!r}")
            out.append(
                (F.floor(col / F.lit(width)) * width)
                .cast("bigint").alias(c)
            )
        elif kind == "null":
            out.append(F.lit(None).cast(dict(df.dtypes)[c]).alias(c))
        elif kind == "keep_last":
            n = int(pol[1])
            if n < 1:
                raise ValueError(f"keep_last needs n >= 1 for {c!r}")
            s = col.cast("string")
            plen = F.greatest(F.length(s) - F.lit(n), F.lit(0))
            out.append(
                F.concat(
                    # (?s): redact newlines too — a multi-line value
                    # must not leak its line structure
                    F.regexp_replace(
                        s.substr(F.lit(1), plen), r"(?s).", "*"
                    ),
                    s.substr(plen + F.lit(1), F.lit(n)),
                ).alias(c)
            )
        else:
            raise ValueError(f"unknown mask policy {kind!r} for {c!r}")
    return df.select(*out)


def l_diversity(
    df: DataFrame,
    quasi_identifiers: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007): for
    each quasi-identifier equivalence class, the number of DISTINCT
    sensitive values it contains. k-anonymity alone fails the
    homogeneity attack — a class of 50 rows all sharing one diagnosis
    re-identifies the attribute, not the row; l-diversity is the
    companion gate.

    Returns one row per class: the QI columns, ``group_size``,
    ``distinct_sensitive``, ``is_l_diverse`` (distinct >= l) and
    ``dominant_ppm`` — the exact-integer ppm share of the most frequent
    sensitive value (the quantity recursive/entropy variants bound).

    Scale shape: one aggregate on (QI..., sensitive) then one on
    (QI...) — both map-side-combinable; the dominant share falls out of
    a max over the first aggregate, so the table is scanned once."""
    if not quasi_identifiers:
        raise ValueError("quasi_identifiers must be non-empty")
    if l < 1:
        raise ValueError("l must be >= 1")
    per_val = df.groupBy(*quasi_identifiers, sensitive_col).agg(
        F.count("*").alias("val_count")
    )
    return (
        per_val.groupBy(*quasi_identifiers)
        .agg(
            F.sum("val_count").alias("group_size"),
            F.count("*").alias("distinct_sensitive"),
            F.max("val_count").alias("max_val_count"),
        )
        .select(
            *quasi_identifiers,
            F.col("group_size").cast("bigint").alias("group_size"),
            F.col("distinct_sensitive").cast("bigint").alias(
                "distinct_sensitive"
            ),
            (F.col("distinct_sensitive") >= l).alias("is_l_diverse"),
            F.expr(
                "CAST(max_val_count * 1000000 div group_size AS BIGINT)"
            ).alias("dominant_ppm"),
        )
    )


def observe_metrics(df: DataFrame, name: str, metrics: dict[str, "F.Column"]):
    """In-flight pipeline metrics via ``df.observe`` (Spark's
    Observation API): attach named aggregate expressions to a frame and
    read them AFTER an action, from the SAME pass the action already
    paid for — the zero-extra-scan alternative to running a separate
    quality aggregate per write (the reference's data_quality.sql runs
    its checks as extra queries; this folds row-count/null-count/range
    telemetry into the write itself).

    Returns (observed_df, observation). Trigger any action on
    observed_df (write, count, collect), then read
    ``observation.get`` — a dict of the metric values for exactly the
    rows that action processed. Works for batch frames; for streams use
    the same expressions per micro-batch via foreachBatch.

    Scale note: metrics are ordinary aggregate expressions evaluated
    inside the existing job's tasks (accumulator-style merge on the
    driver) — no extra scan, no shuffle, no driver collection of data
    rows.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[
        expr.alias(alias) for alias, expr in metrics.items()
    ])
    return observed, obs
