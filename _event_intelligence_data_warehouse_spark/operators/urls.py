"""URL operators for web-corpus curation: canonicalization, host/domain
extraction, per-host statistics, and domain blocklist filtering — the
first gate of every web-scale pipeline (CCNet, C4, RefinedWeb all dedup
and filter by canonical URL / registered domain before touching text).

All pure column algebra (anchored regex chains in codegen, no UDFs), so
the canonical form is engine-portable and oracle-checkable. The domain
extraction is deliberately naive (last two host labels, no Public Suffix
List — "a.co.uk" folds to "co.uk"); a production deployment swaps in a
PSL lookup table joined by host suffix, which is a broadcast join at any
scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _schemeless(url: Column | str) -> Column:
    """scheme, fragment and query stripped — all anchored single
    replacements, identical semantics in Spark and DuckDB."""
    u = F.trim(_col(url))
    u = F.regexp_replace(u, _SCHEME_RE, "")
    u = F.regexp_replace(u, r"#.*$", "")
    return F.regexp_replace(u, r"\?.*$", "")


def url_host(url: Column | str) -> Column:
    """Lowercased host: schemeless head up to the first '/', port and
    leading 'www.' stripped."""
    h = F.lower(F.regexp_extract(_schemeless(url), r"^[^/]*", 0))
    h = F.regexp_replace(h, r":[0-9]+$", "")
    return F.regexp_replace(h, r"^www\.", "")


def url_domain(url: Column | str) -> Column:
    """Naive registered domain: the last two labels of the host (no
    PSL — see module docstring)."""
    return F.regexp_extract(url_host(url), r"[^.]+\.[^.]+$", 0)


def canonical_url(url: Column | str) -> Column:
    """Canonical dedup key: lowercased host (no www/port) + path with
    the trailing slash removed; scheme, query and fragment dropped —
    the equivalence CCNet-style URL dedup groups by."""
    path = F.regexp_extract(_schemeless(url), r"/.*$", 0)
    path = F.regexp_replace(path, r"/+$", "")
    return F.concat(url_host(url), path)


def canonicalize_urls(
    df: DataFrame, *, url_col: str = "url", id_col: str = "doc_id",
    blocked_domains: list[str] | None = None,
) -> DataFrame:
    """(doc_id, url_canon, host, domain, blocked): the per-document URL
    gate — canonical dedup key plus a blocklist verdict (domain
    membership in a literal list; at scale the blocklist broadcasts as
    a frame and this becomes a left-semi join)."""
    dom = url_domain(F.col(url_col))
    blocked = (
        dom.isin(list(blocked_domains)) if blocked_domains
        else F.lit(False)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        canonical_url(F.col(url_col)).alias("url_canon"),
        url_host(F.col(url_col)).alias("host"),
        dom.alias("domain"),
        blocked.cast("bigint").alias("blocked"),
    )


def host_stats(
    df: DataFrame, *, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(domain, n_docs, n_hosts): per-registered-domain corpus share —
    the concentration report that catches a single domain dominating a
    crawl. One aggregate; only (domain, host) strings shuffle."""
    return (
        df.select(
            url_domain(F.col(url_col)).alias("domain"),
            url_host(F.col(url_col)).alias("host"),
            F.col(id_col).alias("doc_id"),
        )
        .groupBy("domain")
        .agg(
            F.count_distinct("doc_id").cast("bigint").alias("n_docs"),
            F.count_distinct("host").cast("bigint").alias("n_hosts"),
        )
    )
