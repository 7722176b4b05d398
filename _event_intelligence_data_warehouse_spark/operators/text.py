"""Text-analysis operators for LLM-data pipelines (BASELINE.json north
star): tokenization, language ID, quality scoring, fingerprinting.

Everything is native column algebra — no Python UDFs — so the hot path
stays inside whole-stage codegen and scales linearly with executors. The
token hash used across dedup/minhash is the first 8 hex chars of md5
(``conv(substr(md5(t),1,8),16,10)``): md5 is bit-identical across engines,
which keeps every derived operator oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny, deliberately-curated stopword sets: enough signal for a coarse
# n-gram/stopword language vote, small enough to live in the plan as
# literals (broadcast implicitly with the task binary).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "as", "his", "on", "be", "at", "by", "not", "this", "are"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht",
           "ein", "eine", "auf", "für", "des", "im", "dem", "sich", "auch",
           "als", "zu"],
    "fr": ["le", "la", "les", "et", "de", "des", "est", "un", "une", "du",
           "que", "qui", "dans", "pour", "pas", "sur", "avec", "au", "il",
           "ne"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "en", "un", "una",
           "es", "por", "con", "no", "para", "del", "se", "su", "al", "lo"],
}
ENGLISH_STOPWORDS = STOPWORDS["en"]

# Word-ish tokens for the BPE-style count: runs of letters, runs of digits,
# or single punctuation — a cheap proxy for subword tokenizers.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, lowercased, empties removed."""
    t = F.split(F.lower(F.trim(_col(text))), r"\s+")
    return F.filter(t, lambda x: x != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Count of BPE-ish tokens (letter runs / digit runs / punct chars)."""
    return F.regexp_count(_col(text), F.lit(BPE_ISH_RE)).cast("long")


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are ASCII punctuation."""
    t = _col(text)
    n = F.length(t)
    punct = n - F.length(F.regexp_replace(t, r"[!-/:-@\[-`{-~]", ""))
    return F.when(n > 0, punct.cast("double") / n.cast("double")).otherwise(0.0)


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(0.0)


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length sweet-spot, moderate
    punctuation, presence of function words — the classic cheap pre-filter
    before expensive model-based scoring."""
    t = _col(text)
    n_tok = token_count(t).cast("double")
    len_score = F.least(n_tok / 20.0, F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(t) * 4.0)
    sw = stopword_ratio(t)
    sw_score = F.least(sw * 5.0, F.lit(1.0))
    return F.round(
        (len_score * 0.4 + punct_pen * 0.3 + sw_score * 0.3).cast(
            "decimal(10,6)"
        ),
        4,
    ).cast("double")


def cjk_ratio(text: Column | str) -> Column:
    t = _col(text)
    n = F.length(t)
    cjk = F.length(F.regexp_replace(t, r"[^一-鿿]", ""))
    return F.when(n > 0, cjk.cast("double") / n.cast("double")).otherwise(0.0)


def lang_id(text: Column | str) -> Column:
    """Coarse language ID: CJK character ratio decides 'zh'; otherwise a
    stopword vote among {en, de, fr, es} with a deterministic tie-break
    (alphabetical on ties, 'und' = undetermined when nothing matches)."""
    toks = F.array_distinct(tokens(text))

    def _vote(code: str) -> Column:
        # NB: closure factory, not a default-arg lambda — F.filter treats a
        # two-parameter lambda as (element, index).
        sw = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        return F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))

    votes = {code: _vote(code) for code in ("de", "en", "es", "fr")}
    best = F.greatest(*votes.values())
    vote_pick = (
        F.when(best <= 0, F.lit("und"))
        # alphabetical preference on ties: de, en, es, fr
        .when(votes["de"] == best, "de")
        .when(votes["en"] == best, "en")
        .when(votes["es"] == best, "es")
        .otherwise("fr")
    )
    return F.when(cjk_ratio(text) > 0.2, F.lit("zh")).otherwise(vote_pick)


def normalized_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (The rolling-hash/shingle variant lives in operators.dedup as minhash.)"""
    return F.md5(normalized_text(text))


def _spread_cpu_dense(df: DataFrame) -> DataFrame:
    """Rebalance a small-file scan across the session's cores before a
    CPU-dense per-document projection. Parquet compresses text ~10x,
    so a few-MB documents file arrives as 1-2 scan tasks while the
    hashing work behind it (one md5 per character k-gram in winnowing)
    is minutes of single-core time — the r8 sf1 probe measured the
    same plan at 47s on the scan's 2 tasks vs 9.5s spread over 32.
    Only repartitions UP to the session's parallelism: a 100 TB scan
    already carries thousands of tasks and must never be shuffled for
    this, so an already-parallel input passes through untouched.
    Streaming frames pass through untouched too (no .rdd on a
    streaming plan; micro-batch sizing is the stream's own knob)."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def winnowing_fingerprints(
    df: DataFrame,
    *,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    '03): hash every character k-gram of the normalized text, then keep the
    minimum hash of each window of ``w`` consecutive k-grams. Guarantees a
    shared fingerprint for any match of length >= k + w - 1 while storing
    ~2/(w+1) of the gram hashes.

    Output: (doc_id, fingerprint) — distinct selected hashes per document.
    Pure column algebra (array higher-order functions); docs shorter than
    one window contribute their single minimum gram hash."""
    nt = normalized_text(F.col(text_col))
    grams = F.expr(
        f"transform(sequence(1, length(nt) - {k - 1}), "
        f"i -> cast(conv(substr(md5(substring(nt, i, {k})), 1, 8), 16, 10) "
        f"as bigint))"
    )
    selected = F.expr(
        f"case when size(gh) >= {w} then "
        f"array_distinct(transform(sequence(1, size(gh) - {w - 1}), "
        f"j -> array_min(slice(gh, j, {w})))) "
        f"else array(array_min(gh)) end"
    )
    # No row-level distinct needed: ``selected`` is already array_distinct
    # per document, so (doc_id, fingerprint) rows are unique by
    # construction — a trailing .distinct() would add a full shuffle of
    # every fingerprint for nothing.
    return (
        _spread_cpu_dense(
            df.select(F.col(id_col).alias("doc_id"), nt.alias("nt"))
            .filter(F.length("nt") >= k)
        )
        .select("doc_id", grams.alias("gh"))
        .select("doc_id", F.explode(selected).alias("fingerprint"))
    )


def token_hash(tok: Column | str) -> Column:
    """32-bit token hash from the md5 prefix — engine-portable (see module
    docstring)."""
    return F.conv(F.substring(F.md5(_col(tok)), 1, 8), 16, 10).cast("long")


def text_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per document with the standard metric battery."""
    t = F.col(text_col)
    return df.select(
        *[c for c in df.columns if c != text_col],
        F.length(t).cast("long").alias("n_chars"),
        token_count(t).cast("long").alias("n_tokens"),
        bpe_ish_token_count(t).cast("long").alias("n_bpe_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio_en"),
        quality_score(t).alias("quality_score"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_ratio(num: Column, den: Column) -> Column:
    return F.when(
        den > 0, num.cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))


def _gopher_metrics(t: Column) -> dict[str, Column]:
    """The raw per-document Gopher counters as named Columns — shared
    by the metrics frame and the inline pass-filter so the two can
    never drift."""
    tk = tokens(t)
    lines = F.split(t, "\n")
    n_words = F.size(tk).cast("bigint")
    tot_len = F.aggregate(
        F.transform(tk, F.length), F.lit(0).cast("bigint"),
        lambda acc, x: acc + x.cast("bigint"),
    )
    return {
        "n_words": n_words,
        "tot_len": tot_len,
        "mean_word_len": F.when(
            n_words > 0, tot_len.cast("double") / n_words.cast("double")
        ),
        "alpha_words": F.size(
            F.filter(tk, lambda x: x.rlike("[a-z]"))
        ).cast("bigint"),
        "n_stop": F.size(
            F.filter(
                F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS]),
                lambda w: F.array_contains(tk, w),
            )
        ).cast("bigint"),
        "n_hash": (
            F.length(t) - F.length(F.regexp_replace(t, "#", ""))
        ).cast("bigint"),
        "n_ellipsis": F.regexp_count(t, F.lit(r"\.\.\.")).cast("bigint"),
        "n_lines": F.size(lines).cast("bigint"),
        "bullet_lines": F.size(
            F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]"))
        ).cast("bigint"),
        "ellipsis_lines": F.size(
            F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"))
        ).cast("bigint"),
    }


def gopher_structural_pass(text: Column | str) -> Column:
    """Boolean column: the six STRUCTURAL Gopher rules (word count,
    mean word length, symbol ratio, bullet lines, ellipsis lines,
    alphabetic words) as one inline predicate — the stopword-presence
    rule is language-specific and configured separately (gate on
    ``n_required_stopwords`` from :func:`gopher_quality_filters` for
    English corpora). Being a pure column expression, the gate composes
    into any plan with zero joins — filter pushdown reaches the scan."""
    m = _gopher_metrics(_col(text))
    r = _gopher_ratio
    return (
        F.coalesce(
            (m["n_words"] >= 50) & (m["n_words"] <= 100_000), F.lit(False)
        )
        & F.coalesce(
            (m["mean_word_len"] >= 3.0) & (m["mean_word_len"] <= 10.0),
            F.lit(False),
        )
        & F.coalesce(
            r(m["n_hash"] + m["n_ellipsis"], m["n_words"]) <= 0.1,
            F.lit(False),
        )
        & F.coalesce(
            r(m["bullet_lines"], m["n_lines"]) <= 0.9, F.lit(False)
        )
        & F.coalesce(
            r(m["ellipsis_lines"], m["n_lines"]) <= 0.3, F.lit(False)
        )
        & F.coalesce(
            r(m["alpha_words"], m["n_words"]) >= 0.8, F.lit(False)
        )
    )


def gopher_quality_filters(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The Gopher rule battery (Rae et al. 2021, arXiv:2112.11446 —
    also the MassiveText/RedPajama/Dolma pre-filter): per-document
    structural metrics and the seven published pass/fail rules. Pure
    column algebra over one scan — zero shuffles, zero UDFs — so the
    filter runs at wire speed ahead of any model-based scorer.

    Metrics and rules (doc fails -> excluded from training mix):
      1. 50 <= word count <= 100,000
      2. 3 <= mean word length <= 10
      3. symbol-to-word ratio (# or ...) <= 0.1
      4. <= 90% of lines start with a bullet
      5. <= 30% of lines end with an ellipsis
      6. >= 80% of words contain an alphabetic character
      7. >= 2 distinct required stopwords present

    Ratios are exact-integer divisions cast to double, so the output is
    engine-stable for oracle comparison."""
    m = _gopher_metrics(F.col(text_col))
    n_words = m["n_words"]
    n_stop = m["n_stop"]
    ratio = _gopher_ratio
    mean_wl = m["mean_word_len"]
    alpha_words = m["alpha_words"]
    n_hash = m["n_hash"]
    n_ellipsis = m["n_ellipsis"]
    n_lines = m["n_lines"]
    bullet_lines = m["bullet_lines"]
    ellipsis_lines = m["ellipsis_lines"]
    out = df.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        ratio(n_hash + n_ellipsis, n_words).alias("symbol_word_ratio"),
        ratio(bullet_lines, n_lines).alias("bullet_line_ratio"),
        ratio(ellipsis_lines, n_lines).alias("ellipsis_line_ratio"),
        ratio(alpha_words, n_words).alias("alpha_word_ratio"),
        n_stop.alias("n_required_stopwords"),
    )
    rules = {
        "pass_word_count": (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000),
        "pass_mean_word_len": (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0),
        "pass_symbol_ratio": F.col("symbol_word_ratio") <= 0.1,
        "pass_bullet_lines": F.col("bullet_line_ratio") <= 0.9,
        "pass_ellipsis_lines": F.col("ellipsis_line_ratio") <= 0.3,
        "pass_alpha_words": F.col("alpha_word_ratio") >= 0.8,
        "pass_stopwords": F.col("n_required_stopwords") >= 2,
    }
    for name, cond in rules.items():
        out = out.withColumn(name, F.coalesce(cond, F.lit(False)))
    return out.withColumn(
        "pass_gopher",
        F.expr(" AND ".join(rules)),
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, term, tf, doc_freq,
    rank), score = tf * (ln((N+1)/(df+1)) + 1) (smoothed idf).

    The contract output is the RANK (plus the exact integer tf/df), not
    the float score — ln() is libm-dependent in the last ulp, but equal
    (tf, df) pairs score identically on every engine and distinct pairs
    are separated far beyond ulp, so the ordering is stable.

    Scale shape: wordcount — shuffles on (doc, term) then term; the
    doc-frequency join shuffles on term (a 100 TB vocabulary doesn't
    broadcast); the top-k window shuffles on doc. All partial-aggregated
    map-side first; the raw text never moves after tokenize."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    n = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n_docs") + 1) / (F.col("doc_freq") + 1)) + 1),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            "doc_freq",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def repetition_metrics(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word_frac: float = 0.2,
    max_bigram_frac: float = 0.18,
) -> DataFrame:
    """Gopher-style repetition screens per document: the fraction of
    tokens taken by the single most frequent word, and of bigrams by the
    most frequent bigram, plus the keep/drop verdict under the given
    ceilings. High values indicate boilerplate/spam — a standard
    pre-training quality gate.

    Fractions are exact-integer divisions in double (no rounding step
    needed for cross-engine equality). Wordcount-shaped shuffles only."""
    d = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    words = d.select("doc_id", F.explode("toks").alias("w"))
    wstats = (
        words.groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_w"), F.sum("c").alias("n_w"))
    )
    bigram_expr = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1), "
            "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    bstats = (
        d.select("doc_id", F.explode(bigram_expr).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bg"), F.sum("c").alias("n_bg"))
    )
    base = (
        d.select("doc_id", F.size("toks").alias("n_tokens"))
        .join(wstats, "doc_id", "left")
        .join(bstats, "doc_id", "left")
    )
    twf = F.when(
        F.col("n_w") > 0,
        F.col("max_w").cast("double") / F.col("n_w").cast("double"),
    ).otherwise(0.0)
    tbf = F.when(
        F.col("n_bg") > 0,
        F.col("max_bg").cast("double") / F.col("n_bg").cast("double"),
    ).otherwise(0.0)
    return base.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        twf.alias("top_word_frac"),
        tbf.alias("top_bigram_frac"),
        ((twf <= F.lit(max_word_frac)) & (tbf <= F.lit(max_bigram_frac))).alias(
            "keep"
        ),
    )


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping token windows — the context-
    length preprocessing step of a training/RAG pipeline. One output row
    per chunk: (doc_id, chunk_no, start_token, n_chunk_tokens,
    chunk_hash), where chunk_hash is the md5 of the space-joined window
    (the payload stays derivable; the hash keeps the contract compact).

    Pure projection + explode: no shuffle anywhere, scales with scan
    bandwidth. Deterministic: windows start at 1, step chunk-overlap."""
    if chunk_tokens <= overlap:
        raise ValueError("chunk_tokens must exceed overlap")
    step = chunk_tokens - overlap
    d = df.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks"))
    starts = F.expr(
        f"filter(sequence(1, greatest(size(toks), 1), {step}), "
        f"s -> s <= size(toks))"
    )
    chunk = F.expr(f"slice(toks, start, {chunk_tokens})")
    return (
        d.filter(F.size("toks") > 0)
        .select("doc_id", "toks", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (((F.col("start") - 1) / step).cast("long")).alias("chunk_no"),
            F.col("start").cast("long").alias("start_token"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
    )


# ASCII-only PII patterns, deliberately regex-dialect-portable (same
# semantics under Java regex and RE2): no lookaround, no unicode classes.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def redact_pii(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Detect and redact the common machine-recognizable PII shapes
    (emails, IPv4s, dashed phone numbers) — the compliance scrub every
    training-data pipeline runs before anything ships. Outputs per-doc
    match counts plus the md5 of the redacted text (redaction applied
    email -> ip -> phone, all-occurrence).

    Stateless projection: counts and replacement run in codegen, no
    Python, no shuffle."""
    t = _col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
    )


def winnowing_overlap_pairs(
    df: DataFrame,
    *,
    min_shared: int = 3,
    max_df: int | None = 10,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document pairs sharing >= min_shared winnowing fingerprints —
    the retrieval step fingerprints exist for (MOSS-style overlap /
    plagiarism detection). The fingerprint equi-self-join only meets
    documents that actually share a selected hash; overlap counts come
    from one group aggregate over the join.

    ``max_df`` drops fingerprints present in more than that many
    documents BEFORE the self-join. This is simultaneously the signal
    fix and the scale fix: boilerplate/template hashes say nothing
    about pairwise copying, and each hot fingerprint emits df² join
    rows (measured: the template-heavy synthetic corpus at sf0.1 turns
    the unfiltered join near-quadratic, 160+ s; with the cap the pair
    space is bounded by max_df² per fingerprint — linear in the index).
    The same move as the Jaccard prefix filter: hot keys can't
    discriminate, so never join on them."""
    from _event_intelligence_data_warehouse_spark import cache

    # Persist the selected fingerprints: the winnowing projection hashes
    # EVERY character k-gram (an md5 per gram), and this frame feeds the
    # df-filter plus both self-join sides — uncached, that lineage runs
    # three times (measured 3x the whole operator's cost at sf0.1). The
    # cached frame is just (doc_id, long), ~2/(w+1) of gram count.
    fp = cache.persist(
        winnowing_fingerprints(df, k=k, w=w, text_col=text_col, id_col=id_col)
    )
    if max_df is not None:
        rare = (
            fp.groupBy("fingerprint")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("fingerprint")
        )
        fp = fp.join(rare, "fingerprint")
    a = fp.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = fp.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
    )


def word_ngram_hashes(
    df: DataFrame,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, gram_hash): DISTINCT word n-gram hashes per document.
    Grams are space-joined lowercase whitespace tokens hashed through the
    engine's md5-prefix scheme (module docstring) — engine-portable, so
    derived operators stay oracle-checkable. Pure projection + explode
    (no data-proportional shuffle); small-file scans are spread across
    cores first — the md5-per-position work behind a 1-2 task
    compressed scan is the starvation pattern the r8 sf1 probe
    measured, see :func:`_spread_cpu_dense`. array_distinct runs
    per-row so no global distinct is needed."""
    d = _spread_cpu_dense(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    ).select("doc_id", tokens(text_col).alias("toks"))
    grams = F.expr(
        f"array_distinct(transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> cast(conv(substr(md5(array_join(slice(toks, i, {n}), ' ')), "
        f"1, 8), 16, 10) as bigint)))"
    )
    return (
        d.filter(F.size("toks") >= n)
        .select("doc_id", F.explode(grams).alias("gram_hash"))
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 3,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least
    ``min_shared`` distinct word n-grams with a benchmark document — the
    screen a training pipeline runs before any eval set can be trusted
    (the n-gram-overlap rule used by GPT-3/PaLM-style decontamination;
    production n is typically 8-13, tuned to the corpus).

    Output: (doc_id, bench_id, n_shared) per contaminated pair; join
    against the corpus to drop or audit. Scale: only 8-byte gram hashes
    ever join — text never moves. The benchmark index is bounded by the
    BENCHMARK size (MBs, by definition of an eval suite), not the corpus,
    so it broadcasts and the corpus grams stream past it in one pass with
    no shuffle of the corpus side; set ``broadcast_benchmark=False`` for
    an oversized benchmark and the same plan runs as a shuffled hash
    join. Both gram sides are per-doc distinct, so COUNT(*) per pair IS
    the distinct shared-gram count."""
    cg = word_ngram_hashes(corpus, n=n, text_col=text_col, id_col=id_col)
    bg = word_ngram_hashes(
        benchmark, n=n, text_col=text_col, id_col=id_col
    ).withColumnRenamed("doc_id", "bench_id")
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    return (
        cg.join(bg, "gram_hash")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def rouge_recall(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 2,
    min_recall_ppm: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """GRADED contamination scoring: set-ROUGE-n recall of each
    benchmark document against each corpus document — the fraction of
    the benchmark's distinct word n-grams the corpus document covers,
    in exact ppm (floor(1e6 * shared / bench_total), pure integer
    division so both engines agree bit-for-bit). Where
    :func:`ngram_contamination` answers the binary "shares >= k grams",
    this is the severity ranking decontamination reports actually
    publish (GPT-4 / Llama technical-report style "n-gram overlap %"
    tables): recall ~1e6 means the eval doc is wholesale contained in
    the training doc; small values are incidental phrase overlap.

    Output: (doc_id, bench_id, shared_ngrams, bench_ngrams,
    rouge_recall_ppm), pairs below ``min_recall_ppm`` dropped. Set
    semantics (distinct grams) on both sides, the standard
    decontamination variant — multiplicity-weighted ROUGE needs the
    full gram multiset and is a different (bigger) join.

    Scale: identical shape to ngram_contamination — only 8-byte gram
    hashes join, the benchmark index is bounded by the eval suite and
    broadcasts, the corpus streams past it once; per-bench gram totals
    are a tiny aggregate joined back onto the (sparse) pair frame."""
    cg = word_ngram_hashes(corpus, n=n, text_col=text_col, id_col=id_col)
    bg = word_ngram_hashes(
        benchmark, n=n, text_col=text_col, id_col=id_col
    ).withColumnRenamed("doc_id", "bench_id")
    totals = bg.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_ngrams")
    )
    if broadcast_benchmark:
        bg = F.broadcast(bg)
        totals = F.broadcast(totals)
    return (
        cg.join(bg, "gram_hash")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .join(totals, "bench_id")
        .select(
            "doc_id", "bench_id",
            F.col("shared_ngrams").cast("bigint").alias("shared_ngrams"),
            F.col("bench_ngrams").cast("bigint").alias("bench_ngrams"),
            F.expr("(1000000 * shared_ngrams) div bench_ngrams")
            .cast("bigint").alias("rouge_recall_ppm"),
        )
        .filter(F.col("rouge_recall_ppm") >= min_recall_ppm)
    )


def token_ngram_hashes(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable_hash: bool = True,
    fold: str = "inline",
) -> DataFrame:
    """(doc_id, gram_hash): DISTINCT n-grams over the document's BPE
    TOKEN stream — the tokenizer-level analogue of
    :func:`word_ngram_hashes`. The token stream is the in-order
    concatenation of each [a-z]+ word's merge-fold output (the same
    greedy apply as :func:`bpe_encode_stats`), so grams span word
    boundaries exactly as they do in the model's context window;
    grams are space-joined token runs hashed through the engine's
    md5-prefix scheme (engine-portable, oracle-checkable).

    Scale: with ``fold="inline"`` everything up to the gram explode is
    ROW-LOCAL column algebra — the word split, every merge fold, the
    flatten, and the per-row array_distinct all run inside the
    projection, so the plan is scan → project → explode with zero
    shuffles; fold cost is word OCCURRENCES x merges per row.

    ``fold`` picks where the merge folds run (r11 verdict item 3 made
    the fast configuration the benched production default):

    - ``"inline"``: fold every word occurrence in-place. Zero
      shuffles, but occurrences x merges fold cost — the right shape
      for a short fixture merge list, unusable at a production 30k
      merge vocabulary.
    - ``"row_vocab"``: fold each DISTINCT word once PER ROW
      (map_from_arrays over array_distinct(words)), then rebuild the
      stream by row-local map lookup. Still zero shuffles and the
      fold cost drops by the within-document repetition factor — BUT
      Spark's MapData is array-backed, so each element_at lookup is a
      LINEAR scan: the rebuild is O(words x distinct_words) per row,
      which measured ~10x SLOWER than inline at sf0.1 on this
      corpus's long documents. Correct (pinned by tests) and viable
      only for short-document workloads; production uses vocab_join.
    - ``"vocab_join"``: collapse the corpus to its global VOCABULARY
      (the bpe_encode_stats trick), fold each distinct word once per
      CORPUS, broadcast the word→tokens table back onto the
      positional word explode and reassemble per document. Fold cost
      is \\|vocab\\| x merges — the only viable shape at 30k merges —
      at the price of one tokenized-content shuffle (the groupBy
      reassembly), the same materialization a production tokenize
      stage performs anyway.

    ``portable_hash=True`` (the oracle-checked contract) hashes grams
    through the engine's md5-prefix scheme so a non-Spark engine can
    reproduce the exact hash values. A deployment that only needs
    pair-set semantics — contamination joins never read the hash value
    itself — sets ``portable_hash=False`` for xxhash64
    (JVM-intrinsic; measured ~20% off the end-to-end sf0.1
    decontamination, more when grams dominate the fold); the
    resulting PAIR SET is identical up to hash collisions, pinned by
    tests/test_round11_ops.py."""
    apply_expr = _bpe_apply_sql("split(wtk, '')", merges, "tk")
    base = _spread_cpu_dense(
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    )
    words_expr = f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"
    if fold == "inline":
        d = base.select(
            "doc_id",
            F.expr(
                f"flatten(transform({words_expr}, "
                f"wtk -> {apply_expr}))"
            ).alias("toks"),
        )
    elif fold == "row_vocab":
        d = (
            base.select(
                "doc_id", F.expr(words_expr).alias("ws")
            )
            .select(
                "doc_id", "ws",
                F.expr("array_distinct(ws)").alias("dws"),
            )
            .select(
                "doc_id", "ws",
                F.expr(
                    f"map_from_arrays(dws, "
                    f"transform(dws, wtk -> {apply_expr}))"
                ).alias("wm"),
            )
            .select(
                "doc_id",
                F.expr(
                    "flatten(transform(ws, w -> element_at(wm, w)))"
                ).alias("toks"),
            )
        )
    elif fold == "vocab_join":
        ex = base.select(
            "doc_id",
            F.posexplode(F.expr(words_expr)).alias("pos", "wtk"),
        )
        vocab = (
            ex.select("wtk").distinct()
            .select("wtk", F.expr(apply_expr).alias("wt"))
        )
        d = (
            ex.join(F.broadcast(vocab), "wtk")
            .groupBy("doc_id")
            .agg(
                F.expr(
                    "flatten(transform(array_sort("
                    "collect_list(struct(pos, wt))), s -> s.wt))"
                ).alias("toks")
            )
        )
    else:
        raise ValueError(f"unknown fold mode: {fold!r}")
    gram_str = f"array_join(slice(toks, i, {n}), ' ')"
    gram_hash = (
        f"cast(conv(substr(md5({gram_str}), 1, 8), 16, 10) as bigint)"
        if portable_hash
        else f"xxhash64({gram_str})"
    )
    grams = F.expr(
        f"array_distinct(transform(sequence(1, size(toks) - {n - 1}), "
        f"i -> {gram_hash}))"
    )
    return (
        d.filter(F.size("toks") >= n)
        .select("doc_id", F.explode(grams).alias("gram_hash"))
    )


def token_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    merges: list[tuple[str, str]],
    *,
    n: int = 4,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
    portable_hash: bool = True,
    fold: str = "inline",
) -> DataFrame:
    """TOKEN-level benchmark decontamination: corpus documents sharing
    at least ``min_shared`` distinct BPE-token n-grams with a benchmark
    document. Real eval-leak policies operate on TOKENIZER output, not
    raw words (the Llama/GPT-4-style "n-token overlap" rule): token
    grams see through whitespace and casing noise that perturbs word
    grams, and the gram length is measured in the same units as the
    model's context. Composition of :func:`token_ngram_hashes` with
    the :func:`ngram_contamination` join shape.

    Output: (doc_id, bench_id, n_shared) per contaminated pair. Scale:
    identical to ngram_contamination — only 8-byte gram hashes join,
    the benchmark index is bounded by the eval suite and broadcasts,
    the corpus streams past it in one pass; both gram sides are
    per-doc distinct so COUNT(*) per pair IS the distinct shared-gram
    count."""
    cg = token_ngram_hashes(
        corpus, merges, n=n, text_col=text_col, id_col=id_col,
        portable_hash=portable_hash, fold=fold,
    )
    bg = token_ngram_hashes(
        benchmark, merges, n=n, text_col=text_col, id_col=id_col,
        portable_hash=portable_hash, fold=fold,
    ).withColumnRenamed("doc_id", "bench_id")
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    return (
        cg.join(bg, "gram_hash")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    *,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-sequence packing layout (GPT-style concat-then-chunk):
    within each shard, concatenate documents in deterministic id order
    and cut the token stream into fixed ``seq_len`` sequences; report
    where each document lands. Output: (doc_id, shard, n_tokens,
    start_token, bin_id, bin_offset) with start_token the document's
    0-based offset in its shard's stream, bin_id = start div seq_len,
    bin_offset = start mod seq_len — everything a downstream tokenizer
    shard-writer needs to materialize the packed batches.

    Scale: packing is sequential BY CONSTRUCTION (each offset depends on
    every predecessor), so the parallel unit is the shard — one running-
    sum window per shard key, shards pack independently and in parallel,
    and no global ordering pass exists. Pick the shard column so shards
    are plentiful (source, date, hash bucket); skewed shards bound
    parallelism exactly as they would any per-shard job."""
    from pyspark.sql.window import Window

    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(shard_col).cast("string").alias("shard"),
        token_count(text_col).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint")
    return (
        d.withColumn("start_token", start)
        .withColumn(
            "bin_id", F.expr(f"start_token div {int(seq_len)}").cast("bigint")
        )
        .withColumn(
            "bin_offset",
            F.pmod(F.col("start_token"), F.lit(int(seq_len))).cast("bigint"),
        )
    )


def pack_loss_mask_spans(
    df: DataFrame,
    seq_len: int,
    *,
    mask_col: str = "loss_mask",
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-level, dedup-aware loss-mask layout on top of
    :func:`pack_sequences`: each document's packed token range
    [start_token, start_token + n_tokens) is cut at the ``seq_len``
    bin boundaries into per-bin SPANS, and every span carries the
    document's loss mask (1 = train on these tokens, 0 = present in
    the stream but excluded from the loss — the duplicate-retention
    trick: keep duplicate bytes for context, zero their gradient so
    the model never overweights them). ``df`` must already carry a
    0/1 ``mask_col`` (e.g. doc_id == canonical_id from exact_dedup).

    Output: (doc_id, shard, bin_id, span_start, span_len, loss_mask)
    — one row per (document, bin) intersection, which is everything a
    shard-writer needs to materialize per-sequence loss-mask tensors:
    for bin b, the tokens [span_start, span_start + span_len) within
    the sequence take the document's mask. Documents with zero tokens
    occupy no span and emit no row.

    Scale: the layout inherits pack_sequences' per-shard running-sum
    window (the only shuffle); the span cut is a codegen'd
    explode(sequence(bin_lo, bin_hi)) whose fan-out per document is
    n_tokens/seq_len + 1 — output-proportional, never data-squared.
    No UDFs, no driver state."""
    L = int(seq_len)
    base = pack_sequences(
        df, L, shard_col=shard_col, text_col=text_col, id_col=id_col
    ).join(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(mask_col).cast("bigint").alias("_mask"),
        ),
        "doc_id",
    )
    end = F.col("start_token") + F.col("n_tokens")
    bin_lo = F.expr(f"start_token div {L}")
    bin_hi = F.expr(f"(start_token + n_tokens - 1) div {L}")
    return (
        base.filter(F.col("n_tokens") >= 1)
        .select(
            "doc_id",
            "shard",
            "start_token",
            "n_tokens",
            "_mask",
            F.explode(F.sequence(bin_lo, bin_hi)).alias("bin_id"),
        )
        .select(
            "doc_id",
            "shard",
            F.col("bin_id").cast("bigint").alias("bin_id"),
            (
                F.greatest(F.col("start_token"), F.col("bin_id") * L)
                - F.col("bin_id") * L
            ).cast("bigint").alias("span_start"),
            (
                F.least(end, (F.col("bin_id") + 1) * L)
                - F.greatest(F.col("start_token"), F.col("bin_id") * L)
            ).cast("bigint").alias("span_len"),
            F.col("_mask").alias("loss_mask"),
        )
    )


def c4_line_filter(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text",
    min_sentences: int = 5,
) -> DataFrame:
    """C4's line- and page-level cleaning rules (Raffel et al. 2020,
    arXiv:1910.10683 §2.2) as one shuffle-free pass — the row-local
    complement to CCNet's corpus-frequency boilerplate removal:

    - keep only lines ending in terminal punctuation (. ! ? ");
    - drop lines with fewer than 3 words;
    - drop lines containing the word "javascript" (cookie/JS warnings);
    - page flags: curly brace (code), "lorem ipsum" (placeholder), and
      a sentence count; keep_doc = no flags and >= ``min_sentences``.

    Returns (doc_id, clean_text, n_lines, n_removed, has_brace,
    has_lorem, n_sentences, keep_doc). Pure array algebra over the
    line split — zero shuffles, zero UDFs."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    keep_line = (
        lambda l: F.rtrim(l).rlike('[.!?"]$')
        & (
            F.size(
                F.filter(
                    F.split(F.trim(l), r"\s+"), lambda x: x != ""
                )
            )
            >= 3
        )
        & ~F.lower(l).contains("javascript")
    )
    kept = F.filter(lines, keep_line)
    clean = F.concat_ws("\n", kept)
    n_lines = F.size(lines).cast("bigint")
    n_removed = (F.size(lines) - F.size(kept)).cast("bigint")
    has_brace = F.col("clean_text").contains("{")
    has_lorem = F.lower(F.col("clean_text")).contains("lorem ipsum")
    n_sent = F.regexp_count(
        F.col("clean_text"), F.lit(r"[.!?]")
    ).cast("bigint")
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            clean.alias("clean_text"),
            n_lines.alias("n_lines"),
            n_removed.alias("n_removed"),
        )
        .withColumn("has_brace", has_brace)
        .withColumn("has_lorem", has_lorem)
        .withColumn("n_sentences", n_sent)
        .withColumn(
            "keep_doc",
            ~F.col("has_brace")
            & ~F.col("has_lorem")
            & (F.col("n_sentences") >= min_sentences),
        )
    )


def boilerplate_line_filter(
    df: DataFrame,
    *,
    min_df: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style boilerplate removal (Wenzek et al. 2020): a line whose
    normalized form appears in >= ``min_df`` distinct documents is
    boilerplate (nav menus, cookie banners, copyright footers) and is
    dropped from every document; order of the surviving lines is
    preserved. Returns (doc_id, clean_text, n_lines, n_removed).

    Scale shape: only 32-byte line digests shuffle to the document-
    frequency aggregate (never line text); the flagged lines regroup to
    their documents in one group-bounded collect (a document's own line
    count), so both shuffles are linear in corpus lines with no
    all-pairs term.
    """
    doc = F.col(id_col)
    lines = df.select(
        doc.alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn(
        "lh",
        F.md5(F.trim(F.regexp_replace(F.lower(F.col("line")), r"\s+", " "))),
    ).withColumn(
        "is_blank",
        F.trim(F.regexp_replace(F.lower(F.col("line")), r"\s+", " ")) == "",
    )
    line_df = (
        lines.filter(~F.col("is_blank"))
        .groupBy("lh")
        .agg(F.count_distinct("doc_id").alias("line_df"))
        .filter(F.col("line_df") >= min_df)
        .select("lh", F.lit(True).alias("is_boiler"))
    )
    flagged = lines.join(line_df, "lh", "left").select(
        "doc_id", "pos", "line",
        F.coalesce(F.col("is_boiler"), F.lit(False)).alias("is_boiler"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(
                                F.struct("pos", "line", "is_boiler")
                            )
                        ),
                        lambda s: ~s["is_boiler"],
                    ),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.col("is_boiler").cast("bigint")).alias("n_removed"),
        )
        .select("doc_id", "clean_text", "n_lines", "n_removed")
    )


def bpe_pair_stats(
    df: DataFrame, *, text_col: str = "text", top_n: int = 50
) -> DataFrame:
    """First-iteration byte-pair-encoding statistics (Sennrich et al.
    2016): corpus-weighted counts of adjacent character pairs inside
    words — the quantity a BPE trainer maximizes when choosing its next
    merge. Returns the ``top_n`` (pair, pair_count) rows with a
    deterministic (count DESC, pair ASC) tie-break.

    Scale shape: the corpus collapses to its vocabulary FIRST (one
    word-count aggregate — the only corpus-sized shuffle), then pairs
    explode from vocabulary words only, so the quadratic-ish pair work
    is bounded by |vocab| * word_len, not corpus tokens — the same
    trick production BPE trainers use."""
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("w")
    )
    vocab = words.groupBy("w").agg(F.count("*").alias("wn"))
    pairs = (
        vocab.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), "
                       "i -> substring(w, i, 2))")
            ).alias("pair"),
            "wn",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wn").cast("bigint").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(top_n)
    )


def cut_spans(
    df: DataFrame,
    spans: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove the token ranges named by ``spans`` — (id, span_start,
    span_end) half-open token intervals, e.g. from
    operators.dedup.duplicate_text_spans — from each document and
    rebuild the text from the surviving tokens (single-space joined,
    order preserved). The canonical consumption of span dedup: returns
    (doc_id, ftext, n_tokens, n_tokens_cut), fully-cut documents
    included with empty ftext; documents that tokenize empty produce no
    row (they carry no tokens to cut or keep).

    Scale: one posexplode + one left join on (doc, position) + one
    group-bounded per-document rebuild — no step beyond the document's
    own token count."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("tpos", "tok"),
    )
    cover = spans.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end") - 1)
        ).alias("tpos"),
    ).distinct()
    flagged = toks.join(
        cover.withColumn("cut", F.lit(True)), ["doc_id", "tpos"], "left"
    ).select(
        "doc_id", "tpos", "tok",
        F.coalesce("cut", F.lit(False)).alias("cut"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.concat_ws(" ", F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("tpos", "tok", "cut"))
                    ),
                    lambda st: ~st["cut"],
                ),
                lambda st: st["tok"],
            )).alias("ftext"),
            F.sum((~F.col("cut")).cast("bigint")).cast("bigint")
            .alias("n_tokens"),
            F.sum(F.col("cut").cast("bigint")).cast("bigint")
            .alias("n_tokens_cut"),
        )
    )


def bpe_train(
    df: DataFrame, *, n_merges: int = 10, batch_k: int = 1,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Iterative BPE merge training (Sennrich et al. 2016): learn the
    top ``n_merges`` merges over the corpus. Returns
    [(left, right, count), ...] in merge order.

    Scale shape: the ONE corpus-sized operation is the initial word
    count; every merge iteration then operates on the VOCABULARY frame
    (words as symbol arrays, weighted by frequency) — pair counting is a
    vocab-sized explode+sum, the argmax is a bounded
    TakeOrderedAndProject, and applying a merge is an array fold per
    vocab word. The driver loop is over n_merges (a parameter, typically
    tens of thousands in production but never corpus-sized); each
    round's vocab frame is localCheckpoint-truncated so lineage stays
    flat. This is exactly how production BPE trainers are structured —
    corpus once, vocabulary thereafter.

    ``batch_k`` accepts up to k merges per Spark round (cutting the
    sequential job count ~k x for a production 30k-merge vocabulary): a
    round's candidates are taken from ONE pair-count snapshot in
    (count desc, l, r) order, and a candidate is accepted only if it
    shares no symbol with any merge already accepted this round and
    names no symbol CREATED this round. Disjointness makes each
    accepted pair's snapshot count exactly its sequential count
    (applying a disjoint merge cannot change it), and the created-symbol
    exclusion keeps the single-pass fold identical to applying the
    accepted merges one at a time. The one divergence from strict
    sequential training: a brand-new pair minted by an earlier merge in
    the SAME round (it involves that round's created symbol) can rank
    above a later accepted candidate but is not seen until the next
    snapshot, so its merge can land a few positions later than
    one-at-a-time training would place it — the standard trade of
    parallel BPE trainers. ``batch_k=1`` is byte-identical to
    one-at-a-time training."""
    spark = df.sparkSession
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
        ).alias("w")
    )
    vocab = (
        words.groupBy("w").agg(F.count("*").alias("wn"))
        .select(F.split(F.col("w"), "").alias("syms"), "wn")
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        room = n_merges - len(merges)
        k = min(batch_k, room)
        pairs = vocab.filter(F.size("syms") >= 2).select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i-1] as l, syms[i] as r))"
                )
            ).alias("p"),
            "wn",
        )
        # over-fetch: conflicting candidates are skipped driver-side,
        # so pull a few extra rows (still a bounded TakeOrdered)
        top = (
            pairs.groupBy("p")
            .agg(F.sum("wn").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p.l"), F.asc("p.r"))
            .limit(max(k * 4, k))
            .collect()
        )
        if not top:
            break
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        created: set[str] = set()
        for row in top:
            if len(accepted) >= k:
                break
            left, right = row["p"]["l"], row["p"]["r"]
            if (
                left in used or right in used
                or left in created or right in created
            ):
                continue
            accepted.append((left, right, int(row["cnt"])))
            used.update((left, right))
            created.add(left + right)
        merges.extend(accepted)
        # apply the batch: ONE left-to-right fold over each word's
        # symbols (greedy, non-overlapping — matches the reference
        # algorithm); rule order inside the CASE is immaterial because
        # accepted pairs are symbol-disjoint and never reference a
        # symbol another rule creates.
        rules = " ".join(
            f"WHEN size(acc) > 0 AND element_at(acc, -1) = '{left}' "
            f"AND s = '{right}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), "
            f"array('{left}{right}'))"
            for left, right, _cnt in accepted
        )
        merged = F.expr(
            "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) -> "
            f"CASE {rules} ELSE concat(acc, array(s)) END)"
        )
        vocab = vocab.select(
            merged.alias("syms"), "wn"
        ).localCheckpoint()
    return merges


def column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style per-column statistics in ONE pass: row count, null
    count, exact distinct count, and min/max (rendered as strings so
    heterogeneous column types share a schema). The stats every
    cost-based optimizer and data-quality dashboard consumes; computed
    as a single multi-aggregate (no per-column scans) and unpivoted via
    stack — scan cost is one read regardless of column count."""
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            # min/max in the NATIVE type, rendered after — string-min of
            # numeric columns would be lexicographic ("100" < "99")
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_str, max_str)"
        ),
    ).select(
        "column_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_str",
        "max_str",
    )


def numeric_correlations(
    df: DataFrame, cols: list[str], *, int_scale: int = 2
) -> DataFrame:
    """Pearson correlation matrix over numeric columns in ONE pass —
    the ANALYZE companion a cost-based optimizer or feature-selection
    screen consumes. Rows with a NULL in ANY requested column are
    excluded first (pairwise-complete variants hide mixed populations).

    Engine-stable by construction: inputs are scaled by 10^int_scale
    and rounded to INTEGERS (corr is invariant under linear scaling,
    and the testdata measures are exact 2-decimal values, so
    int_scale=2 loses nothing); every accumulated quantity (n, Sx,
    Sxx, Sxy) is then an exact scale-0 DECIMAL sum — no float
    accumulation, no fractional-scale decimal→double cast (which
    double-rounds through the 10^s division DIFFERENTLY across
    engines — measured: DuckDB drifts in the 12th digit). The final
    corr = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx²)(n*Syy - Sy²)) is a
    single double-precision evaluation of exact integers, identical
    on every engine. Zero-variance columns yield NULL corr (0/0),
    never NaN-by-accident.

    Output: (col_a, col_b, n_rows, corr) for every unordered pair
    col_a < col_b. One scan regardless of column count; the aggregate
    is k + k + k(k-1)/2 expressions wide. decimal(18,0) per-row
    values keep products at (37,0) — inside 38 digits, exact on both
    engines (38-wide inputs would force engine-specific
    precision-loss truncation)."""
    mult = 10 ** int_scale
    base = df.dropna(subset=cols).select(
        *[
            F.round(F.col(c) * mult).cast("decimal(18,0)").alias(c)
            for c in cols
        ]
    )
    aggs = [F.count("*").cast("bigint").alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).alias(f"__s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"__ss_{c}"))
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols)) for j in range(i + 1, len(cols))
    ]
    if not pairs:
        return df.sparkSession.createDataFrame(
            [], "col_a string, col_b string, n_rows bigint, corr double"
        )
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"__sp_{a}_{b}"))
    one = base.agg(*aggs)

    def corr_expr(a: str, b: str):
        n = F.col("__n").cast("double")
        sx = F.col(f"__s_{a}").cast("double")
        sy = F.col(f"__s_{b}").cast("double")
        sxx = F.col(f"__ss_{a}").cast("double")
        syy = F.col(f"__ss_{b}").cast("double")
        sxy = F.col(f"__sp_{a}_{b}").cast("double")
        num = n * sxy - sx * sy
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        return F.when(den > 0, num / den)

    rows = [
        F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            F.col("__n").alias("n_rows"), corr_expr(a, b).alias("corr"),
        )
        for a, b in pairs
    ]
    return one.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.col_a", "r.col_b", "r.n_rows", "r.corr")


def ngram_novelty(
    df: DataFrame, *, n: int = 3, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's
    distinct word n-grams that appear NOWHERE else in the corpus — the
    cheap diversity/derivativeness signal (a doc of df=1 grams is
    original; a doc whose grams all recur is boilerplate-adjacent even
    when no single pair crosses a dedup threshold). Returns
    (doc_id, n_grams, n_novel, novelty).

    Scale: one gram-hash document-frequency aggregate (8-byte digests
    shuffle, never text) + one hash join back — wordcount-shaped."""
    grams = word_ngram_hashes(df, n=n, text_col=text_col, id_col=id_col)
    # grams are per-doc distinct, so COUNT(*) per hash IS document freq
    dfreq = grams.groupBy("gram_hash").agg(F.count("*").alias("df"))
    joined = grams.join(dfreq, "gram_hash")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum((F.col("df") == 1).cast("bigint")).cast("bigint")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.col("n_novel").cast("double") / F.col("n_grams").cast("double"),
        )
    )


# The one portability-critical 32-bit token hash, as a SQL fragment for
# use inside transform() lambdas ({i} is the 1-based element index into
# the `toks` array). Column-side twin of token_hash(); the DuckDB
# rendering lives in contract._TH. Every n-gram model builds its hash
# tuples from THIS template so the tables always join.
_TOKS_H = (
    "cast(conv(substr(md5(element_at(toks, {i})), 1, 8), 16, 10) "
    "as bigint)"
)


def lm_bigram_surprise(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-document bigram language-model surprise — the CCNet-style
    perplexity proxy for quality bucketing, reformulated to be exact
    across engines. A corpus-trained bigram model scores each document
    by the mean inverse conditional probability of its bigrams:

        surprise(w1 w2) = floor(scale * c(w1·) / c(w1 w2))

    where ``c(w1 w2)`` is the corpus occurrence count of the bigram and
    ``c(w1·)`` the count of ``w1`` as a bigram head (so
    ``c(w1w2)/c(w1·)`` IS the MLE ``p(w2|w1)``; surprise is its
    floored-scaled reciprocal, ≥ ``scale``). A repetitive or templated
    document scores near ``scale`` (its continuations are always seen),
    a typical document sits in a mid band, and gibberish or
    heavily-OOV-ish text scores high — mirroring how CCNet's KenLM
    perplexity splits a crawl into head/middle/tail. Log-free on
    purpose: floor(scale*a/b) over int64 counts is bit-identical on
    every engine, while sum-of-float-logs is not even deterministic
    across partition orders.

    Output: (doc_id, n_bigrams, surprise_total, surprise_mean) —
    integer totals plus one final double division.

    Scale: wordcount-shaped. Documents explode to (h1, h2) 32-bit
    token-hash pairs (text itself never shuffles); the model is two
    hash aggregates (bigram counts, then head counts re-aggregated
    from them — never a second pass over occurrences); scoring is two
    equi-joins back. DECIMAL(38,0) guards the c1*scale product past
    int64 at web-corpus counts. Hash collisions merge rare bigrams
    identically on both engines, so the contract oracle stays exact."""
    d = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks")
    )
    pair = F.expr(
        "transform(sequence(1, size(toks) - 1), i -> struct("
        + _TOKS_H.format(i="i") + " as h1, "
        + _TOKS_H.format(i="i + 1") + " as h2))"
    )
    occ = (
        d.filter(F.size("toks") >= 2)
        .select("doc_id", F.explode(pair).alias("g"))
        .select("doc_id", F.col("g.h1").alias("h1"), F.col("g.h2").alias("h2"))
    )
    c2 = occ.groupBy("h1", "h2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("h1").agg(F.sum("c2").cast("bigint").alias("c1"))
    surprise = F.expr(
        f"CAST((CAST(c1 AS DECIMAL(38,0)) * {int(scale)}) div c2 AS BIGINT)"
    )
    return (
        occ.join(c2, ["h1", "h2"]).join(c1, ["h1"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum(surprise).cast("bigint").alias("surprise_total"),
        )
        .withColumn(
            "surprise_mean",
            F.col("surprise_total").cast("double")
            / F.col("n_bigrams").cast("double"),
        )
    )


def _bpe_apply_sql(base: str, merges: list[tuple[str, str]], tag: str) -> str:
    """Spark SQL expression applying ``merges`` in order to a symbol
    array expression ``base`` — each merge is one greedy left-to-right
    array fold (identical to ``bpe_train``'s apply step). ``tag`` makes
    nested lambda variable names unique."""
    expr = base
    for d, (left, right) in enumerate(merges):
        a, s = f"acc{tag}{d}", f"s{tag}{d}"
        expr = (
            f"aggregate({expr}, CAST(array() AS ARRAY<STRING>), "
            f"({a}, {s}) -> CASE WHEN size({a}) > 0 "
            f"AND element_at({a}, -1) = '{left}' AND {s} = '{right}' "
            f"THEN concat(slice({a}, 1, size({a}) - 1), "
            f"array('{left}{right}')) "
            f"ELSE concat({a}, array({s})) END)"
        )
    return expr


def bpe_encode_stats(
    df: DataFrame, merges: list[tuple[str, str]], *,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a FIXED trained BPE merge list (the serving path:
    a pretrained tokenizer applied to new text — pair with ``bpe_train``
    for the learning path) and report per-document token accounting:
    (doc_id, n_words, n_chars, n_tokens, chars_per_token). The numbers
    a data pipeline actually needs from its tokenizer — sequence-length
    planning, packing budgets, cost estimates — without materializing
    token sequences. Documents with no [a-z]+ words drop out (nothing
    to tokenize).

    Scale: pure per-row column algebra — words explode, each word runs
    the merge folds in codegen, one hash re-aggregate per doc. No UDF,
    no model broadcast (the merge list compiles into the plan), linear
    in corpus size. ``chars_per_token`` is one exact int division."""
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"
        ).alias("ws"),
    )
    apply_expr = _bpe_apply_sql("split(w, '')", merges, "m")
    ex = d.select("doc_id", F.explode("ws").alias("w"))
    # The production-tokenizer trick (same as bpe_pair_stats): the
    # corpus collapses to its VOCABULARY before any merge fold runs —
    # each distinct word folds once, occurrences join the result back.
    # Fold cost is |vocab| x n_merges instead of corpus x n_merges.
    vocab = ex.select("w").distinct().select(
        "w",
        F.length("w").alias("nc"),
        F.expr(f"size({apply_expr})").alias("nt"),
    )
    ex = ex.join(vocab, "w")
    return (
        ex.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("nc").cast("bigint").alias("n_chars"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "chars_per_token",
            F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


def dsir_affinity(
    corpus: DataFrame, target: DataFrame, *, n_buckets: int = 4096,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Hashed-feature target-affinity score, the data-selection signal
    of DSIR (Xie et al. 2023, Data Selection via Importance
    Resampling) in an engine-exact linearization: token occurrences
    hash into ``n_buckets`` buckets; each bucket scores the difference
    between its target-corpus and raw-corpus frequency (both in ppm,
    floored integer division); a document's affinity is the mean bucket
    score over its token occurrences. Positive = the document's
    vocabulary is over-represented in the target domain — rank by it
    (or feed it into weighted sampling) to select raw data that looks
    like the target. Log-free linearization keeps every intermediate
    int64-exact (true DSIR sums log-probability ratios, which no two
    engines aggregate identically).

    Output: (doc_id, n_feats, affinity_sum_ppm, affinity_ppm).

    Scale: both frequency tables are ``n_buckets`` rows no matter the
    corpus size — they BROADCAST onto the streaming doc-token
    projection; one wordcount aggregate per corpus + one per-doc
    re-aggregate. Text never shuffles, only 8-byte hashes."""
    def occ(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks")
        ).select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(toks, t -> pmod(cast(conv(substr(md5(t), "
                    f"1, 8), 16, 10) as bigint), {int(n_buckets)}))"
                )
            ).alias("b"),
        )

    def freq(o: DataFrame) -> DataFrame:
        c = o.groupBy("b").agg(F.count("*").cast("bigint").alias("c"))
        tot = c.agg(F.sum("c").cast("bigint").alias("t"))
        return (
            c.crossJoin(F.broadcast(tot))
            .select(
                "b",
                F.expr(
                    "CAST((CAST(c AS DECIMAL(38,0)) * 1000000) div t "
                    "AS BIGINT)"
                ).alias("ppm"),
            )
        )

    from _event_intelligence_data_warehouse_spark import cache

    # raw_occ feeds BOTH the raw-frequency aggregate and the final
    # per-doc scoring join; unpersisted, the tokenize+hash+explode
    # projection over the whole corpus runs twice (guide §1.2). The
    # frame is (doc_id, int64) — narrow — so the persist is cheap at
    # any scale relative to re-tokenizing the text.
    raw_occ = cache.persist(occ(corpus))
    t_ppm = freq(occ(target)).withColumnRenamed("ppm", "tp")
    r_ppm = freq(raw_occ).withColumnRenamed("ppm", "rp")
    # fixed-size (n_buckets) score table: broadcast onto the doc stream
    score = (
        r_ppm.join(t_ppm, "b", "left")
        .select(
            "b",
            (F.coalesce(F.col("tp"), F.lit(0)) - F.col("rp"))
            .cast("bigint").alias("delta_ppm"),
        )
    )
    return (
        raw_occ.join(F.broadcast(score), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_feats"),
            F.sum("delta_ppm").cast("bigint").alias("affinity_sum_ppm"),
        )
        .withColumn(
            "affinity_ppm",
            F.col("affinity_sum_ppm").cast("double")
            / F.col("n_feats").cast("double"),
        )
    )


def stats_drift(before: DataFrame, after: DataFrame) -> DataFrame:
    """Batch-over-batch schema/profile drift report: join two
    ``column_stats`` profiles on column name and report, per column,
    the null-rate delta (ppm, exact integer arithmetic), the distinct
    delta, whether the [min, max] envelope moved, and columns that
    appeared/disappeared (schema drift) — the screen that catches an
    upstream producer silently changing a feed before the warehouse
    ingests a month of it. Verdict tiers: 'schema' (column
    added/removed), 'drift' (null rate moved >= 1000 ppm or envelope
    moved), 'stable'.

    Scale: both inputs are columns-sized profile frames (each the
    product of column_stats' ONE corpus pass) — the report join is
    trivially broadcast; corpus cost is the two profile scans the
    caller already paid."""
    b = before.select(
        F.col("column_name"),
        F.col("n_rows").alias("b_rows"), F.col("n_nulls").alias("b_nulls"),
        F.col("n_distinct").alias("b_distinct"),
        F.col("min_str").alias("b_min"), F.col("max_str").alias("b_max"),
    )
    a = after.select(
        F.col("column_name"),
        F.col("n_rows").alias("a_rows"), F.col("n_nulls").alias("a_nulls"),
        F.col("n_distinct").alias("a_distinct"),
        F.col("min_str").alias("a_min"), F.col("max_str").alias("a_max"),
    )
    j = b.join(a, "column_name", "full_outer")
    null_ppm = lambda n, t: F.expr(  # noqa: E731
        f"CAST(CASE WHEN {t} IS NULL OR {t} = 0 THEN 0 ELSE "
        f"(CAST({n} AS DECIMAL(38,0)) * 1000000) div {t} END AS BIGINT)"
    )
    d_null = (null_ppm("a_nulls", "a_rows")
              - null_ppm("b_nulls", "b_rows")).cast("bigint")
    env_moved = (
        F.col("b_min").isNotNull() & F.col("a_min").isNotNull()
        & ((F.col("b_min") != F.col("a_min"))
           | (F.col("b_max") != F.col("a_max")))
    )
    schema_change = F.col("b_rows").isNull() | F.col("a_rows").isNull()
    return j.select(
        "column_name",
        F.coalesce(F.col("b_distinct"), F.lit(0)).cast("bigint")
        .alias("b_distinct"),
        F.coalesce(F.col("a_distinct"), F.lit(0)).cast("bigint")
        .alias("a_distinct"),
        F.when(schema_change, F.lit(0)).otherwise(d_null)
        .cast("bigint").alias("null_delta_ppm"),
        F.coalesce(env_moved, F.lit(False)).alias("envelope_moved"),
        F.when(schema_change, F.lit("schema"))
        .when(env_moved | ~d_null.between(-999, 999), F.lit("drift"))
        .otherwise(F.lit("stable")).alias("verdict"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 retrieval: top-k documents for a fixed bag of query terms —
    the lexical-retrieval baseline every RAG / data-curation stack keeps
    next to its ANN index (Robertson & Zaragoza 2009, the Okapi BM25
    formulation with the +1-smoothed idf Lucene uses).

    Returns (doc_id, rank, n_tokens, matched_terms, total_tf): the rank
    plus exact-integer evidence columns are the contract; the float
    score stays internal (ln is libm-dependent in the last ulp, but
    equal (tf, df, dl) triples score identically on every engine and
    distinct triples separate far beyond ulp — same discipline as
    tfidf_top_terms).

    Scale shape: the query-term list is a literal broadcast (a handful
    of terms); tf is a wordcount-shaped partial aggregate over only the
    matching tokens (the isin filter prunes before the shuffle); df and
    avgdl are O(|terms|) and O(1) aggregates crossed in as broadcast
    1-frames. The corpus text never moves after tokenize; the only
    per-doc shuffle is the final top-k, which TakeOrderedAndProject
    bounds at k rows per partition."""
    from pyspark.sql.window import Window

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted({t.lower() for t in query_terms})
    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("dl"))
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens")
    )
    toks = base.select(
        "doc_id", "dl", F.explode("toks").alias("term")
    ).filter(F.col("term").isin(terms))
    tf = toks.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("total_tokens") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("doc_freq") + 0.5)
                / (F.col("doc_freq") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        # Quantize each term's score to fixed-point BEFORE the per-doc
        # sum: a raw double sum is accumulation-order-dependent (ties in
        # the final ranking could then flip between engines/partitions);
        # a DECIMAL sum of 6-dp term scores is exact and commutative.
        .withColumn(
            "ts_fix", F.round(F.col("term_score").cast("decimal(20,10)"), 6)
        )
    )
    per_doc = scored.groupBy("doc_id", "dl").agg(
        F.sum("ts_fix").alias("score"),
        F.count("*").alias("matched_terms"),
        F.sum("tf").alias("total_tf"),
    )
    # Distributed top-k FIRST (TakeOrderedAndProject keeps k rows per
    # partition, then k total) so the rank window only ever sees k rows
    # — a bare row_number() over the full corpus would single-partition
    # every matched document.
    topk = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("dl").cast("long").alias("n_tokens"),
            F.col("matched_terms").cast("long").alias("matched_terms"),
            F.col("total_tf").cast("long").alias("total_tf"),
        )
    )


def vocab_growth(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_width: int = 1_000_000,
) -> DataFrame:
    """Heaps-law vocabulary growth curve: per document (in id order) the
    number of never-before-seen terms and the running vocabulary size —
    the corpus-saturation diagnostic that tells a crawl pipeline when
    additional data stops adding lexical novelty.

    Returns (doc_id, n_tokens, new_terms, cum_tokens, vocab_size), all
    exact int64.

    Scale shape: "first seen" is min(doc_id) per term (wordcount-shaped,
    no window over the corpus); the running totals use a two-level
    prefix sum — per-doc deltas roll up into id-range buckets
    (``doc_id div bucket_width``), the O(#buckets) bucket totals take a
    single-partition cumulative window (bounded: 100 TB / 1M-id buckets
    is a few thousand rows), and the within-bucket window is partitioned
    by bucket. No global single-partition pass ever sees per-doc rows —
    the naive SUM() OVER (ORDER BY doc_id) would."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        tokens(text_col).alias("toks"),
    ).select("doc_id", F.size("toks").alias("n_tokens"), "toks")
    first_seen = (
        base.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(F.col("first_doc").alias("doc_id"))
        .agg(F.count("*").alias("new_terms"))
    )
    per_doc = (
        base.select("doc_id", "n_tokens")
        .join(first_seen, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("new_terms"), F.lit(0)).cast("bigint")
            .alias("new_terms"),
            F.expr(f"doc_id div {bucket_width}").alias("_bucket"),
        )
    )
    bucket_tot = per_doc.groupBy("_bucket").agg(
        F.sum("n_tokens").alias("_bt"), F.sum("new_terms").alias("_bv")
    )
    wb = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bucket_prefix = bucket_tot.select(
        "_bucket",
        F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_pt"),
        F.coalesce(F.sum("_bv").over(wb), F.lit(0)).alias("_pv"),
    )
    wi = Window.partitionBy("_bucket").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_doc.join(F.broadcast(bucket_prefix), "_bucket")
        .select(
            "doc_id",
            "n_tokens",
            "new_terms",
            (F.col("_pt") + F.sum("n_tokens").over(wi)).cast("bigint")
            .alias("cum_tokens"),
            (F.col("_pv") + F.sum("new_terms").over(wi)).cast("bigint")
            .alias("vocab_size"),
        )
    )


def lm_trigram_backoff(
    df: DataFrame,
    train: DataFrame | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 1_000_000,
    alpha_num: int = 4,
    alpha_den: int = 10,
) -> DataFrame:
    """Stupid Backoff trigram scoring (Brants et al. 2007) — the
    higher-order sibling of lm_bigram_surprise, exercising the backoff
    mechanism: each trigram position scores by the trigram MLE when the
    trained model has seen the context, else alpha * bigram MLE, else
    alpha^2 * unigram frequency, else 0 (OOV). ``train`` (default: the
    scored frame itself) fits the counts; scoring a frame against a
    DIFFERENT training slice is what makes the backoff paths fire.

    All ratios are floor-scaled integers (MLE * scale) with the alpha
    damping applied as exact integer multiply/divide, so document
    scores are bit-identical across engines and partition orders — the
    same no-float-logs discipline as the bigram scorer.

    Output: (doc_id, n_trigrams, n_tri_hits, n_bi_backoffs,
    n_uni_backoffs, n_oov, score_total, score_mean).

    Scale shape: wordcount — text explodes once to 32-bit hash triples;
    the model is three hash aggregates (trigram counts, their context
    re-aggregate, bigram/unigram counts from the training slice);
    scoring is equi-joins back. DECIMAL(38,0) guards products past
    int64 at web-corpus counts."""
    if train is None:
        train = df
    tri = F.expr(
        "transform(sequence(1, size(toks) - 2), i -> struct("
        + _TOKS_H.format(i="i") + " as h1, "
        + _TOKS_H.format(i="i + 1") + " as h2, "
        + _TOKS_H.format(i="i + 2") + " as h3))"
    )

    def _tris(frame: DataFrame) -> DataFrame:
        return (
            frame.select(
                F.col(id_col).alias("doc_id"),
                tokens(text_col).alias("toks"),
            )
            .filter(F.size("toks") >= 3)
            .select("doc_id", F.explode(tri).alias("g"))
            .select(
                "doc_id",
                F.col("g.h1").alias("h1"),
                F.col("g.h2").alias("h2"),
                F.col("g.h3").alias("h3"),
            )
        )

    t_occ = _tris(train)
    c3 = t_occ.groupBy("h1", "h2", "h3").agg(F.count("*").alias("c3"))
    ch2 = c3.groupBy("h1", "h2").agg(
        F.sum("c3").cast("bigint").alias("ch2")
    )
    # bigram/unigram models over the SAME training slice (all adjacent
    # pairs, not just trigram prefixes — the standard backoff tables)
    pair = F.expr(
        "transform(sequence(1, size(toks) - 1), i -> struct("
        + _TOKS_H.format(i="i") + " as h1, "
        + _TOKS_H.format(i="i + 1") + " as h2))"
    )
    b_occ = (
        train.select(tokens(text_col).alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(F.explode(pair).alias("g"))
        .select(F.col("g.h1").alias("h1"), F.col("g.h2").alias("h2"))
    )
    b2 = b_occ.groupBy("h1", "h2").agg(F.count("*").alias("b2"))
    b1 = b2.groupBy("h1").agg(F.sum("b2").cast("bigint").alias("b1"))
    u_occ = (
        train.select(F.explode(tokens(text_col)).alias("tok"))
        .select(token_hash(F.col("tok")).alias("h"))
    )
    u1 = u_occ.groupBy("h").agg(F.count("*").alias("u1"))
    total = u_occ.agg(F.count("*").alias("t_total"))

    s_occ = _tris(df)
    scored = (
        s_occ.join(c3, ["h1", "h2", "h3"], "left")
        .join(ch2, ["h1", "h2"], "left")
        .join(
            b2.select(
                F.col("h1").alias("h2"), F.col("h2").alias("h3"), "b2"
            ),
            ["h2", "h3"],
            "left",
        )
        .join(b1.select(F.col("h1").alias("h2"), "b1"), ["h2"], "left")
        .join(u1.select(F.col("h").alias("h3"), "u1"), ["h3"], "left")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "s",
            F.when(
                F.col("c3").isNotNull(),
                F.expr(
                    f"CAST((CAST(c3 AS DECIMAL(38,0)) * {int(scale)}) "
                    "div ch2 AS BIGINT)"
                ),
            )
            .when(
                F.col("b2").isNotNull(),
                F.expr(
                    f"CAST(({int(alpha_num)} * ((CAST(b2 AS DECIMAL(38,0))"
                    f" * {int(scale)}) div b1)) div {int(alpha_den)} "
                    "AS BIGINT)"
                ),
            )
            .when(
                F.col("u1").isNotNull(),
                F.expr(
                    f"CAST(({int(alpha_num * alpha_num)} * "
                    f"((CAST(u1 AS DECIMAL(38,0)) * {int(scale)}) div "
                    f"t_total)) div {int(alpha_den * alpha_den)} "
                    "AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0)),
        )
        .withColumn(
            "path",
            F.when(F.col("c3").isNotNull(), F.lit(0))
            .when(F.col("b2").isNotNull(), F.lit(1))
            .when(F.col("u1").isNotNull(), F.lit(2))
            .otherwise(F.lit(3)),
        )
    )
    cnt = lambda p: F.sum(  # noqa: E731
        F.when(F.col("path") == p, 1).otherwise(0)
    ).cast("bigint")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_trigrams"),
            cnt(0).alias("n_tri_hits"),
            cnt(1).alias("n_bi_backoffs"),
            cnt(2).alias("n_uni_backoffs"),
            cnt(3).alias("n_oov"),
            F.sum("s").cast("bigint").alias("score_total"),
        )
        .withColumn(
            "score_mean",
            F.col("score_total").cast("double")
            / F.col("n_trigrams").cast("double"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 50,
) -> DataFrame:
    """Top adjacent-bigram collocations ranked by (directional) PMI.

    PMI = log(N * n12 / (n1 * n2)) is monotone in the rational
    N*n12/(n1*n2), so the ranking uses that ratio scaled to ppm in
    exact DECIMAL(38,0) arithmetic — no logs, no floats, bit-stable
    across engines (n1 = occurrences of w1 in first position, n2 of w2
    in second, N = total bigram count). min_count filters the
    hapax-pair noise PMI is notorious for.

    100 TB: the bigram explode is the only corpus-sized stage; both
    marginals and the total are map-side-combinable aggregates of it,
    and the final ranking is a top-n heap over pairs with >= min_count
    support.
    """
    toks = tokens(F.col(text_col))
    pairs = (
        df.select(toks.alias("t"))
        .where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i-1] AS w1, t[i] AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    n1 = big.groupBy("w1").agg(F.sum("n12").alias("n1"))
    n2 = big.groupBy("w2").agg(F.sum("n12").alias("n2"))
    tot = big.agg(F.sum("n12").alias("nn"))
    scored = (
        big.where(F.col("n12") >= min_count)
        .join(n1, "w1")
        .join(n2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n12").cast("bigint").alias("n12"),
            F.expr(
                "CAST(CAST(n12 AS DECIMAL(38,0)) * nn * 1000000"
                " DIV (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)"
            ).alias("pmi_ratio_ppm"),
        )
    )
    return scored.orderBy(
        F.col("pmi_ratio_ppm").desc(), "w1", "w2"
    ).limit(top_n)


def chi2_keywords(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    min_df: int = 5,
    top_n: int = 10,
) -> DataFrame:
    """Per-group keyword extraction by chi-square association: for each
    (group, term), the 2x2 document-frequency contingency vs the rest
    of the corpus, keeping each group's top_n positively-associated
    terms.

    chi2 = N*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) is rational; it is
    evaluated with a fixed division ORDER in DECIMAL(38,0) —
    q = (ad-bc)^2 DIV ((a+b)(c+d)); chi2_ppm = q*N*1e6 DIV
    ((a+c)(b+d)) — so intermediate floors are identical on both
    engines and every factor stays under 38 digits at billion-doc
    scale (chi2 <= N bounds q*N by the remaining margin product).

    100 TB: one distinct (doc, term) explode, then aggregates whose
    keys are (group, term) / term / group — all map-side-combinable;
    the per-group top-n is a window over the scored (group, term)
    frame, never the corpus.
    """
    from pyspark.sql import Window

    doc_terms = (
        df.select(group_col, F.explode(
            F.array_distinct(tokens(F.col(text_col)))
        ).alias("term"))
    )
    a_tab = doc_terms.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("a")
    )
    term_tot = a_tab.groupBy("term").agg(F.sum("a").alias("ta"))
    grp_tot = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("ns"))
    n_docs = df.agg(F.count(F.lit(1)).alias("nn"))
    scored = (
        a_tab.join(term_tot.where(F.col("ta") >= min_df), "term")
        .join(F.broadcast(grp_tot), group_col)
        .crossJoin(F.broadcast(n_docs))
        .withColumn("b", F.col("ta") - F.col("a"))
        .withColumn("c", F.col("ns") - F.col("a"))
        .withColumn(
            "d", F.col("nn") - F.col("ns") - F.col("b")
        )
        .where(
            F.expr(
                "CAST(a AS DECIMAL(38,0)) * d"
                " > CAST(b AS DECIMAL(38,0)) * c"
            )
        )
        .withColumn(
            "chi2_ppm",
            F.expr(
                "CAST(((CAST(a AS DECIMAL(38,0)) * d"
                " - CAST(b AS DECIMAL(38,0)) * c)"
                " * (CAST(a AS DECIMAL(38,0)) * d"
                " - CAST(b AS DECIMAL(38,0)) * c)"
                " DIV (CAST(a + b AS DECIMAL(38,0)) * (c + d)))"
                " * nn * 1000000"
                " DIV (CAST(a + c AS DECIMAL(38,0)) * (b + d))"
                " AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("chi2_ppm").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_n)
        .select(
            group_col,
            "term",
            F.col("a").cast("bigint").alias("df_in_group"),
            F.col("b").cast("bigint").alias("df_elsewhere"),
            "chi2_ppm",
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


def rake_keyphrases(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """RAKE keyphrase extraction [Rose et al. 2010], integer-quantized:
    candidate phrases are maximal runs of non-stopword alphabetic
    tokens; each word scores degree/freq (degree = total length of the
    phrases it appears in, freq = its instance count) as a FLOORED ppm
    ratio, and a phrase scores the sum of its words' ppm scores — so
    rankings are exact integers, reproducible across engines and
    partitionings. (Variant note: tokens come from one non-alpha split,
    so stopwords — not punctuation — are the only phrase breakers.)

    Returns the global top_k (phrase, score_ppm, n_words,
    n_occurrences), ties broken by phrase text.

    100 TB: per-doc windows (island numbering) are bounded by document
    length; word stats and phrase scores are combinable aggregates of
    the instance stream; the final top-k is a heap
    (TakeOrderedAndProject), never a global sort.
    """
    from pyspark.sql import Window

    stop = ENGLISH_STOPWORDS
    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), "[^a-z]+")
        ).alias("pos", "tok"),
    )
    flagged = toks.withColumn(
        "is_stop",
        (F.col("tok") == "") | F.col("tok").isin(*stop),
    )
    w = Window.partitionBy("_doc").orderBy("pos")
    islands = (
        flagged.where(~F.col("is_stop"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("island", F.col("pos") - F.col("rn"))
    )
    phrases = islands.groupBy("_doc", "island").agg(
        F.expr(
            "concat_ws(' ', transform(array_sort("
            "collect_list(struct(pos, tok))), x -> x.tok))"
        ).alias("phrase"),
        F.count(F.lit(1)).alias("phrase_len"),
    )
    instances = islands.join(phrases, ["_doc", "island"]).select(
        "_doc", "island", "tok", "phrase_len"
    )
    words = instances.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("phrase_len").alias("degree"),
    ).withColumn(
        "word_ppm",
        F.expr("CAST(CAST(degree AS DECIMAL(38,0)) * 1000000"
               " div freq AS BIGINT)"),
    )
    scored = (
        instances.join(words.select("tok", "word_ppm"), "tok")
        .groupBy("_doc", "island")
        .agg(F.sum("word_ppm").alias("score_ppm"))
        .join(phrases, ["_doc", "island"])
    )
    return (
        scored.groupBy("phrase")
        .agg(
            F.max("score_ppm").cast("bigint").alias("score_ppm"),
            F.max("phrase_len").cast("bigint").alias("n_words"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .orderBy(F.desc("score_ppm"), F.asc("phrase"))
        .limit(top_k)
    )


def positional_postings(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Positional inverted-index postings: one (doc_id, pos, term) row
    per token occurrence, 0-based positions. This is the index layout
    phrase and proximity queries join against — at scale it is a stored,
    term-bucketed table, so a query's first move (filter to ITS terms)
    is a pushed-down scan of a few term buckets, never the corpus."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "term"),
    )


def phrase_search(
    df: DataFrame,
    phrases: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search over positional postings: a phrase of terms
    t0..tk matches where postings for each ti align at consecutive
    positions (pos_i = pos_0 + i) within one document — the classic
    positional-index adjacency join, NOT a regex scan of the text.

    Why this shape at 100 TB: the postings frame is filtered to the
    query's terms before any join (a pushed-down IN over the term
    column — on a term-bucketed stored index this reads only those
    buckets), and each adjacency join is an equi-join on
    (doc_id, pos), so the work is bounded by the PHRASE TERMS' posting
    lists. The anchor is the phrase's first term; joining rare-first
    would shrink intermediates further, but the fixed left-to-right
    chain keeps the plan deterministic and lets AQE pick the join
    strategy per stage. Output: (phrase, doc_id, n_matches, first_pos)
    with one row per matching document.

    Raises ``ValueError`` on an empty phrase list or a phrase with no
    tokens — silently returning None / crashing in the join chain
    (round-6 ADVICE) would hide a malformed query."""
    if not phrases:
        raise ValueError("phrase_search: phrases must be non-empty")
    out = None
    for phrase in phrases:
        terms = [t for t in phrase.lower().split() if t]
        if not terms:
            raise ValueError(
                "phrase_search: phrase with no tokens: "
                f"{phrase!r}"
            )
        posts = positional_postings(
            df, text_col=text_col, id_col=id_col
        ).filter(F.col("term").isin(terms))
        cur = (
            posts.filter(F.col("term") == terms[0])
            .select("doc_id", F.col("pos").alias("p0"))
        )
        for i, t in enumerate(terms[1:], start=1):
            nxt = posts.filter(F.col("term") == t).select(
                F.col("doc_id").alias("d_i"), F.col("pos").alias("p_i")
            )
            cur = cur.join(
                nxt,
                (cur.doc_id == nxt.d_i)
                & (nxt.p_i == cur.p0 + F.lit(i)),
            ).select("doc_id", "p0")
        hit = cur.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matches"),
            F.min("p0").cast("bigint").alias("first_pos"),
        ).select(F.lit(phrase).alias("phrase"), "doc_id",
                 "n_matches", "first_pos")
        out = hit if out is None else out.unionByName(hit)
    return out


def proximity_search(
    df: DataFrame,
    term_a: str,
    term_b: str,
    *,
    window: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Proximity retrieval: documents where ``term_a`` and ``term_b``
    co-occur within ``window`` tokens, via a banded range join over
    positional postings (|pos_a - pos_b| <= window, the two terms'
    posting lists only) — the relevance primitive between bag-of-words
    scoring (any distance) and exact phrase adjacency (distance 1, in
    order). Output: (doc_id, n_cooccurrences, min_distance) — one row
    per matching document; n_cooccurrences counts (pos_a, pos_b) pairs
    inside the band, min_distance the tightest one.

    Scale: same bound as phrase_search — postings are filtered to the
    two query terms before the join, and the band predicate rides an
    equi-join on doc_id, so per-doc work is |A_d| x |B_d| for the two
    terms' in-doc occurrence counts, never document length."""
    posts = positional_postings(df, text_col=text_col, id_col=id_col)
    a = posts.filter(F.col("term") == term_a.lower()).select(
        "doc_id", F.col("pos").alias("pa")
    )
    b = posts.filter(F.col("term") == term_b.lower()).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb")
    )
    dist = F.abs(F.col("pa") - F.col("pb"))
    return (
        a.join(
            b,
            (a.doc_id == b.doc_b) & (dist <= window),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cooccurrences"),
            F.min(dist).cast("bigint").alias("min_distance"),
        )
    )


# PII patterns (portable: every construct — \d, \b, bounded repeats,
# character classes — means the same thing in Java regex (Spark) and
# RE2 (DuckDB), so a mirrored oracle can redact bit-identically).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+1-555-\d{4}"
PII_IPV4 = r"\b\d{1,3}(\.\d{1,3}){3}\b"


def pii_scrub(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII detection + redaction, the pre-training privacy pass: count
    and replace emails, NANP test-range phone numbers and IPv4
    literals with typed placeholders (<EMAIL>/<PHONE>/<IP>) — the
    standard scrub every public-corpus pipeline runs before tokenizer
    training (the C4/Gopher lineage scrubs exactly these classes; the
    pattern set here is the deterministic core, extend per
    deployment). Returns (doc_id, n_emails, n_phones, n_ips, n_pii,
    clean_text).

    Redaction order is fixed (emails, then phones, then IPs) and each
    class is COUNTED on the progressively redacted text — emails on
    the input, phones on the email-redacted text, IPs on the
    email+phone-redacted text — so every count equals the number of
    placeholders that replacement emitted BY CONSTRUCTION, even when
    patterns overlap (r10 advice item 1: a phone or IP embedded in an
    email local part, e.g. 'a+1-555-1234@x.com', is consumed by the
    <EMAIL> replacement and must not inflate n_phones). Placeholders
    contain no digits, so a replacement can never manufacture a later
    match. Scale: a stateless projection — three regexp_count + three
    regexp_replace per row, zero UDFs; at 100 TB this rides the scan
    exactly like the cleanse battery. Small-file inputs are spread
    across the session's cores first (_spread_cpu_dense, the
    winnowing discipline): six regex passes per document are minutes
    of single-core time behind a compressed few-MB scan's 1-2 tasks,
    while an already-parallel scan passes through untouched."""
    df = _spread_cpu_dense(df)
    t = _col(text_col)
    ne = F.regexp_count(t, F.lit(PII_EMAIL))
    t1 = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    np_ = F.regexp_count(t1, F.lit(PII_PHONE))
    t2 = F.regexp_replace(t1, PII_PHONE, "<PHONE>")
    ni = F.regexp_count(t2, F.lit(PII_IPV4))
    clean = F.regexp_replace(t2, PII_IPV4, "<IP>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        ne.cast("bigint").alias("n_emails"),
        np_.cast("bigint").alias("n_phones"),
        ni.cast("bigint").alias("n_ips"),
        (ne + np_ + ni).cast("bigint").alias("n_pii"),
        clean.alias("clean_text"),
    )
