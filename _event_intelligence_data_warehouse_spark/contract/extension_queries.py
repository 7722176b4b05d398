"""LLM-data-pipeline extension queries (BASELINE.json north star): dedup
families, similarity search, text analysis, windowed event analytics —
each with a full DuckDB oracle (including the MinHash/SimHash bit math,
reproduced hash-for-hash via md5-derived token hashes).

The documents table has no natural duplicates, so dedup queries run over a
deterministically augmented corpus: exact copies (ids +100000) for exact
dedup, one-token-appended copies for near-dup detection — mirrored
verbatim in the oracle CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from _event_intelligence_data_warehouse_spark.contract import load, query
from _event_intelligence_data_warehouse_spark.operators import dedup as dd
from _event_intelligence_data_warehouse_spark.operators import similarity as sim
from _event_intelligence_data_warehouse_spark.operators import text as tx
from _event_intelligence_data_warehouse_spark.streaming import windows as win

# ---------------------------------------------------------------------------
# Shared corpus CTEs (SQL) + Spark builders
# ---------------------------------------------------------------------------

_DOCS_EXACT_CTE = """
WITH docs2 AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
)
"""

_DOCS_NEAR_CTE = """
WITH docs2 AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 100000 AS doc_id, text || ' zzextra' AS text
    FROM documents WHERE doc_id % 5 = 0
)
"""

# Tokenization in DuckDB mirroring operators.text.tokens.
_TOKS = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
    "x -> x != '')"
)
# md5-derived 32-bit token hash mirroring operators.text.token_hash.
_TH = "CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT)"


def _docs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return d.unionByName(dup)


def _docs_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzextra")).alias("text"),
    )
    return d.unionByName(dup)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

@query(
    "dedup_exact",
    _DOCS_EXACT_CTE
    + """
    , fp AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS fingerprint
        FROM docs2
    ), canon AS (
        SELECT fingerprint, MIN(doc_id) AS canonical_id,
               COUNT(*) AS group_size
        FROM fp GROUP BY fingerprint
    )
    SELECT f.doc_id, f.fingerprint, c.canonical_id, c.group_size
    FROM fp f JOIN canon c USING (fingerprint)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the normalized-text md5; only the
    digest shuffles, never the text."""
    return dd.exact_dedup(_docs_exact(spark, sf_dir))


# ---------------------------------------------------------------------------
# MinHash signatures + LSH near-dup pairs
# ---------------------------------------------------------------------------

def _minhash_sql_aggs() -> str:
    parts = []
    for j, (a, b) in enumerate(dd.minhash_coeffs()):
        parts.append(
            f"MIN(({a} * (th % {dd.MINHASH_P}) + {b}) % {dd.MINHASH_P}) AS mh{j}"
        )
    return ",\n               ".join(parts)


_TOKEN_HASH_CTE = f"""
, tok AS (
    SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM docs2
), th AS (
    SELECT DISTINCT doc_id, {_TH} AS th FROM tok
)
"""

_SIGS_CTE = f"""
, sigs AS (
    SELECT doc_id,
           {_minhash_sql_aggs()}
    FROM th GROUP BY doc_id
)
"""


@query(
    "dedup_minhash_signatures",
    _DOCS_NEAR_CTE + _TOKEN_HASH_CTE + _SIGS_CTE + "SELECT * FROM sigs",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=16 minhash values per document — the signature stage of
    MinHash+LSH, hash-for-hash reproducible (md5-derived token hashes,
    fixed universal-hash constants)."""
    docs = _docs_near(spark, sf_dir)
    return dd.minhash_signatures(dd.doc_token_sets(docs))


def _bands_sql() -> str:
    n_bands = dd.bands_for_threshold(0.8)
    rows_per_band = dd.MINHASH_K // n_bands
    selects = []
    for b in range(n_bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        key = "md5(concat_ws(',', " + ", ".join(
            f"CAST({c} AS VARCHAR)" for c in cols
        ) + "))"
        selects.append(
            f"SELECT doc_id, {b} AS band, {key} AS bkey FROM sigs"
        )
    return "\n    UNION ALL\n    ".join(selects)


_LSH_PAIR_CTES = (
    _TOKEN_HASH_CTE
    + _SIGS_CTE
    + f"""
, buckets AS (
    {_bands_sql()}
), cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM th GROUP BY doc_id
), inter AS (
    SELECT ta.doc_id AS doc_a, tb.doc_id AS doc_b, COUNT(*) AS inter
    FROM th ta JOIN th tb ON ta.th = tb.th AND ta.doc_id < tb.doc_id
    JOIN cands c ON c.doc_a = ta.doc_id AND c.doc_b = tb.doc_id
    GROUP BY 1, 2
)
"""
)

_LSH_PAIR_SELECT = """
SELECT i.doc_a, i.doc_b,
       CAST(i.inter AS DOUBLE)
           / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE CAST(i.inter AS DOUBLE)
      / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= 0.8
"""

_LSH_PAIRS_SQL = _DOCS_NEAR_CTE + _LSH_PAIR_CTES + _LSH_PAIR_SELECT


@query("dedup_minhash_lsh_pairs", _LSH_PAIRS_SQL)
def dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle -> sign -> band-bucket
    join -> exact-Jaccard verify (>= 0.8). Candidate generation is
    O(bucket collisions), never O(n²)."""
    return dd.minhash_dedup(_docs_near(spark, sf_dir), threshold=0.8)


_CC_CTES = (
    _DOCS_NEAR_CTE.replace("WITH docs2", "WITH RECURSIVE docs2")
    + _LSH_PAIR_CTES
    + f"""
, pairs AS (
    {_LSH_PAIR_SELECT}
), sym AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM pairs
), reach AS (
    SELECT doc_id AS src, doc_id AS node FROM docs2
    UNION
    SELECT r.src, s.b AS node FROM reach r JOIN sym s ON r.node = s.a
), comp AS (
    SELECT src AS doc_id, MIN(node) AS component_id
    FROM reach GROUP BY src
)
"""
)

_CC_SQL = _CC_CTES + "SELECT doc_id, component_id FROM comp"


@query("dedup_connected_components", _CC_SQL)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical dedup groups: min-label propagation over the verified
    MinHash near-dup pair graph (iterative DataFrame fixpoint; the oracle
    computes the same components with a recursive reachability CTE).
    Output is linear in corpus size where pair emission is quadratic in
    cluster size — the group-output variant a 100 TB dedup actually
    materializes."""
    docs = _docs_near(spark, sf_dir)
    pairs = dd.minhash_dedup(docs, threshold=0.8)
    return dd.connected_components(docs.select("doc_id"), pairs)


@query(
    "dedup_cluster_sizes",
    _CC_CTES + """
SELECT n_members, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM (
    SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM comp GROUP BY component_id
)
GROUP BY n_members
""",
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram — the dedup-rate telemetry a
    curation run reports (how much of the corpus is singleton vs
    clustered, and whether any mega-cluster signals boilerplate). Two
    tiny aggregates on top of the component labels; output is bounded by
    the largest cluster size."""
    docs = _docs_near(spark, sf_dir)
    pairs = dd.minhash_dedup(docs, threshold=0.8)
    comp = dd.connected_components(docs.select("doc_id"), pairs)
    return (
        comp.groupBy("component_id")
        .agg(F.count("*").cast("bigint").alias("n_members"))
        .groupBy("n_members")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
    )


@query(
    "split_leakage_safe",
    _CC_CTES + """
SELECT doc_id, component_id,
       CASE WHEN (CAST(('0x' || substr(md5(CAST(component_id AS VARCHAR)),
                        1, 8)) AS BIGINT) % 100) < 20
            THEN 'holdout' ELSE 'train' END AS split
FROM comp
""",
)
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/holdout split: the 20% holdout is drawn by
    hashing the near-dup CLUSTER id (connected component of the verified
    MinHash pair graph), so a document and its near-twin can never land
    on opposite sides — the split-time guard against eval contamination
    that a plain doc-id split cannot give."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    docs = _docs_near(spark, sf_dir)
    pairs = dd.minhash_dedup(docs, threshold=0.8)
    return smp.leakage_safe_split(docs.select("doc_id"), pairs, 20)


# ---------------------------------------------------------------------------
# SimHash buckets
# ---------------------------------------------------------------------------

def _simhash_sql() -> str:
    bit_aggs = ",\n           ".join(
        f"SUM(CASE WHEN (th >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(dd.SIMHASH_BITS)
    )
    assemble = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(dd.SIMHASH_BITS)
    )
    return f"""
, perbit AS (
    SELECT doc_id,
           {bit_aggs}
    FROM th GROUP BY doc_id
), sh AS (
    SELECT doc_id, {assemble} AS simhash FROM perbit
), groups AS (
    SELECT simhash, MIN(doc_id) AS canonical_id, COUNT(*) AS group_size
    FROM sh GROUP BY simhash
)
SELECT s.doc_id, s.simhash, g.canonical_id, g.group_size
FROM sh s JOIN groups g USING (simhash)
"""


@query(
    "dedup_simhash",
    _DOCS_NEAR_CTE + _TOKEN_HASH_CTE + _simhash_sql(),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash buckets: sign-aggregated token-hash bits; identical
    hashes = near-dup group (one-token edits usually collide)."""
    return dd.simhash_dedup(_docs_near(spark, sf_dir))


# ---------------------------------------------------------------------------
# Character n-gram Jaccard
# ---------------------------------------------------------------------------

@query(
    "dedup_ngram_jaccard",
    _DOCS_NEAR_CTE
    + """
    , norm AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
        FROM docs2
    ), grams AS (
        -- grams hashed to 32-bit md5-prefix ints, mirroring the engine
        -- (collisions fold identically on both sides)
        SELECT doc_id, unnest(list_distinct(
            list_transform(generate_series(1, length(nt) - 2),
                i -> CAST(('0x' || substr(md5(substr(nt, CAST(i AS INT), 3)),
                           1, 8)) AS BIGINT)))) AS gram
        FROM norm WHERE length(nt) >= 3
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM grams a JOIN grams b
          ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.inter AS DOUBLE)
               / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.inter AS DOUBLE)
          / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= 0.6
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-3-gram Jaccard near-dup pairs (>= 0.6) via inverted index."""
    return dd.ngram_jaccard_pairs(_docs_near(spark, sf_dir), n=3, threshold=0.6)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_COS = (
    "list_dot_product(qv, cv) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
)


@query(
    "similarity_topk_bruteforce",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 20
    ), c AS (
        SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id, {_COS} AS sim
        FROM c CROSS JOIN q
        WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 per query vector (ids < 20): broadcast queries,
    stream the corpus, rank with a deterministic tie-break. The contract
    is (query, neighbor, rank) — ranks, not raw floats."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.brute_force_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)


def _planes_sql() -> str:
    rows = []
    for p, signs in enumerate(sim.hyperplane_signs(8, 64)):
        arr = "[" + ", ".join(f"{float(s)}" for s in signs) + "]"
        rows.append(
            f"(CASE WHEN list_dot_product(v, CAST({arr} AS DOUBLE[])) > 0 "
            f"THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(rows)


@query(
    "similarity_lsh_topk",
    f"""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), sig AS (
        SELECT vec_id, {_planes_sql()} AS bucket FROM vecs
    ), c AS (
        SELECT s.bucket, v.vec_id AS neighbor_id, v.v AS cv
        FROM vecs v JOIN sig s USING (vec_id)
    ), q AS (
        SELECT s.bucket, v.vec_id AS query_id, v.v AS qv
        FROM vecs v JOIN sig s USING (vec_id) WHERE v.vec_id < 50
    ), scored AS (
        SELECT query_id, neighbor_id, {_COS} AS sim
        FROM c JOIN q USING (bucket)
        WHERE query_id <> neighbor_id
    )
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN path: 8-bit random-hyperplane LSH buckets -> exact cosine
    re-rank inside the bucket. Candidate count per query drops from n to
    ~n/256 per table; recall tunes with planes/tables."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.lsh_topk(emb, emb.filter(F.col("vec_id") < 50), k=5)


@query(
    "embedding_near_duplicates",
    f"""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), sig AS (
        SELECT vec_id, {_planes_sql()} AS bucket FROM vecs
    ), a AS (
        SELECT s.bucket, v.vec_id, v.v FROM vecs v JOIN sig s USING (vec_id)
    )
    SELECT x.vec_id AS id_a, y.vec_id AS id_b,
           list_dot_product(x.v, y.v)
             / (sqrt(list_dot_product(x.v, x.v))
                * sqrt(list_dot_product(y.v, y.v))) AS sim
    FROM a x JOIN a y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE list_dot_product(x.v, y.v)
          / (sqrt(list_dot_product(x.v, x.v))
             * sqrt(list_dot_product(y.v, y.v))) >= 0.3
    """,
)
def embedding_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed (threshold 0.3 — this
    corpus has no tighter natural dups; the operator exposes the knob)."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.embedding_near_duplicates(emb, threshold=0.3)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def _stoplist_sql(code: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in tx.STOPWORDS[code]) + "]"


_LANG_VOTE_SQL = f"""
, toks AS (
    SELECT doc_id, list_distinct({_TOKS}) AS tl FROM docs2
), votes AS (
    SELECT doc_id,
           len(list_intersect(tl, {_stoplist_sql('de')})) AS v_de,
           len(list_intersect(tl, {_stoplist_sql('en')})) AS v_en,
           len(list_intersect(tl, {_stoplist_sql('es')})) AS v_es,
           len(list_intersect(tl, {_stoplist_sql('fr')})) AS v_fr
    FROM toks
)
"""


@query(
    "text_metrics",
    """
WITH docs2 AS (SELECT doc_id, text, lang FROM documents)
"""
    + _LANG_VOTE_SQL
    + f"""
, metrics AS (
    SELECT d.doc_id, d.lang,
           CAST(length(d.text) AS BIGINT) AS n_chars,
           CAST(len(list_filter(regexp_split_to_array(lower(trim(d.text)),
                '\\s+'), x -> x != '')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(d.text,
                '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
               AS n_bpe_tokens,
           CASE WHEN length(d.text) > 0 THEN
                CAST(length(d.text) - length(regexp_replace(d.text,
                     '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                / CAST(length(d.text) AS DOUBLE)
           ELSE 0.0 END AS punct_ratio,
           CASE WHEN length(d.text) > 0 THEN
                CAST(length(regexp_replace(d.text, '[^一-鿿]', '', 'g'))
                     AS DOUBLE) / CAST(length(d.text) AS DOUBLE)
           ELSE 0.0 END AS cjk_ratio,
           md5(trim(regexp_replace(lower(d.text), '\\s+', ' ', 'g')))
               AS fingerprint,
           v.v_de, v.v_en, v.v_es, v.v_fr,
           greatest(v.v_de, v.v_en, v.v_es, v.v_fr) AS best
    FROM docs2 d JOIN votes v USING (doc_id)
)
SELECT doc_id, lang, n_chars, n_tokens, n_bpe_tokens, punct_ratio,
       fingerprint,
       CASE WHEN cjk_ratio > 0.2 THEN 'zh'
            WHEN best <= 0 THEN 'und'
            WHEN v_de = best THEN 'de'
            WHEN v_en = best THEN 'en'
            WHEN v_es = best THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM metrics
""",
)
def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text battery: char/token/BPE-ish counts, punctuation
    ratio, md5 fingerprint, and n-gram/stopword language ID — all native
    column algebra inside whole-stage codegen."""
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        F.length(t).cast("long").alias("n_chars"),
        tx.token_count(t).cast("long").alias("n_tokens"),
        tx.bpe_ish_token_count(t).cast("long").alias("n_bpe_tokens"),
        tx.punct_ratio(t).alias("punct_ratio"),
        tx.fingerprint(t).alias("fingerprint"),
        tx.lang_id(t).alias("lang_pred"),
    )


_STOP_EN_SQL = "[" + ", ".join(f"'{w}'" for w in tx.STOPWORDS["en"]) + "]"


@query(
    "text_quality_score",
    f"""
    WITH toks AS (
        SELECT doc_id, text,
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                           x -> x != '') AS tl
        FROM documents
    ), m AS (
        SELECT doc_id,
               CAST(len(tl) AS DOUBLE) AS n_tok,
               CASE WHEN length(text) > 0 THEN
                    CAST(length(text) - length(regexp_replace(text,
                         '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE)
               ELSE 0.0 END AS punct,
               CASE WHEN len(tl) > 0 THEN
                    CAST(len(list_filter(tl,
                         x -> list_contains({_STOP_EN_SQL}, x))) AS DOUBLE)
                    / CAST(len(tl) AS DOUBLE)
               ELSE 0.0 END AS sw
        FROM toks
    )
    SELECT doc_id,
           sw AS stopword_ratio_en,
           CAST(ROUND(CAST(
               least(n_tok / 20.0, 1.0) * 0.4
               + greatest(0.0, 1.0 - punct * 4.0) * 0.3
               + least(sw * 5.0, 1.0) * 0.3
               AS DECIMAL(10,6)), 4) AS DOUBLE) AS quality_score
    FROM m
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite heuristic quality score (length sweet-spot, punctuation
    penalty, function-word presence) — the cheap pre-filter stage of a
    training-data pipeline, all in codegen."""
    docs = load(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        tx.stopword_ratio(t).alias("stopword_ratio_en"),
        tx.quality_score(t).alias("quality_score"),
    )


@query(
    "text_tfidf_top_terms",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ), dfreq AS (
        SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, doc_freq, rank FROM (
        SELECT t.doc_id, t.term, t.tf, d.doc_freq,
               row_number() OVER (PARTITION BY t.doc_id ORDER BY
                   t.tf * (ln((n.n_docs + 1) / (d.doc_freq + 1)) + 1) DESC,
                   t.term) AS rank
        FROM tf t JOIN dfreq d USING (term) CROSS JOIN n
    ) WHERE rank <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (smoothed idf) — the classic
    keyword-extraction / relevance primitive over the documents table.
    Rank + exact integer (tf, doc_freq) are the contract; the float
    score stays internal (ln is libm-dependent in the last ulp)."""
    docs = load(spark, sf_dir, "documents")
    return tx.tfidf_top_terms(docs, k=3)


@query(
    "text_repetition_filter",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS tl FROM documents
    ), wstats AS (
        SELECT doc_id, MAX(c) AS max_w, SUM(c) AS n_w FROM (
            SELECT doc_id, w, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(tl) AS w FROM toks)
            GROUP BY 1, 2
        ) GROUP BY doc_id
    ), bstats AS (
        SELECT doc_id, MAX(c) AS max_bg, SUM(c) AS n_bg FROM (
            SELECT doc_id, bg, COUNT(*) AS c FROM (
                SELECT doc_id,
                       unnest(CASE WHEN len(tl) >= 2 THEN
                           list_transform(generate_series(1, len(tl) - 1),
                               i -> tl[CAST(i AS INT)] || ' '
                                    || tl[CAST(i + 1 AS INT)])
                           ELSE CAST([] AS VARCHAR[]) END) AS bg
                FROM toks
            ) GROUP BY 1, 2
        ) GROUP BY doc_id
    ), fracs AS (
        SELECT t.doc_id,
               CAST(len(t.tl) AS BIGINT) AS n_tokens,
               CASE WHEN w.n_w > 0
                    THEN CAST(w.max_w AS DOUBLE) / CAST(w.n_w AS DOUBLE)
                    ELSE 0.0 END AS top_word_frac,
               CASE WHEN b.n_bg > 0
                    THEN CAST(b.max_bg AS DOUBLE) / CAST(b.n_bg AS DOUBLE)
                    ELSE 0.0 END AS top_bigram_frac
        FROM toks t
        LEFT JOIN wstats w USING (doc_id)
        LEFT JOIN bstats b USING (doc_id)
    )
    SELECT doc_id, n_tokens, top_word_frac, top_bigram_frac,
           (top_word_frac <= 0.2 AND top_bigram_frac <= 0.18) AS keep
    FROM fracs
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality gate (Gopher-style): most-frequent-word and
    most-frequent-bigram fractions per document with keep/drop ceilings
    (0.2 / 0.18) — the standard boilerplate/spam screen ahead of
    pre-training. Exact-integer divisions; wordcount-shaped shuffles."""
    docs = load(spark, sf_dir, "documents")
    return tx.repetition_metrics(docs)


# Parameterized so every quality-consuming oracle (keep-best election,
# weighted sampling) shares ONE copy of the score formula.
_QUALITY_CTE_TEMPLATE = f"""
, qm AS (
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(lower(trim(text)),
                    '\\s+'), x -> x != '')) AS DOUBLE) AS n_tok,
           CASE WHEN length(text) > 0 THEN
                CAST(length(text) - length(regexp_replace(text,
                     '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                / CAST(length(text) AS DOUBLE)
           ELSE 0.0 END AS punct,
           CASE WHEN len(list_filter(regexp_split_to_array(lower(trim(text)),
                    '\\s+'), x -> x != '')) > 0 THEN
                CAST(len(list_filter(list_filter(regexp_split_to_array(
                         lower(trim(text)), '\\s+'), x -> x != ''),
                     x -> list_contains({_STOP_EN_SQL}, x))) AS DOUBLE)
                / CAST(len(list_filter(regexp_split_to_array(
                      lower(trim(text)), '\\s+'), x -> x != '')) AS DOUBLE)
           ELSE 0.0 END AS sw
    FROM {{src}}
), q AS (
    SELECT doc_id,
           CAST(ROUND(CAST(
               least(n_tok / 20.0, 1.0) * 0.4
               + greatest(0.0, 1.0 - punct * 4.0) * 0.3
               + least(sw * 5.0, 1.0) * 0.3
               AS DECIMAL(10,6)), 4) AS DOUBLE) AS quality_score
    FROM qm
)
"""


def _quality_cte(src: str) -> str:
    return _QUALITY_CTE_TEMPLATE.replace("{src}", src)


@query(
    "dedup_canonical_keep_best",
    _CC_CTES
    + _quality_cte("docs2")
    + """
    SELECT c.doc_id, c.component_id, q.quality_score,
           CAST(COUNT(*) OVER (PARTITION BY c.component_id) AS BIGINT)
               AS group_size,
           (row_number() OVER (PARTITION BY c.component_id
                               ORDER BY q.quality_score DESC, c.doc_id) = 1)
               AS keep
    FROM comp c JOIN q USING (doc_id)
    """,
)
def dedup_canonical_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup end-game: near-dup pair graph -> connected components ->
    per-cluster canonical election by quality score (rounded 4 dp, doc_id
    tie-break). Every doc keeps its verdict so curation can filter
    keep=true or audit the dropped side."""
    docs = _docs_near(spark, sf_dir)
    pairs = dd.minhash_dedup(docs, threshold=0.8)
    comps = dd.connected_components(docs.select("doc_id"), pairs)
    quality = docs.select(
        "doc_id", tx.quality_score(F.col("text")).alias("quality_score")
    )
    return dd.canonical_keep_best(comps, quality)


@query(
    "sample_weighted_by_quality",
    "WITH docs2 AS (SELECT doc_id, text FROM documents)"
    + _quality_cte("docs2")
    + """
    SELECT doc_id, quality_score
    FROM q
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))
               AS BIGINT) % 100
          < floor(60.0 * quality_score)
    """,
)
def sample_weighted_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-WEIGHTED deterministic sampling: keep probability is 60%
    scaled by each document's quality score — the curation move that
    upsamples clean documents without an RNG. Membership is a pure
    function of (doc_id, score): stable across runs, repartitions, and
    engines (the oracle reproduces the exact row set)."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", tx.quality_score(F.col("text")).alias("quality_score")
    )
    return smp.weighted_hash_sample(
        scored, "quality_score", "doc_id", base_pct=60
    )


@query(
    "text_chunk_documents",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS tl FROM documents
    ), starts AS (
        SELECT doc_id, tl,
               unnest(list_filter(
                   generate_series(1, greatest(len(tl), 1), 48),
                   s -> s <= len(tl))) AS start
        FROM toks
    )
    SELECT doc_id,
           CAST((start - 1) // 48 AS BIGINT) AS chunk_no,
           CAST(start AS BIGINT) AS start_token,
           CAST(len(tl[CAST(start AS INT):CAST(least(start + 63, len(tl))
                AS INT)]) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(tl[CAST(start AS INT):CAST(least(start + 63,
               len(tl)) AS INT)], ' ')) AS chunk_hash
    FROM starts WHERE len(tl) > 0
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token chunks with 16-token overlap per document — the context-
    window preprocessing of a training/RAG pipeline. Shuffle-free
    projection + explode; chunk payload carried as md5 so the contract
    stays compact."""
    docs = load(spark, sf_dir, "documents")
    return tx.chunk_documents(docs, chunk_tokens=64, overlap=16)


# Shared Spark-expr / DuckDB-SQL dirtying expression (STRING is a valid
# type alias in both parsers; VARCHAR needs a length under Spark).
_PII_DIRTY = (
    "text || ' contact user' || CAST(doc_id AS STRING)"
    " || '@example.com or 10.0.0.' || CAST(doc_id % 256 AS STRING)"
    " || ' tel 555-' || lpad(CAST(doc_id % 1000 AS STRING), 3, '0')"
    " || '-0199'"
)


@query(
    "text_redact_pii",
    f"""
    WITH dirty AS (
        SELECT doc_id, {_PII_DIRTY} AS text FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}'))
               AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text,
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b'))
               AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(text,
               '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
               '<EMAIL>', 'g'),
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
               '<IP>', 'g'),
               '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b',
               '<PHONE>', 'g')) AS redacted_hash
    FROM dirty
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over a deterministically dirtied corpus (every doc gets
    a planted email, IPv4 and phone): per-doc match counts + md5 of the
    redacted text. ASCII-only regex-dialect-portable patterns; codegen
    projection, no shuffle."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_PII_DIRTY).alias("text"),
    )
    return tx.redact_pii(docs)


_WINNOW_FP_CTES = """
    WITH norm AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
        FROM documents
    ), grams AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(nt) - 4),
                   i -> CAST(('0x' || substr(md5(substr(nt, CAST(i AS INT), 5)),
                              1, 8)) AS BIGINT)) AS gh
        FROM norm WHERE length(nt) >= 5
    ), sel AS (
        SELECT doc_id,
               CASE WHEN len(gh) >= 4 THEN
                    list_distinct(list_transform(
                        generate_series(1, len(gh) - 3),
                        j -> list_min(gh[CAST(j AS INT):CAST(j + 3 AS INT)])))
               ELSE [list_min(gh)] END AS fps
        FROM grams
    ), fp AS (
        SELECT DISTINCT doc_id, unnest(fps) AS fingerprint FROM sel
    )
"""


@query(
    "text_winnowing_fingerprints",
    _WINNOW_FP_CTES + "SELECT doc_id, fingerprint FROM fp",
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash) fingerprints: min-hash of each 4-window of
    char-5-gram hashes — plagiarism/near-dup fingerprints at ~2/(w+1)
    storage, hash-for-hash reproducible."""
    docs = load(spark, sf_dir, "documents")
    return tx.winnowing_fingerprints(docs, k=5, w=4)


@query(
    "text_winnowing_overlap_pairs",
    _WINNOW_FP_CTES + """
    , rare AS (
        SELECT fingerprint FROM fp GROUP BY fingerprint
        HAVING COUNT(*) <= 10
    ), fpr AS (
        SELECT fp.doc_id, fp.fingerprint FROM fp JOIN rare USING (fingerprint)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fingerprints
    FROM fpr a JOIN fpr b
      ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def text_winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style overlap retrieval: document pairs sharing >= 3
    DISCRIMINATIVE winnowing fingerprints (document frequency <= 10 —
    boilerplate hashes are excluded before the self-join, which is both
    the signal and the anti-quadratic scale rule). Only 8-byte hashes
    join; the text never moves."""
    docs = load(spark, sf_dir, "documents")
    return tx.winnowing_overlap_pairs(docs, min_shared=3, max_df=10, k=5, w=4)


@query(
    "text_pack_sequences",
    f"""
    WITH ptoks AS (
        SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents
    ), packed AS (
        SELECT doc_id, source AS shard, n_tokens,
               CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tokens AS BIGINT) AS start_token
        FROM ptoks
    )
    SELECT doc_id, shard, n_tokens, start_token,
           CAST(start_token // 512 AS BIGINT) AS bin_id,
           CAST(start_token % 512 AS BIGINT) AS bin_offset
    FROM packed
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing layout: concatenate each source shard's docs in
    id order and cut the token stream into 512-token training sequences,
    reporting each doc's (bin, offset). One running-sum window per
    shard; shards pack in parallel, no global ordering pass."""
    docs = load(spark, sf_dir, "documents")
    return tx.pack_sequences(docs, 512)


# Incremental dedup corpus: 90% of ids (doc_id % 10 != 0) are the
# indexed corpus; the ~10% batch is the doc_id % 10 == 0 slice plus
# near-copies (+200000, one token appended) of every 7th corpus doc —
# planting guaranteed new-vs-corpus near-dup pairs. A modulus split (not
# an id cutoff) keeps the batch-to-corpus ratio fixed at every scale
# factor. The oracle runs the FULL minhash pipeline over corpus+batch
# and keeps only pairs touching the batch: exactly what the incremental
# path must emit.
_INCR_BATCH_PRED = "(doc_id % 10 = 0 OR doc_id >= 200000)"
_INCR_DOCS_CTE = """
WITH docs2 AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 200000 AS doc_id, text || ' zzextra' AS text
    FROM documents WHERE doc_id % 10 != 0 AND doc_id % 7 = 0
)
"""


@query(
    "dedup_minhash_incremental",
    _INCR_DOCS_CTE
    + _LSH_PAIR_CTES
    + _LSH_PAIR_SELECT.replace(
        ">= 0.8",
        ">= 0.8 AND ("
        + _INCR_BATCH_PRED.replace("doc_id", "i.doc_a")
        + " OR "
        + _INCR_BATCH_PRED.replace("doc_id", "i.doc_b")
        + ")",
    ),
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state dedup: a ~10% batch (doc_id % 10 == 0, plus planted
    near-copies of corpus docs) is signed and probed against the
    PERSISTED index of the other 90% — the corpus is never re-tokenized
    or re-signed, so per-batch cost scales with the increment, not the
    accumulated 100 TB. Must equal the full recompute's pairs
    restricted to those touching the batch (the oracle computes exactly
    that)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0).unionByName(
        corpus.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzextra")).alias("text"),
        )
    )
    index_sets, index_sigs = dd.minhash_index(corpus)
    # Auto flag selection (r5 verdict item 3): this fixture's index is
    # live lineage, not a stored table, so its row count is genuinely
    # unknown — exactly the regime the auto rule maps to "no prune,
    # don't pay a counting pass" (and the batch is ~25% of the corpus,
    # so the prune would lose anyway). The pruned path stays
    # oracle-verified by dedup_minhash_incremental_pruned's
    # steady-state fixture below, which opts in explicitly.
    return dd.incremental_minhash_dedup(
        batch, index_sets, index_sigs, threshold=0.8,
    )


# Steady-state incremental-dedup fixture: a ~2% batch (doc_id % 50 == 0
# plus near-copies of every 31st corpus doc) probes the other 98% — the
# small-batch/large-index regime where prune_index_read pays off. Same
# oracle construction as above: full recompute restricted to pairs
# touching the batch.
_INCR_SS_BATCH_PRED = "(doc_id % 50 = 0 OR doc_id >= 200000)"
_INCR_SS_DOCS_CTE = """
WITH docs2 AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 200000 AS doc_id, text || ' zzextra' AS text
    FROM documents WHERE doc_id % 50 != 0 AND doc_id % 31 = 0
)
"""


@query(
    "dedup_minhash_incremental_pruned",
    _INCR_SS_DOCS_CTE
    + _LSH_PAIR_CTES
    + _LSH_PAIR_SELECT.replace(
        ">= 0.8",
        ">= 0.8 AND ("
        + _INCR_SS_BATCH_PRED.replace("doc_id", "i.doc_a")
        + " OR "
        + _INCR_SS_BATCH_PRED.replace("doc_id", "i.doc_b")
        + ")",
    ),
)
def dedup_minhash_incremental_pruned(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The pruned steady-state deployment config on the shape it is FOR:
    a ~2% batch (every 50th doc, plus planted near-copies of every 31st
    corpus doc) probes the persisted index of the other 98%, and the
    stored token-set read is semi-join-pruned to collision ids — the
    candidate set is O(batch collisions), so at 100 TB the untouched
    corpus' hash arrays never enter the verify shuffle. Must equal the
    full recompute's pairs restricted to those touching the batch."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    batch = docs.filter(F.col("doc_id") % 50 == 0).unionByName(
        corpus.filter(F.col("doc_id") % 31 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzextra")).alias("text"),
        )
    )
    index_sets, index_sigs = dd.minhash_index(corpus)
    return dd.incremental_minhash_dedup(
        batch, index_sets, index_sigs, threshold=0.8,
        prune_index_read=True,
    )


@query(
    "governance_validate_rules",
    """
    WITH lcl AS (
        SELECT CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS v0,
               CAST(COUNT(CAST(o_orderkey AS VARCHAR))
                    - COUNT(DISTINCT CAST(o_orderkey AS VARCHAR))
                    AS BIGINT) AS v1,
               CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('F', 'O', 'P')
                             THEN 1 ELSE 0 END) AS BIGINT) AS v2,
               CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                              AND (o_totalprice < 0
                                   OR o_totalprice > 10000000)
                             THEN 1 ELSE 0 END) AS BIGINT) AS v3
        FROM orders
    ), ref AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS v4 FROM (
            SELECT o.o_custkey FROM orders o
            LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
              ON o.o_custkey = c.c_custkey
            WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
        )
    ), rows_ AS (
        SELECT 'orderkey_not_null' AS rule_name, 'not_null' AS kind,
               v0 AS n_violations FROM lcl
        UNION ALL SELECT 'orderkey_unique', 'unique', v1 FROM lcl
        UNION ALL SELECT 'status_accepted', 'accepted_values', v2 FROM lcl
        UNION ALL SELECT 'price_in_range', 'range', v3 FROM lcl
        UNION ALL SELECT 'custkey_exists', 'referential', v4 FROM ref
    )
    SELECT rule_name, kind, n_violations,
           (n_violations = 0) AS passed
    FROM rows_
    """,
)
def governance_validate_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint validation over orders: five rule kinds
    (not-null, uniqueness, accepted values, numeric range, referential
    to customer) — the reference's hardcoded quality battery as a
    reusable rules engine. All row-local + uniqueness rules share ONE
    scan; the referential probe is one anti-join."""
    from _event_intelligence_data_warehouse_spark.operators import (
        validate as vl,
    )

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    rules = [
        vl.not_null("orderkey_not_null", "o_orderkey"),
        vl.unique("orderkey_unique", ["o_orderkey"]),
        vl.accepted_values("status_accepted", "o_orderstatus",
                           ["F", "O", "P"]),
        vl.value_range("price_in_range", "o_totalprice", 0, 10_000_000),
        vl.referential("custkey_exists", "o_custkey", customer,
                       "c_custkey"),
    ]
    return vl.validate(orders, rules)


@query(
    "cdc_snapshot_diff",
    """
    WITH old_t AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    ), new_t AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                    ELSE o_totalprice END AS o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 13 != 0
        UNION ALL
        SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice,
               o_orderstatus
        FROM orders WHERE o_orderkey % 17 = 0
    ), d AS (
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    WHEN (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
                      OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
                    THEN 'update' END AS change
        FROM old_t o FULL OUTER JOIN new_t n USING (o_orderkey)
    )
    SELECT o_orderkey, change FROM d WHERE change IS NOT NULL
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change feed recovered from two snapshots (deterministically
    mutated orders: %13 keys deleted, %7 prices bumped, %17 keys
    re-inserted under new ids): one full outer key join, null-safe
    column comparison, rows only for changed keys — the feed an
    incremental consumer wants when the source has no native CDC.

    Why the SMJ exchange here is load-bearing: the fixture SYNTHESIZES
    the new snapshot from the same unbucketed scan, so the full-outer
    join must cluster both sides once. Real snapshot pairs live
    warehouse-resident; written co-bucketed on the key (bucketing.py)
    the identical diff plan is exchange-free —
    tests/test_bucketing.py::
    test_reconciliation_shape_on_bucketed_warehouse_zero_exchange
    pins the shape."""
    from _event_intelligence_data_warehouse_spark.operators import (
        upsert as up,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    new = orders.filter(k % 13 != 0).withColumn(
        "o_totalprice",
        F.when(k % 7 == 0, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    ).unionByName(
        orders.filter(k % 17 == 0).select(
            (k + 10000000).alias("o_orderkey"),
            "o_totalprice",
            "o_orderstatus",
        )
    )
    return up.snapshot_diff(orders, new, ["o_orderkey"])


# Mixture geometry shared by the Spark calls and their oracles: integer
# weights, token budget, and the VALUES-list rendering of the weight map.
_MIX_WEIGHTS = {"src0": 8, "src1": 4, "src2": 2, "src3": 1, "src4": 1}
_MIX_BUDGET = 4000
_MIX_WSUM = sum(_MIX_WEIGHTS.values())
_MIX_VALUES = ", ".join(
    f"('{k}', {v})" for k, v in sorted(_MIX_WEIGHTS.items())
)

_MIX_PLAN_CTE = f"""
WITH mtoks AS (
    SELECT source, len({_TOKS}) AS nt FROM documents
), magg AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens
    FROM mtoks GROUP BY source
), mwts AS (
    SELECT * FROM (VALUES {_MIX_VALUES}) w(source, wt)
), mplan AS (
    -- HUGEINT (int128) intermediates: budget*weight and target*1e6
    -- overflow int64 at ~1e13-token budgets; hugeint // is exact
    -- integer division (decimal // would ROUND the quotient first).
    SELECT a.source, a.n_docs, a.n_tokens,
           CAST(coalesce(w.wt, 0) AS BIGINT) AS weight,
           CAST((CAST({_MIX_BUDGET} AS HUGEINT) * coalesce(w.wt, 0))
                // {_MIX_WSUM} AS BIGINT) AS target_tokens,
           -- n_tokens = 0 -> rate 0 (guard matches the Spark side:
           -- HUGEINT // would raise on zero, Spark would NULL)
           CASE WHEN a.n_tokens = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(least(1000000, CAST(
                     ((CAST({_MIX_BUDGET} AS HUGEINT) * coalesce(w.wt, 0))
                          // {_MIX_WSUM} * 1000000) // a.n_tokens AS BIGINT))
                AS BIGINT) END AS rate_ppm
    FROM magg a LEFT JOIN mwts w USING (source)
)
"""


@query(
    "curation_mixture_plan",
    _MIX_PLAN_CTE + "SELECT * FROM mplan",
)
def curation_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture plan: split a 4000-token budget across
    sources by integer weight (src0 x8 ... src4 x1; unweighted sources
    audit at weight 0), reporting each source's deterministic sampling
    rate in ppm. Pure int64 arithmetic — the plan is bit-identical on
    every engine."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    docs = load(spark, sf_dir, "documents")
    return smp.mixture_plan(docs, _MIX_WEIGHTS, _MIX_BUDGET)


@query(
    "curation_mixture_sample",
    _MIX_PLAN_CTE + """
SELECT d.doc_id, d.source
FROM documents d JOIN mplan p USING (source)
WHERE (CAST(('0x' || substr(md5(d.source || '|'
            || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000)
      < p.rate_ppm
""",
)
def curation_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the mixture plan: md5-bucket each (source, doc) pair into
    [0, 1M) and keep it under its source's rate_ppm — a stable,
    RNG-free training mix whose membership survives re-runs,
    repartitioning, and appends. Scan + broadcast-joined filter; the
    corpus never shuffles."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    docs = load(spark, sf_dir, "documents")
    return smp.mixture_sample(docs, _MIX_WEIGHTS, _MIX_BUDGET)


@query(
    "text_decontaminate",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(t) - 2),
                   i -> CAST(('0x' || substr(md5(
                       array_to_string(t[i:i+2], ' ')), 1, 8)) AS BIGINT)
               )) AS g
        FROM toks WHERE len(t) >= 3
    ), ex AS (
        SELECT doc_id, unnest(g) AS gram_hash FROM grams
    ), bench AS (
        SELECT doc_id AS bench_id, gram_hash FROM ex WHERE doc_id % 97 = 0
    )
    SELECT e.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM ex e JOIN bench b USING (gram_hash)
    WHERE e.doc_id <> b.bench_id
    GROUP BY e.doc_id, b.bench_id
    HAVING COUNT(*) >= 1
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3/PaLM-style n-gram overlap): flag
    corpus docs sharing word n-grams with a benchmark set (stand-in:
    doc_id % 97 == 0). Only 8-byte gram hashes join; the benchmark index
    broadcasts (bounded by the eval suite, not the corpus), so the
    corpus streams past it in one pass. n=3 suits this tiny-vocab
    corpus; production uses n=8-13."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return tx.ngram_contamination(docs, bench, n=3, min_shared=1)


# ---------------------------------------------------------------------------
# IVF similarity (second ANN path)
# ---------------------------------------------------------------------------

# Quantizer geometry shared by the Spark call and its oracle: K is a
# FIXED constant (never a function of corpus size) and training runs over
# a bounded md5-ranked sample — the round-2 n/stride seeding made both
# the per-round cost and the centroid broadcast grow with n.
_IVF_N_CELLS = 16
_IVF_MAX_TRAIN = 1024

# Two unrolled Lloyd rounds over integer-snapped vectors (mirrors
# operators.similarity.kmeans_centroids exactly): the training set is the
# MAX_TRAIN vectors ranked lowest by (md5(vec_id), vec_id) and seeds are
# that ranking's first N_CELLS ids; assignment = argmax cosine with
# (sim DESC, cell) tie-break; new centroid = component-wise BIGINT sum of
# members via (cell, pos) partial sums (exact, order-free; cosine is
# scale-invariant so the un-divided sum ranks like the mean); empty cells
# carry forward.
_VECS_SRC = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"


def _ivf_train_cte(vecs_src: str = _VECS_SRC) -> str:
    return f"""
WITH vecs AS (
    {vecs_src}
), ivecs AS (
    SELECT vec_id,
           list_transform(v, x -> CAST(floor(x * 1000000 + 0.5)
                                       AS BIGINT)) AS iv
    FROM vecs
), ranked AS (
    SELECT vec_id,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                              vec_id) AS rk
    FROM vecs
), train AS (
    SELECT i.vec_id,
           list_transform(i.iv, x -> CAST(x AS DOUBLE)) AS xd, r.rk
    FROM ivecs i JOIN ranked r USING (vec_id)
    WHERE r.rk <= {_IVF_MAX_TRAIN}
), texp AS (
    SELECT i.vec_id, unnest(i.iv) AS val,
           unnest(generate_series(1, len(i.iv))) AS pos
    FROM ivecs i JOIN ranked r USING (vec_id)
    WHERE r.rk <= {_IVF_MAX_TRAIN}
), seed AS (
    SELECT vec_id AS cell, xd AS cw FROM train WHERE rk <= {_IVF_N_CELLS}
), a1 AS (
    SELECT vec_id, cell FROM (
        SELECT x.vec_id, c.cell,
               row_number() OVER (PARTITION BY x.vec_id ORDER BY
                   list_dot_product(x.xd, c.cw)
                       / (sqrt(list_dot_product(x.xd, x.xd))
                          * sqrt(list_dot_product(c.cw, c.cw))) DESC,
                   c.cell) AS rk
        FROM train x CROSS JOIN seed c
    ) WHERE rk = 1
), s1 AS (
    SELECT a1.cell, texp.pos, SUM(texp.val) AS sx
    FROM a1 JOIN texp USING (vec_id)
    GROUP BY a1.cell, texp.pos
), cent1 AS (
    SELECT s.cell, coalesce(l.cw2, s.cw) AS cw
    FROM seed s LEFT JOIN (
        SELECT cell, list(CAST(sx AS DOUBLE) ORDER BY pos) AS cw2
        FROM s1 GROUP BY cell
    ) l USING (cell)
), a2 AS (
    SELECT vec_id, cell FROM (
        SELECT x.vec_id, c.cell,
               row_number() OVER (PARTITION BY x.vec_id ORDER BY
                   list_dot_product(x.xd, c.cw)
                       / (sqrt(list_dot_product(x.xd, x.xd))
                          * sqrt(list_dot_product(c.cw, c.cw))) DESC,
                   c.cell) AS rk
        FROM train x CROSS JOIN cent1 c
    ) WHERE rk = 1
), s2 AS (
    SELECT a2.cell, texp.pos, SUM(texp.val) AS sx
    FROM a2 JOIN texp USING (vec_id)
    GROUP BY a2.cell, texp.pos
), cents AS (
    SELECT s.cell, coalesce(l.cw2, s.cw) AS centroid
    FROM cent1 s LEFT JOIN (
        SELECT cell, list(CAST(sx AS DOUBLE) ORDER BY pos) AS cw2
        FROM s2 GROUP BY cell
    ) l USING (cell)
)
"""


_IVF_TRAIN_CTE = _ivf_train_cte()

_CELL_SCORES_CTE = """
, cell_scores AS (
    SELECT x.vec_id, c.cell,
           list_dot_product(x.v, c.centroid)
               / (sqrt(list_dot_product(x.v, x.v))
                  * sqrt(list_dot_product(c.centroid, c.centroid))) AS cs,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_dot_product(x.v, c.centroid)
                                    / (sqrt(list_dot_product(x.v, x.v))
                                       * sqrt(list_dot_product(c.centroid,
                                              c.centroid))) DESC,
                              c.cell) AS cell_rank
    FROM vecs x CROSS JOIN cents c
)
"""

_IVF_CELLS_CTE = _IVF_TRAIN_CTE + _CELL_SCORES_CTE


@query(
    "similarity_ivf_topk",
    _IVF_CELLS_CTE
    + f"""
, assign AS (
    SELECT vec_id AS neighbor_id, cell FROM cell_scores WHERE cell_rank = 1
), probes AS (
    SELECT vec_id AS query_id, cell FROM cell_scores
    WHERE cell_rank <= 2 AND vec_id < 50
), cand AS (
    SELECT DISTINCT p.query_id, a.neighbor_id
    FROM assign a JOIN probes p USING (cell)
    WHERE p.query_id <> a.neighbor_id
), scored AS (
    SELECT c.query_id, c.neighbor_id, {_COS} AS sim
    FROM cand c
    JOIN (SELECT vec_id, v AS cv FROM vecs) nv ON nv.vec_id = c.neighbor_id
    JOIN (SELECT vec_id, v AS qv FROM vecs) qv ON qv.vec_id = c.query_id
)
SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
""",
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN path: corpus partitioned into a FIXED 16 centroid cells
    (trained on a bounded md5-ranked sample), queries probe their 2
    nearest cells, exact cosine re-ranks cell members only — per-query
    work ~nprobe/n_cells of brute force, and training cost is constant
    in corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 50), k=5,
        n_cells=_IVF_N_CELLS, max_train=_IVF_MAX_TRAIN, nprobe=2,
    )


@query(
    "embedding_batch_drift",
    """
    WITH iv AS (
        SELECT CAST(vec_id % 3 AS VARCHAR) AS grp,
               list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS v
        FROM embeddings
    ), ex AS (
        SELECT grp, unnest(v) AS val,
               unnest(generate_series(1, len(v))) AS pos
        FROM iv
    ), sums AS (
        SELECT grp, pos, SUM(val) AS sx, COUNT(*) AS cnt
        FROM ex GROUP BY grp, pos
    ), sv AS (
        SELECT grp, CAST(MAX(cnt) AS BIGINT) AS n,
               list(CAST(sx AS DOUBLE) ORDER BY pos) AS v
        FROM sums GROUP BY grp
    )
    SELECT a.grp AS group_a, b.grp AS group_b,
           a.n AS n_a, b.n AS n_b,
           list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) AS centroid_cosine
    FROM sv a JOIN sv b ON a.grp < b.grp
    """,
)
def embedding_batch_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift screen across three simulated ingestion batches
    (vec_id % 3): pairwise cosine between batch centroid-sum vectors,
    computed entirely from exact BIGINT component sums (cosine's scale
    invariance makes the mean division unnecessary) — the cheap early
    warning that a new batch's embedding distribution shifted."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.embedding_drift(emb, F.col("vec_id") % 3)


# Shared recall-audit tail: per-query overlap between an `exact` and an
# `approx` CTE (both (query_id, neighbor_id, rank)). Left joins keep
# queries the approximate path missed entirely (n_overlap 0, top1 false).
_RECALL_TAIL = """
, rt_e1 AS (
    SELECT query_id, neighbor_id AS exact_top1 FROM exact WHERE rank = 1
), rt_a1 AS (
    SELECT query_id, neighbor_id AS approx_top1 FROM approx WHERE rank = 1
), rt_ov AS (
    SELECT e.query_id, COUNT(*) AS n_ov
    FROM exact e JOIN approx a USING (query_id, neighbor_id)
    GROUP BY e.query_id
), rt_base AS (
    SELECT query_id, COUNT(*) AS n_ex FROM exact GROUP BY query_id
)
SELECT b.query_id,
       CAST(b.n_ex AS BIGINT) AS n_exact,
       CAST(coalesce(rt_ov.n_ov, 0) AS BIGINT) AS n_overlap,
       coalesce(rt_e1.exact_top1 = rt_a1.approx_top1, FALSE) AS top1_match
FROM rt_base b
LEFT JOIN rt_ov USING (query_id)
JOIN rt_e1 USING (query_id)
LEFT JOIN rt_a1 ON b.query_id = rt_a1.query_id
"""

_EXACT_TOPK_CTE = f"""
, eq AS (
    SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < 50
), ec AS (
    SELECT vec_id AS neighbor_id, v AS cv FROM vecs
), escored AS (
    SELECT query_id, neighbor_id, {_COS} AS sim
    FROM ec CROSS JOIN eq
    WHERE query_id <> neighbor_id
), exact AS (
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM escored
    ) WHERE rank <= 5
)
"""


@query(
    "similarity_lsh_recall",
    f"""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), sig AS (
        SELECT vec_id, {_planes_sql()} AS bucket FROM vecs
    ), c AS (
        SELECT s.bucket, v.vec_id AS neighbor_id, v.v AS cv
        FROM vecs v JOIN sig s USING (vec_id)
    ), q AS (
        SELECT s.bucket, v.vec_id AS query_id, v.v AS qv
        FROM vecs v JOIN sig s USING (vec_id) WHERE v.vec_id < 50
    ), ascored AS (
        SELECT query_id, neighbor_id, {_COS} AS sim
        FROM c JOIN q USING (bucket)
        WHERE query_id <> neighbor_id
    ), approx AS (
        SELECT query_id, neighbor_id, rank FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rank
            FROM ascored
        ) WHERE rank <= 5
    )
    {_EXACT_TOPK_CTE}
    {_RECALL_TAIL}
    """,
)
def similarity_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit for the hyperplane-LSH ANN path: per-query top-5
    overlap (and top-1 agreement) against the exact brute-force baseline
    — the accuracy gate that justifies the bucket approximation at
    scale. Queries the approximation misses entirely score 0, not NULL."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    return sim.topk_recall(
        sim.brute_force_topk(emb, q, k=5), sim.lsh_topk(emb, q, k=5)
    )


@query(
    "similarity_ivf_recall",
    _IVF_CELLS_CTE
    + f"""
, assign AS (
    SELECT vec_id AS neighbor_id, cell FROM cell_scores WHERE cell_rank = 1
), probes AS (
    SELECT vec_id AS query_id, cell FROM cell_scores
    WHERE cell_rank <= 2 AND vec_id < 50
), cand AS (
    SELECT DISTINCT p.query_id, a.neighbor_id
    FROM assign a JOIN probes p USING (cell)
    WHERE p.query_id <> a.neighbor_id
), ascored AS (
    SELECT c.query_id, c.neighbor_id, {_COS} AS sim
    FROM cand c
    JOIN (SELECT vec_id, v AS cv FROM vecs) nv ON nv.vec_id = c.neighbor_id
    JOIN (SELECT vec_id, v AS qv FROM vecs) qv ON qv.vec_id = c.query_id
), approx AS (
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM ascored
    ) WHERE rank <= 5
)
{_EXACT_TOPK_CTE}
{_RECALL_TAIL}
""",
)
def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit for the IVF ANN path (same configuration as
    similarity_ivf_topk): per-query top-5 overlap and top-1 agreement vs
    exact search — quantifies what nprobe=2 over 16 cells trades away."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 50)
    return sim.topk_recall(
        sim.brute_force_topk(emb, q, k=5),
        sim.ivf_topk(
            emb, q, k=5,
            n_cells=_IVF_N_CELLS, max_train=_IVF_MAX_TRAIN, nprobe=2,
        ),
    )


# ---------------------------------------------------------------------------
# Multimodal + stateful streaming. Both are oracle-checked despite being
# Pandas-UDF / arbitrary-state operators: the fake codec is deterministic
# md5-byte arithmetic (payload = md5 digest repeated, so the 16-bucket
# histogram features are exact dyadic rationals count/16 — bit-identical
# across engines), and the stateful sessionizer drains a single sorted
# batch whose gap/timeout semantics are pure SQL over the batch sessions.
# ---------------------------------------------------------------------------

@query(
    "multimodal_media_features",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 63)) AS i),
    d AS (
        SELECT i, md5('media' || CAST(i AS VARCHAR)) AS h,
               CAST(512 + (i % 7) * 64 AS BIGINT) AS n_bytes
        FROM ids
    ),
    bytes AS (
        SELECT d.i,
               CAST(('0x' || substr(d.h, 2 * js.j + 1, 2)) AS INTEGER) AS byte
        FROM d CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) js
    ),
    feat AS (
        SELECT i, byte // 16 AS bucket, CAST(COUNT(*) AS DOUBLE) / 16 AS f
        FROM bytes GROUP BY 1, 2
    ),
    norms AS (SELECT i, sqrt(SUM(f * f)) AS nrm FROM feat GROUP BY i),
    sims AS (
        SELECT a.i AS qi, b.i AS ni,
               SUM(a.f * b.f) / (MAX(na.nrm) * MAX(nb.nrm)) AS sim
        FROM feat a
        JOIN feat b ON a.bucket = b.bucket AND a.i != b.i
        JOIN norms na ON na.i = a.i
        JOIN norms nb ON nb.i = b.i
        GROUP BY a.i, b.i
    ),
    top1 AS (
        SELECT qi, ni,
               row_number() OVER (PARTITION BY qi ORDER BY sim DESC, ni)
                   AS rk
        FROM sims
    )
    SELECT d.i AS media_id,
           'image' AS kind,
           CAST(32 + d.i % 16 AS BIGINT) AS width,
           CAST(24 + d.i % 9 AS BIGINT) AS height,
           d.n_bytes,
           CAST(ROUND(CAST(fs.s AS DECIMAL(10,6)), 4) AS DOUBLE)
               AS feature_sum,
           t.ni AS nearest_media_id
    FROM d
    JOIN (SELECT i, SUM(f) AS s FROM feat GROUP BY i) fs ON fs.i = d.i
    JOIN top1 t ON t.qi = d.i AND t.rk = 1
    ORDER BY media_id
    """,
)
def multimodal_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media -> decoded metadata + fixed-width feature vectors via
    Arrow-batched mapInPandas (deterministic fake codec; swap one inner
    function for PIL/ffmpeg in production). Returns per-media feature
    summary plus its exact top-1 feature neighbor, proving the features
    feed the similarity operators unchanged.

    Oracle-checkable because the fake decoder is closed-form: the payload
    is the 16-byte md5 digest of ``media{i}`` repeated N/16 times, so the
    byte histogram reduces to digest_bucket_count/16 — exact in float32
    and double, hence the cosine top-1 is engine-independent."""
    from _event_intelligence_data_warehouse_spark.operators import multimodal as mm

    media = mm.synthetic_media(spark, 64)
    decoded = mm.decode_images(media, fake=True)
    feats = decoded.select(
        F.col("media_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    top1 = sim.brute_force_topk(feats, feats, k=1).select(
        F.col("query_id").alias("media_id"),
        F.col("neighbor_id").alias("nearest_media_id"),
    )
    return (
        decoded.join(top1, "media_id")
        .select(
            "media_id",
            "kind",
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            "n_bytes",
            F.round(F.aggregate(
                F.transform("features", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            ).cast("decimal(10,6)"), 4).cast("double").alias("feature_sum"),
            "nearest_media_id",
        )
        .orderBy("media_id")
    )


@query(
    "streaming_stateful_sessions",
    """
    WITH ordered AS (
        SELECT user_id,
               CAST(ts AS TIMESTAMP) AS tts,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               lag(epoch_us(CAST(ts AS TIMESTAMP)))
                   OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
        FROM events
    ), flagged AS (
        SELECT *, CASE WHEN us - prev_us > 1800000000 THEN 1 ELSE 0 END
                      AS new_session
        FROM ordered
    ), sessions AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                                         ROWS UNBOUNDED PRECEDING) AS seq
        FROM flagged
    ), sess AS (
        SELECT user_id, seq,
               MIN(tts) AS session_start,
               MAX(tts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(us) AS last_us
        FROM sessions GROUP BY user_id, seq
    ), wm AS (
        SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 1000) - 1800000
                   AS wm_ms
        FROM events
    ), labeled AS (
        SELECT s.user_id, s.session_start, s.session_end, s.n_events,
               CASE WHEN seq < MAX(seq) OVER (PARTITION BY s.user_id)
                        THEN 'gap'
                    WHEN last_us // 1000 + 1800000 < (SELECT wm_ms FROM wm)
                        THEN 'timeout'
               END AS close_reason
        FROM sess s
    )
    SELECT user_id, session_start, session_end, n_events, close_reason
    FROM labeled WHERE close_reason IS NOT NULL
    """,
)
def streaming_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-sessionization as a *stateful streaming* operator
    (applyInPandasWithState + event-time timeout), drained with
    Trigger.AvailableNow over the events table staged as a file stream.

    Oracle-checked: the input is staged as ONE ts-sorted file so exactly
    one data batch runs (watermark 0 — nothing late-dropped), then the
    follow-up batch fires event-time timeouts at the final watermark
    (max ts - 30 min). That makes the emitted set pure SQL over the batch
    sessions: every non-trailing session closes with 'gap'; a user's
    trailing session emits 'timeout' iff last_ms + gap < watermark_ms
    (strict <, Spark's timeout predicate). The gap test is microsecond-
    exact, matching the operator (the batch twin window_sessionize
    compares second-truncated — a deliberately different contract)."""
    from _event_intelligence_data_warehouse_spark.contract import staging_dir
    from _event_intelligence_data_warehouse_spark.streaming import stateful

    tmp = staging_dir("stateful_sessions", sf_dir)
    src, out, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    (
        load(spark, sf_dir, "events")
        .repartition(1)
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(src)
    )
    stateful.run_stateful_sessionize(spark, src, out, ckpt, gap_minutes=30)
    sessions = spark.read.parquet(out)
    return sessions.select(
        "user_id",
        "session_start",
        "session_end",
        F.col("n_events").cast("long").alias("n_events"),
        "close_reason",
    )


@query(
    "streaming_dedup_within_watermark",
    """
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           CAST(value AS DOUBLE) AS value
    FROM events
    """,
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark) drained with
    Trigger.AvailableNow over the events table with planted duplicate
    copies (every 13th event repeated). Duplicates are exact row copies
    arriving in the same batch — inside any watermark horizon — so the
    emitted stream must equal the original table: the oracle is the
    plain events relation."""
    from _event_intelligence_data_warehouse_spark.contract import staging_dir
    from _event_intelligence_data_warehouse_spark.streaming import jobs

    tmp = staging_dir("stream_dedup", sf_dir)
    src, out, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    e = load(spark, sf_dir, "events")
    dirty = e.unionByName(e.filter(F.col("event_id") % 13 == 0))
    (
        dirty.repartition(1)
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite")
        .parquet(src)
    )
    stream = jobs.read_event_stream(spark, src)
    deduped = jobs.dedup_event_stream(stream, keys=["event_id"]).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    jobs.run_available_now(stream, deduped, out, ckpt)
    return spark.read.parquet(out)


@query(
    "cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE))
                   AS cohort_date
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        FROM events
    )
    SELECT f.cohort_date,
           date_diff('day', f.cohort_date, a.d) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM firsts f JOIN activity a USING (user_id)
    WHERE date_diff('day', f.cohort_date, a.d) <= 28
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity date,
    counted on each later active day up to a 28-day horizon — the
    standard product-analytics rollup over the event stream. One
    aggregate for cohorts (broadcastable: one row per user), one
    distinct-activity aggregate, an equi-join on user, and the final
    (cohort, offset) count."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    firsts = e.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    activity = e.distinct()
    return (
        activity.join(firsts, "user_id")
        .withColumn("day_offset", F.datediff("d", "cohort_date").cast("long"))
        .filter(F.col("day_offset") <= 28)
        .groupBy("cohort_date", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# One HLL branch per analyzed column, mirrored in SQL. The harmonic sum
# is an exact BIGINT (sum of 1 << (53 - rank)); 256 float 2^-rank terms
# would overflow double's significand and go accumulation-order-dependent.
# Single estimate expression shared by every HLL oracle — the alpha
# constant / 640 threshold / rounding must stay bit-identical to
# operators.sketches._hll_estimate_col, so exactly one SQL copy exists.
_HLL_EST_SQL = """
    CAST(ROUND(CAST(
        CASE WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                  / (CAST(s_total AS DOUBLE) / 9007199254740992.0) <= 640.0
             AND 256 - present > 0
             THEN 256.0 * ln(256.0 / CAST(256 - present AS DOUBLE))
             ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                  / (CAST(s_total AS DOUBLE) / 9007199254740992.0)
        END AS DECIMAL(18,6)), 2) AS DOUBLE)
"""


def _hll_sql(table: str, col: str) -> str:
    return f"""
    SELECT '{col}' AS column_name,
           {_HLL_EST_SQL} AS hll_estimate,
           exact_distinct
    FROM (
        SELECT COUNT(*) AS present,
               CAST(SUM(CAST(1 AS BIGINT) << (53 - m_j))
                    + (256 - COUNT(*)) * CAST(9007199254740992 AS BIGINT)
                    AS BIGINT) AS s_total,
               (SELECT CAST(COUNT(DISTINCT {col}) AS BIGINT) FROM {table})
                   AS exact_distinct
        FROM (
            SELECT idx, MAX(rank) AS m_j FROM (
                SELECT hv % 256 AS idx,
                       CASE WHEN hv // 256 > 0
                            THEN 53 - length(bin(hv // 256))
                            ELSE 53 END AS rank
                FROM (
                    SELECT CAST(('0x' || substr(md5(CAST({col} AS STRING)),
                                 1, 15)) AS BIGINT) AS hv
                    FROM {table}
                )
            ) GROUP BY idx
        )
    )
    """


@query(
    "sketch_hll_distinct",
    " UNION ALL ".join(
        _hll_sql("events", c) for c in ("user_id", "event_id", "event_type")
    ),
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog cardinality estimates vs exact distinct counts for
    three cardinality regimes of the events table (users ~ hundreds:
    linear-counting range; event_id: saturated registers; event_type:
    tiny). Register math is exact integers, so the sketch itself — not
    just the answer — is engine-reproducible."""
    from _event_intelligence_data_warehouse_spark.operators import sketches as sk

    e = load(spark, sf_dir, "events")
    out = None
    for c in ("user_id", "event_id", "event_type"):
        est = sk.hll_estimate(e, c).select(
            F.lit(c).alias("column_name"),
            "hll_estimate",
        )
        exact = e.agg(
            F.countDistinct(c).cast("long").alias("exact_distinct")
        )
        branch = est.crossJoin(F.broadcast(exact))
        out = branch if out is None else out.unionByName(branch)
    return out


@query(
    "sketch_hll_grouped_merge",
    f"""
    WITH rr AS (
        SELECT event_type, hv % 256 AS idx,
               CASE WHEN hv // 256 > 0 THEN 53 - length(bin(hv // 256))
                    ELSE 53 END AS rank
        FROM (
            SELECT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS STRING)), 1, 15))
                        AS BIGINT) AS hv
            FROM events
        )
    ), regs AS (
        SELECT event_type, idx, MAX(rank) AS m_j
        FROM rr GROUP BY 1, 2
    ), per_group AS (
        SELECT CAST(event_type AS STRING) AS group_name,
               COUNT(*) AS present,
               CAST(SUM(CAST(1 AS BIGINT) << (53 - m_j))
                    + (256 - COUNT(*)) * CAST(9007199254740992 AS BIGINT)
                    AS BIGINT) AS s_total
        FROM regs GROUP BY event_type
    ), merged AS (
        SELECT '__ALL__' AS group_name,
               COUNT(*) AS present,
               CAST(SUM(CAST(1 AS BIGINT) << (53 - m_j))
                    + (256 - COUNT(*)) * CAST(9007199254740992 AS BIGINT)
                    AS BIGINT) AS s_total
        FROM (SELECT idx, MAX(m_j) AS m_j FROM regs GROUP BY idx)
    )
    SELECT group_name, {_HLL_EST_SQL} AS hll_estimate FROM per_group
    UNION ALL
    SELECT group_name, {_HLL_EST_SQL} AS hll_estimate FROM merged
    """,
)
def sketch_hll_grouped_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL user cardinalities plus the register-MERGED
    total (__ALL__): partial sketches combine by per-index max, so the
    merged estimate is identical to sketching the full input — the
    associativity that turns a 1000-executor scan (or stored hourly
    sketches) into one KB-sized reduce."""
    from _event_intelligence_data_warehouse_spark.operators import sketches as sk

    e = load(spark, sf_dir, "events")
    return sk.hll_grouped_with_merge(e, "user_id", "event_type")


@query(
    "rollup_cascade_daily",
    """
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
           CAST(MIN(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS min_value,
           CAST(MAX(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 100.0 AS max_value
    FROM events
    GROUP BY 1, 2
    """,
)
def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade (hypertable-style): hourly partials
    from raw, daily combined FROM HOURLY, monthly from daily — stored
    partition-pruned and refreshed additively (plans/rollups.py). The
    oracle aggregates raw directly, proving the two-hop derivation loses
    nothing (re-aggregable measures, decimal-domain sums)."""
    from _event_intelligence_data_warehouse_spark.contract import staging_dir
    from _event_intelligence_data_warehouse_spark.plans import rollups
    from _event_intelligence_data_warehouse_spark.storage import Warehouse

    wh = Warehouse(spark, staging_dir("rollup_cascade", sf_dir))
    rollups.build_cascade(wh, load(spark, sf_dir, "events"))
    return wh.read(rollups.DAILY).select(
        "d",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
    )


@query(
    "embedding_quantize_int8",
    """
    SELECT vec_id,
           CAST(len(v) AS BIGINT) AS n_dims,
           CAST(list_sum(q) AS BIGINT) AS q_checksum,
           CAST(ROUND(CAST(scale AS DECIMAL(18,9)), 6) AS DOUBLE)
               AS scale_r,
           CAST(ROUND(CAST(
               list_max(list_transform(generate_series(1, len(v)),
                   i -> abs(CAST(q[CAST(i AS INT)] AS DOUBLE) * scale
                            - v[CAST(i AS INT)])))
               AS DECIMAL(18,9)), 6) AS DOUBLE) AS max_err_r
    FROM (
        SELECT vec_id, v, scale,
               list_transform(v, x -> greatest(-127, least(127,
                   CAST(floor(x / scale + 0.5) AS INT)))) AS q
        FROM (
            SELECT vec_id,
                   CAST(embedding AS DOUBLE[]) AS v,
                   list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
            FROM embeddings
        )
    )
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization with a reconstruction-error
    report — the 4x storage/IO compression that fits billion-vector ANN
    indexes in executor memory. Quantized values are bit-identical
    across engines (pure IEEE floor-half-up arithmetic), verified via
    the exact integer checksum plus rounded scale/error columns."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.quantize_embeddings_int8(emb)


_QUANT_VECS_SQL = """
    quant AS (
        SELECT vec_id,
               list_transform(q, x -> CAST(x AS DOUBLE) * scale) AS v
        FROM (
            SELECT vec_id, scale,
                   list_transform(v, x -> greatest(-127, least(127,
                       CAST(floor(x / scale + 0.5) AS INT)))) AS q
            FROM (
                SELECT vec_id,
                       CAST(embedding AS DOUBLE[]) AS v,
                       list_max(list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
                FROM embeddings
            )
        )
    )
"""

_TOP1_SQL = """
    SELECT vec_id AS query_id, nb AS {out} FROM (
        SELECT x.vec_id, c.vec_id AS nb,
               row_number() OVER (PARTITION BY x.vec_id ORDER BY
                   list_dot_product(x.v, c.v)
                       / (sqrt(list_dot_product(x.v, x.v))
                          * sqrt(list_dot_product(c.v, c.v))) DESC,
                   c.vec_id) AS rk
        FROM {rel} x CROSS JOIN {rel} c
        WHERE x.vec_id < 50 AND x.vec_id <> c.vec_id
    ) WHERE rk = 1
"""


@query(
    "embedding_quantized_topk_recall",
    "WITH exactv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
    "               FROM embeddings), "
    + _QUANT_VECS_SQL
    + ", e AS ("
    + _TOP1_SQL.format(rel="exactv", out="exact_neighbor")
    + "), qn AS ("
    + _TOP1_SQL.format(rel="quant", out="quant_neighbor")
    + """)
    SELECT e.query_id, e.exact_neighbor, qn.quant_neighbor,
           (e.exact_neighbor = qn.quant_neighbor) AS top1_match
    FROM e JOIN qn USING (query_id)
    """,
)
def embedding_quantized_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1 agreement between exact cosine search and search over the
    int8-dequantized corpus — the accuracy audit that decides whether
    4x compression is admissible. Dequantized values are bit-identical
    across engines, so both rankings reproduce exactly."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.quantized_topk_recall(emb, emb.filter(F.col("vec_id") < 50))


def _colstat_sql(table: str, col: str) -> str:
    return f"""
    SELECT '{col}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
           CAST(MIN({col}) AS STRING) AS min_str,
           CAST(MAX({col}) AS STRING) AS max_str
    FROM {table}
    """


@query(
    "stats_analyze_columns",
    " UNION ALL ".join(
        _colstat_sql("orders", c)
        for c in ("o_orderkey", "o_custkey", "o_orderstatus",
                  "o_orderpriority")
    ),
)
def stats_analyze_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column statistics (nulls, exact distincts, min/max)
    for four orders columns in ONE scan — the stats a cost-based
    optimizer and a data-quality dashboard both consume, unpivoted via
    stack so column count doesn't multiply scan cost."""
    from _event_intelligence_data_warehouse_spark.operators.text import (
        column_stats,
    )

    o = load(spark, sf_dir, "orders")
    return column_stats(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    )


@query(
    "sketch_binned_quantiles",
    """
    WITH counts AS (
        SELECT event_type,
               CAST(floor(CAST(value AS DOUBLE) / 1.0) AS BIGINT) AS bin,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, bin, c,
               SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(c) OVER (PARTITION BY event_type) AS n
        FROM counts
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                         THEN bin END) AS DOUBLE) * 1.0 AS p50_est,
           CAST(MIN(CASE WHEN cum >= CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1
                         THEN bin END) AS DOUBLE) * 1.0 AS p95_est
    FROM cum
    GROUP BY event_type
    """,
)
def sketch_binned_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-binned quantile estimates (width-1 bins) of the event
    value per type: the mergeable, sort-free percentile monitor for
    scales where per-group sorts are off the table — error bounded by
    the bin width, counters combine by addition. Exact discrete
    percentiles of the same data are driver-checked separately
    (agg_exact_percentiles), making the accuracy auditable."""
    from _event_intelligence_data_warehouse_spark.operators import sketches as sk

    e = load(spark, sf_dir, "events")
    return sk.binned_quantiles(e, "value", "event_type", (0.5, 0.95))


@query(
    "sketch_cms_heavy_hitters",
    """
    WITH items AS (
        SELECT CAST(user_id AS STRING) AS item FROM events
    ), sk AS (
        SELECT r.i AS row_i,
               CAST(('0x' || substr(md5(CAST(r.i AS STRING) || '|' || item),
                     1, 15)) AS BIGINT) % 1024 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM items CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) r
        GROUP BY 1, 2
    ), exact AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS exact_count
        FROM items GROUP BY item
        ORDER BY exact_count DESC, item LIMIT 10
    ), probes AS (
        SELECT e.item, e.exact_count, r.i AS row_i,
               CAST(('0x' || substr(md5(CAST(r.i AS STRING) || '|' || e.item),
                     1, 15)) AS BIGINT) % 1024 AS bucket
        FROM exact e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) r
    )
    SELECT p.item, p.exact_count, CAST(MIN(s.c) AS BIGINT) AS cms_estimate
    FROM probes p JOIN sk s ON s.row_i = p.row_i AND s.bucket = p.bucket
    GROUP BY p.item, p.exact_count
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: the top-10 users by exact count with
    their CMS estimates (min over 4 row counters, always >= exact) —
    integer arithmetic end-to-end, so sketch and report are exact on
    both engines."""
    from _event_intelligence_data_warehouse_spark.operators import sketches as sk

    e = load(spark, sf_dir, "events")
    return sk.cms_heavy_hitters(e, "user_id", k=10)


# ---------------------------------------------------------------------------
# Skew-safe aggregation
# ---------------------------------------------------------------------------

@query(
    "agg_salted_skew_safe",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_value,
           CAST(MIN(CAST(floor(value * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS min_value,
           CAST(MAX(CAST(floor(value * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_skew_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the low-cardinality (therefore
    hot-keyed) event_type: phase 1 fans each key over 32 salted reduce
    tasks, phase 2 re-aggregates the partials. The oracle is the plain
    GROUP BY — the salting must be *exactly* invisible in the result."""
    from _event_intelligence_data_warehouse_spark.operators import skew

    e = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint").alias("v"),
    )
    out = skew.salted_agg(
        e,
        ["event_type"],
        {
            "n_events": ("*", "count"),
            "sum_value": ("v", "sum"),
            "min_value": ("v", "min"),
            "max_value": ("v", "max"),
        },
        salt_src="event_id",
        n_salt=32,
    )
    return out.select(
        "event_type",
        "n_events",
        (F.col("sum_value").cast("double") / F.lit(100.0))
        .alias("sum_value"),
        (F.col("min_value").cast("double") / F.lit(100.0))
        .alias("min_value"),
        (F.col("max_value").cast("double") / F.lit(100.0))
        .alias("max_value"),
    )


# ---------------------------------------------------------------------------
# Windowed event analytics
# ---------------------------------------------------------------------------

@query(
    "window_tumbling_hourly",
    """
    SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
                          * 3600000000) AS window_start,
           make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000)
                          * 3600000000 + 3600000000) AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type — the same
    F.window primitive Structured Streaming compiles (streaming.jobs runs
    it under a watermark with Trigger.AvailableNow)."""
    e = load(spark, sf_dir, "events")
    return win.tumbling_counts(e, "1 hour", extra_keys=["event_type"])


@query(
    "window_sliding_hourly",
    """
    WITH expanded AS (
        SELECT unnest([
                   (epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000)
                       * 1800000000,
                   (epoch_us(CAST(ts AS TIMESTAMP)) // 1800000000)
                       * 1800000000 - 1800000000
               ]) AS ws
        FROM events
    )
    SELECT make_timestamp(ws) AS window_start,
           make_timestamp(ws + 3600000000) AS window_end,
           COUNT(*) AS n_events
    FROM expanded
    GROUP BY 1, 2
    """,
)
def window_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes: each event lands in
    duration/slide = 2 windows (the oracle expands the two aligned starts
    explicitly — exactly what F.window's Expand node generates)."""
    e = load(spark, sf_dir, "events")
    return win.sliding_counts(e, "1 hour", "30 minutes")


@query(
    "window_sessionize",
    """
    WITH ordered AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec,
               CAST(ts AS TIMESTAMP) AS ts, value,
               lag(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_sec
        FROM events
    ), flagged AS (
        SELECT *, CASE WHEN sec - prev_sec > 1800 THEN 1 ELSE 0 END
                      AS new_session
        FROM ordered
    ), sessions AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                      AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS sum_value,
           (epoch_us(MAX(ts)) // 1000000) - (epoch_us(MIN(ts)) // 1000000)
               AS duration_seconds
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min idle): lag + running sum, one
    shuffle on the user key (streaming analog: session_window)."""
    e = load(spark, sf_dir, "events")
    return win.sessionize(e, gap_minutes=30)


# ---------------------------------------------------------------------------
# Deterministic sampling / splits / per-group selection
# (operators/sampling.py — training-data curation surface)
# ---------------------------------------------------------------------------

# md5-derived bucket, mirrored exactly in DuckDB.
_BUCKET = "CAST(('0x' || substr(md5({v}), 1, 8)) AS BIGINT) % 100"


@query(
    "sample_stratified_hash",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_BUCKET.format(
        v="coalesce(lang, '') || '|' || CAST(doc_id AS VARCHAR)"
    )} < 20
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~20% deterministic sample of every language stratum — a stateless
    hash filter (stable across runs, cluster sizes, and appends), vs the
    nondeterminism of rand()-based sampleBy."""
    from _event_intelligence_data_warehouse_spark.operators.sampling import (
        stratified_hash_sample,
    )

    d = load(spark, sf_dir, "documents")
    return stratified_hash_sample(d, "lang", "doc_id", 20).select(
        "doc_id", "lang"
    )


@query(
    "split_train_holdout",
    f"""
    WITH labeled AS (
        SELECT lang,
               CASE WHEN {_BUCKET.format(v="CAST(doc_id AS VARCHAR)")} < 10
                    THEN 'holdout' ELSE 'train' END AS split
        FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs
    FROM labeled
    GROUP BY lang, split
    """,
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/10 train/holdout split as a pure function of doc_id (no row can
    migrate between sides across runs), summarized per language."""
    from _event_intelligence_data_warehouse_spark.operators.sampling import (
        train_holdout_split,
    )

    d = load(spark, sf_dir, "documents")
    return (
        train_holdout_split(d, "doc_id", 10)
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


@query(
    "topk_docs_per_source",
    """
    SELECT source, doc_id, n_chars, rank FROM (
        SELECT source, doc_id, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id ASC)
                   AS rank
        FROM documents
    )
    WHERE rank <= 5
    """,
)
def topk_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 longest documents per source (curation-style per-group top-k):
    one window on the group key, deterministic doc_id tiebreak."""
    from _event_intelligence_data_warehouse_spark.operators.sampling import (
        topk_per_group,
    )

    d = load(spark, sf_dir, "documents")
    return topk_per_group(
        d, ["source"], "n_chars", 5, tiebreak_col="doc_id"
    ).select("source", "doc_id", "n_chars", "rank")


@query(
    "embedding_label_centroids",
    """
    WITH ex AS (
        -- zipped unnests: position and element stay aligned; reads the
        -- true array length instead of hardcoding the dimension
        SELECT label,
               unnest(generate_series(1, len(embedding))) - 1 AS dim,
               unnest(embedding) AS v
        FROM embeddings
    )
    SELECT label, dim,
           CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000000 + 0.5)
                         AS BIGINT)) AS DOUBLE)
               / 1000000000.0 / COUNT(*) AS avg_val
    FROM ex
    GROUP BY label, dim
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding space in long form
    (label, dim, avg_val) — the element-wise group aggregate every
    IVF/clustering pipeline needs. posexplode + hash aggregate: one
    shuffle on (label, dim), partial aggregation map-side. Element sums
    run as integer NANOS (floor(v*1e9 + 0.5) — pure double floor, the
    _int_vec discipline): exact and order-free like the previous
    DECIMAL(18,9) sum, but WITHOUT the decimal-quantization rounding
    tie that bit at sf0.1 (Spark HALF_UP vs DuckDB HALF_EVEN disagreed
    on exactly one element's 10th digit; floor-half-up is identical
    IEEE arithmetic on both engines). Sum bound: int64-safe to ~9e9
    rows per (label, dim) group at nano scale."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("v").cast("double") * F.lit(1000000000.0)
                        + F.lit(0.5)
                    ).cast("bigint")
                ).cast("double")
                / F.lit(1000000000.0)
                / F.count("*")
            ).alias("avg_val")
        )
        .select(F.col("label").cast("long").alias("label"),
                F.col("dim").cast("long").alias("dim"), "avg_val")
    )


@query(
    "curation_pipeline",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, source, text,
               list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                           x -> x != '') AS tl
        FROM documents
    ), m AS (
        SELECT doc_id, lang, source,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS fingerprint,
               CAST(len(tl) AS DOUBLE) AS n_tok,
               CASE WHEN length(text) > 0 THEN
                    CAST(length(text) - length(regexp_replace(text,
                         '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE)
               ELSE 0.0 END AS punct,
               CASE WHEN len(tl) > 0 THEN
                    CAST(len(list_filter(tl,
                         x -> list_contains({_STOP_EN_SQL}, x))) AS DOUBLE)
                    / CAST(len(tl) AS DOUBLE)
               ELSE 0.0 END AS sw
        FROM toks
    ), scored AS (
        SELECT doc_id, lang, source, fingerprint,
               CAST(ROUND(CAST(
                   least(n_tok / 20.0, 1.0) * 0.4
                   + greatest(0.0, 1.0 - punct * 4.0) * 0.3
                   + least(sw * 5.0, 1.0) * 0.3
                   AS DECIMAL(10,6)), 4) AS DOUBLE) AS quality_score
        FROM m
    ), canon AS (
        SELECT fingerprint, MIN(doc_id) AS canonical_id
        FROM scored GROUP BY fingerprint
    ), kept AS (
        SELECT s.* FROM scored s
        JOIN canon c ON s.fingerprint = c.fingerprint
                    AND s.doc_id = c.canonical_id
        WHERE s.quality_score >= 0.72
    ), sampled AS (
        SELECT * FROM kept
        WHERE CAST(('0x' || substr(md5(coalesce(lang, '') || '|'
                  || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50
    )
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(quality_score AS DECIMAL(10,4))) AS DOUBLE)
               / COUNT(*) AS avg_quality
    FROM sampled
    GROUP BY lang, source
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation in ONE composed plan: quality
    scoring -> threshold filter -> exact-dedup canonical representatives
    -> deterministic 50% stratified sample -> per-(lang, source) summary.
    Every stage is an operator already oracle-checked in isolation
    (text_quality_score, dedup_exact, sample_stratified_hash); this query
    checks their COMPOSITION. Shuffles: the fingerprint groupBy and the
    final aggregate — scoring, filtering, and sampling are stateless and
    fuse into the scan."""
    from _event_intelligence_data_warehouse_spark.operators.sampling import (
        stratified_hash_sample,
    )

    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        tx.fingerprint(t).alias("fingerprint"),
        tx.quality_score(t).alias("quality_score"),
    )
    canon = scored.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_id")
    )
    kept = (
        scored.join(canon, "fingerprint")
        .filter(F.col("doc_id") == F.col("canonical_id"))
        .filter(F.col("quality_score") >= 0.72)
    )
    sampled = stratified_hash_sample(kept, "lang", "doc_id", 50)
    return sampled.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(F.col("quality_score").cast("decimal(10,4)")).cast("double")
            / F.count("*")
        ).alias("avg_quality"),
    )


@query(
    "knn_label_prediction",
    f"""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
               label AS true_label
        FROM embeddings WHERE vec_id % 40 = 0
    ), c AS (
        SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
               label
        FROM embeddings
    ), topk AS (
        SELECT query_id, true_label, label, neighbor_id FROM (
            SELECT query_id, true_label, c.label, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY {_COS} DESC, neighbor_id)
                       AS rank
            FROM c CROSS JOIN q
            WHERE query_id <> neighbor_id
        ) WHERE rank <= 5
    ), votes AS (
        SELECT query_id, true_label, label,
               COUNT(*) AS n_votes,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY COUNT(*) DESC, label)
                   AS vote_rank
        FROM topk
        GROUP BY query_id, true_label, label
    )
    SELECT query_id, CAST(true_label AS BIGINT) AS true_label,
           CAST(label AS BIGINT) AS predicted_label,
           n_votes
    FROM votes WHERE vote_rank = 1
    """,
)
def knn_label_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classification by retrieval: majority label of the exact top-5
    cosine neighbors per sampled query vector (deterministic tie-break:
    most votes, then smallest label). Composes the ANN operator with a
    vote aggregate — the standard kNN eval/labeling pass of an embedding
    pipeline. Output is ids/labels/counts only (no floats)."""
    emb = load(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 40 == 0)
    topk = sim.brute_force_topk(emb, queries_df, k=5)
    labeled = (
        topk.join(
            F.broadcast(
                emb.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("label").alias("label"),
                )
            ),
            "neighbor_id",
        )
        .join(
            F.broadcast(
                queries_df.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("label").alias("true_label"),
                )
            ),
            "query_id",
        )
    )
    votes = labeled.groupBy("query_id", "true_label", "label").agg(
        F.count("*").alias("n_votes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    return (
        votes.withColumn("vote_rank", F.row_number().over(w))
        .filter(F.col("vote_rank") == 1)
        .select(
            "query_id",
            F.col("true_label").cast("long").alias("true_label"),
            F.col("label").cast("long").alias("predicted_label"),
            "n_votes",
        )
    )


@query(
    "streaming_purchase_attribution",
    """
    WITH v AS (
        SELECT user_id, event_id AS view_id, CAST(ts AS TIMESTAMP) AS view_ts
        FROM events WHERE event_type = 'view'
    ), p AS (
        SELECT user_id, event_id AS purchase_id,
               CAST(ts AS TIMESTAMP) AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, v.view_id, p.purchase_id, v.view_ts, p.purchase_ts
    FROM v JOIN p
      ON v.user_id = p.user_id
     AND v.view_ts < p.purchase_ts
     AND v.view_ts >= p.purchase_ts - INTERVAL 1 HOUR
    """,
)
def streaming_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join (purchase -> preceding views within
    1 h, per user) drained with Trigger.AvailableNow. Watermarks + the
    time-range condition bound the join state; the wide watermark means
    nothing evicts early, so the streamed result must equal the batch
    interval join — which is what the DuckDB oracle computes."""
    from _event_intelligence_data_warehouse_spark.contract import staging_dir
    from _event_intelligence_data_warehouse_spark.streaming import jobs

    tmp = staging_dir("purchase_attribution", sf_dir)
    src, out, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    load(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    stream = jobs.read_event_stream(spark, src)
    joined = jobs.purchase_attribution_stream(stream)
    jobs.run_available_now(stream, joined, out, ckpt)
    return spark.read.parquet(out)


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup), boilerplate-line removal (CCNet), BPE pair stats
# ---------------------------------------------------------------------------

# Augmented embedding corpus for semantic dedup: exact copies (cosine
# exactly 1.0 — robustly over any threshold) of every 10th vector, ids
# offset by +100000, mirrored verbatim in the oracle.
_SEM_VECS_SRC = """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    UNION ALL
    SELECT vec_id + 100000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings WHERE vec_id % 10 = 0"""

_SEM_TAU = 0.9


def _sem_corpus(spark: SparkSession, sf_dir: str):
    """embeddings plus exact copies of every 10th vector (+100000 ids):
    the single Spark-side mirror of _SEM_VECS_SRC, shared by the
    dedup_semantic driver and the bench's build/apply split."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    return emb.unionByName(dup)


def _sem_core(vecs_src: str) -> str:
    return (
        _ivf_train_cte(vecs_src)
        .replace("WITH vecs", "WITH RECURSIVE vecs", 1)
        + _CELL_SCORES_CTE
        + _SEM_GROUPS_CTE
    )


_SEM_GROUPS_CTE = f"""
, assign AS (
    SELECT vec_id, cell, cs FROM cell_scores WHERE cell_rank = 1
), pairs AS (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM assign a
    JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
    JOIN vecs va ON va.vec_id = a.vec_id
    JOIN vecs vb ON vb.vec_id = b.vec_id
    WHERE list_dot_product(va.v, vb.v)
              / (sqrt(list_dot_product(va.v, va.v))
                 * sqrt(list_dot_product(vb.v, vb.v))) >= {_SEM_TAU}
), sym AS (
    SELECT id_a AS a, id_b AS b FROM pairs
    UNION ALL
    SELECT id_b AS a, id_a AS b FROM pairs
), reach AS (
    SELECT vec_id AS src, vec_id AS node FROM assign
    UNION
    SELECT r.src, s.b AS node FROM reach r JOIN sym s ON r.node = s.a
), comp AS (
    SELECT src AS vec_id, MIN(node) AS component_id FROM reach GROUP BY src
), elect AS (
    SELECT a.vec_id, a.cell, c.component_id,
           row_number() OVER (PARTITION BY c.component_id
                              ORDER BY a.cs ASC, a.vec_id ASC) AS rk
    FROM assign a JOIN comp c USING (vec_id)
)
"""

_SEM_SQL = _sem_core(_SEM_VECS_SRC) + """
SELECT vec_id, cell, component_id,
       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_kept
FROM elect
"""


@query("dedup_semantic", _SEM_SQL)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means cells bound the pair
    search, within-cell cosine >= 0.9 edges define duplicate groups
    (connected components), each group keeps its LEAST centroid-similar
    member. The oracle re-derives the trained cells with the unrolled
    Lloyd CTE and the groups with a recursive reachability CTE."""
    return sim.semantic_dedup(_sem_corpus(spark, sf_dir), threshold=_SEM_TAU)


# Incremental semantic dedup split (mirror of dedup_minhash_incremental):
# 90% of vec_ids (vec_id % 10 != 0) are the stored corpus the quantizer
# trained on; the batch is the vec_id % 10 == 0 slice plus exact copies
# (+100000) of every 7th corpus vector — planting guaranteed
# batch-vs-corpus pairs at sim = 1.0. The oracle trains centroids on the
# CORPUS ONLY (exactly what the frozen stored quantizer is), assigns
# corpus AND batch against them, and keeps within-cell pairs touching
# the batch.
_SEM_CORPUS_SRC = """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings WHERE vec_id % 10 != 0"""

_SEM_BATCH_PRED = "({0} % 10 = 0 OR {0} >= 100000)"

_SEM_INCR_COS = (
    "list_dot_product(x.v, y.v)"
    " / (sqrt(list_dot_product(x.v, x.v))"
    " * sqrt(list_dot_product(y.v, y.v)))"
)

_SEM_INCR_SQL = (
    _ivf_train_cte(_SEM_CORPUS_SRC)
    + f"""
, allv AS (
    SELECT * FROM vecs
    UNION ALL
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings WHERE vec_id % 10 = 0
    UNION ALL
    SELECT vec_id + 100000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings WHERE vec_id % 10 != 0 AND vec_id % 7 = 0
), scores AS (
    SELECT x.vec_id, c.cell,
           row_number() OVER (PARTITION BY x.vec_id ORDER BY
               list_dot_product(x.v, c.centroid)
                   / (sqrt(list_dot_product(x.v, x.v))
                      * sqrt(list_dot_product(c.centroid, c.centroid)))
                   DESC, c.cell) AS rk
    FROM allv x CROSS JOIN cents c
), assign AS (
    SELECT vec_id, cell FROM scores WHERE rk = 1
), m AS (
    SELECT a.vec_id, a.cell, v.v FROM assign a JOIN allv v USING (vec_id)
)
SELECT x.vec_id AS id_a, y.vec_id AS id_b,
       CAST(x.cell AS BIGINT) AS cell,
       {_SEM_INCR_COS} AS sim
FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id
WHERE {_SEM_INCR_COS} >= {_SEM_TAU}
  AND ({_SEM_BATCH_PRED.format("x.vec_id")}
       OR {_SEM_BATCH_PRED.format("y.vec_id")})
"""
)


@query("dedup_semantic_incremental", _SEM_INCR_SQL)
def dedup_semantic_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Steady-state SemDeDup: the batch is assigned against the STORED
    corpus-trained centroids and scored only against the touched cells'
    stored members (plus batch-vs-batch) — the corpus is never
    re-assigned or re-trained, so per-batch cost scales with the
    increment. Must equal a same-centroid full pass's within-cell
    pairs restricted to those touching the batch (the oracle computes
    exactly that). Quantizer sizing is ADAPTIVE like semantic_dedup's
    (r10: the first sf1 probe of this entry measured 11.3x — fixed 16
    cells densify linearly with the corpus, so the batch-vs-cell pair
    join grew ~quadratically): corpora up to
    SEM_FIXED_CELLS_MAX_VECTORS keep the oracle-pinned 16 cells (every
    gate-runnable SF), larger ones get ~sqrt(n) cells with max_train
    grown to 8 per cell — check_oracle regime-skips this entry past
    the pinned regime, same as dedup_semantic. Sizing reads its
    corpus-count scalar from parquet FOOTER metadata, not a Spark scan
    (r10 verdict item 3): in production the stored corpus is a
    warehouse table whose manifest already carries the count
    (storage.Warehouse.stats_count); this plain-parquet fixture reads
    the same scalar driver-side via storage.parquet_row_count and
    derives the corpus size exactly — vec_id is dense 0..N-1
    (TESTDATA.md generator), so the corpus predicate
    vec_id % 10 != 0 keeps N - ceil(N/10) rows. The per-batch apply
    path therefore launches no job over the accumulated corpus that
    isn't the pair probe itself."""
    import math
    import os as _os

    from _event_intelligence_data_warehouse_spark import storage as _st

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0).unionByName(
        corpus.filter(F.col("vec_id") % 7 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    total = _st.parquet_row_count(
        _os.path.join(sf_dir, "embeddings.parquet")
    )
    n = total - -(-total // 10) if total is not None else corpus.count()
    if n <= sim.SEM_FIXED_CELLS_MAX_VECTORS:
        centroids, cells = sim.ivf_cells(corpus)
    else:
        n_cells = max(16, math.isqrt(n))
        centroids, cells = sim.ivf_cells(
            corpus, n_cells=n_cells, max_train=max(1024, 8 * n_cells)
        )
    corpus_assign = cells.filter(F.col("cell_rank") == 1).select(
        "vec_id", "cell"
    )
    return sim.semantic_dedup_incremental(
        batch, centroids, corpus_assign, corpus, threshold=_SEM_TAU
    ).select(
        "id_a", "id_b", F.col("cell").cast("bigint").alias("cell"), "sim"
    )


# Boilerplate-line corpus: header / footer lines planted on most docs
# (document frequency far above the threshold), one rare promo line far
# below it — mirrored verbatim in the oracle. ELSE '' keeps || away from
# NULL in SQL.
_BOILER_MIN_DF = 100

_BOILER_DOCS_CTE = """
WITH docs2 AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN 'Subscribe to our newsletter!' || chr(10) ELSE '' END
           || text
           || CASE WHEN doc_id % 4 = 0
                   THEN chr(10) || 'All rights reserved.' ELSE '' END
           || CASE WHEN doc_id % 997 = 0
                   THEN chr(10) || 'Rare promo line' ELSE '' END
           AS text
    FROM documents
)
"""


@query(
    "text_boilerplate_lines",
    _BOILER_DOCS_CTE
    + f"""
, ls AS (
    SELECT doc_id, string_split(text, chr(10)) AS la FROM docs2
), lines AS (
    SELECT doc_id, unnest(la) AS line,
           unnest(generate_series(1, len(la))) AS pos
    FROM ls
), normed AS (
    SELECT doc_id, pos, line,
           trim(regexp_replace(lower(line), '\\s+', ' ', 'g')) AS nline
    FROM lines
), boiler AS (
    SELECT md5(nline) AS lh
    FROM normed WHERE nline <> ''
    GROUP BY md5(nline)
    HAVING COUNT(DISTINCT doc_id) >= {_BOILER_MIN_DF}
), flagged AS (
    SELECT n.doc_id, n.pos, n.line,
           (b.lh IS NOT NULL) AS is_boiler
    FROM normed n LEFT JOIN boiler b ON md5(n.nline) = b.lh
)
SELECT doc_id,
       coalesce(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (WHERE NOT is_boiler), '') AS clean_text,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(*) FILTER (WHERE is_boiler) AS BIGINT) AS n_removed
FROM flagged
GROUP BY doc_id
""",
)
def text_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal: lines whose normalized form
    appears in >= 100 distinct documents (planted headers/footers) are
    dropped corpus-wide; the rare promo line (document frequency ~5)
    survives. Only line digests shuffle to the document-frequency
    aggregate."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    aug = d.select(
        "doc_id",
        F.concat(
            F.when(did % 3 == 0, F.lit("Subscribe to our newsletter!\n"))
            .otherwise(""),
            F.col("text"),
            F.when(did % 4 == 0, F.lit("\nAll rights reserved."))
            .otherwise(""),
            F.when(did % 997 == 0, F.lit("\nRare promo line")).otherwise(""),
        ).alias("text"),
    )
    return tx.boilerplate_line_filter(aug, min_df=_BOILER_MIN_DF)


@query(
    "text_bpe_pair_stats",
    """
    WITH words AS (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents
    ), vocab AS (
        SELECT w, COUNT(*) AS wn FROM words GROUP BY w
    ), pairs AS (
        SELECT substr(w, CAST(pos AS INT), 2) AS pair, wn FROM (
            SELECT w, wn,
                   unnest(generate_series(1, length(w) - 1)) AS pos
            FROM vocab WHERE length(w) >= 2
        )
    )
    SELECT pair, CAST(SUM(wn) AS BIGINT) AS pair_count
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair ASC
    LIMIT 50
    """,
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-iteration BPE merge statistics (Sennrich et al. 2016):
    corpus-weighted adjacent character-pair counts inside words, top 50
    with a deterministic tie-break. The corpus collapses to its
    vocabulary before any pair explodes."""
    return tx.bpe_pair_stats(
        load(spark, sf_dir, "documents"), text_col="text", top_n=50
    )


# Exact-substring span dedup corpus: a fixed 12-token sentence appended
# to every 7th document — its interior 10-grams duplicate across ~1/7 of
# the corpus while every boundary-crossing gram stays document-unique.
_SPAN_SENTENCE = (
    "dupspan alpha beta gamma delta epsilon zeta eta theta iota kappa"
    " lambda"
)
_SPAN_N = 10

_SPAN_SQL = f"""
WITH docs2 AS (
    SELECT doc_id,
           text || CASE WHEN doc_id % 7 = 0
                        THEN ' {_SPAN_SENTENCE}' ELSE '' END AS text
    FROM documents
), toksrc AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                       x -> x != '') AS toks
    FROM docs2
), grams AS (
    SELECT doc_id, i - 1 AS pos,
           md5(array_to_string(list_slice(toks, i, i + {_SPAN_N} - 1), ' '))
               AS gh
    FROM (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {_SPAN_N} + 1)) AS i
        FROM toksrc WHERE len(toks) >= {_SPAN_N}
    )
), dup AS (
    SELECT gh FROM grams GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2
), flagged AS (
    SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gh)
), isl AS (
    SELECT doc_id, pos,
           CASE WHEN prev_end IS NULL OR pos > prev_end
                THEN 1 ELSE 0 END AS new_island
    FROM (
        SELECT doc_id, pos,
               MAX(pos + {_SPAN_N}) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_end
        FROM flagged
    )
), isl2 AS (
    SELECT doc_id, pos,
           SUM(new_island) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS island
    FROM isl
)
SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {_SPAN_N} AS BIGINT) AS span_end
FROM isl2 GROUP BY doc_id, island
"""


@query("dedup_exact_substrings", _SPAN_SQL)
def dedup_exact_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span dedup (Lee et al. 2022): maximal token ranges
    covered by 10-grams that appear verbatim in >= 2 documents — the
    ranges a training-data pipeline cuts out even when the documents as
    wholes are not duplicates. Digest group-by replaces the paper's
    suffix array; gaps-and-islands windows merge overlapping spans."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" " + _SPAN_SENTENCE))
            .otherwise(""),
        ).alias("text"),
    )
    return dd.duplicate_text_spans(aug, n=_SPAN_N, min_docs=2)


# Bloom membership: filter built over the fingerprints of a "benchmark"
# shard (sources src0-src4), probed by the whole corpus. Bit positions
# are five disjoint 24-bit md5 slices, so the oracle reproduces the
# FILTER CONTENTS — false positives and all — bit-for-bit.
_BLOOM_SQL = """
WITH fps AS (
    SELECT doc_id, source,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
), keys AS (
    SELECT DISTINCT fp FROM fps
    WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
), kpos AS (
    SELECT DISTINCT
           CAST(('0x' || substr(md5(fp), 1 + 6 * j, 6)) AS BIGINT)
               % 65536 AS pos
    FROM (SELECT fp, unnest(generate_series(0, 4)) AS j FROM keys)
), words AS (
    SELECT pos // 32 AS word_idx,
           bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
    FROM kpos GROUP BY pos // 32
), ppos AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(fp), 1 + 6 * j, 6)) AS BIGINT)
               % 65536 AS pos
    FROM (SELECT doc_id, fp, unnest(generate_series(0, 4)) AS j FROM fps)
), hits AS (
    SELECT p.doc_id,
           CASE WHEN w.bits IS NOT NULL
                     AND (w.bits & (CAST(1 AS BIGINT)
                                    << CAST(p.pos % 32 AS INT))) != 0
                THEN 1 ELSE 0 END AS hit
    FROM ppos p LEFT JOIN words w ON p.pos // 32 = w.word_idx
), verdict AS (
    SELECT doc_id, CAST(MIN(hit) AS BIGINT) AS maybe_present
    FROM hits GROUP BY doc_id
)
SELECT f.doc_id, v.maybe_present,
       CAST(CASE WHEN k.fp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS is_member
FROM fps f
JOIN verdict v USING (doc_id)
LEFT JOIN keys k ON f.fp = k.fp
"""


@query("sketch_bloom_membership", _BLOOM_SQL)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership pre-filter: ~2k sparse 32-bit words
    summarize the benchmark shard's fingerprints, broadcast to probe the
    whole corpus (no false negatives; is_member is the exact answer the
    filter approximates). The m/64-row filter is what a 100 TB
    decontamination pass ships to every executor where an exact key set
    would not fit."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sketches as sk,
    )

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", tx.fingerprint(F.col("text")).alias("fp")
    )
    keys = (
        d.filter(F.col("source").isin([f"src{i}" for i in range(5)]))
        .select("fp").distinct()
    )
    bloom = sk.bloom_build(keys, "fp")
    probed = sk.bloom_probe(d, "fp", bloom, id_col="doc_id")
    return (
        d.join(probed, "doc_id")
        .join(
            keys.withColumn("is_member", F.lit(1)), "fp", "left"
        )
        .select(
            "doc_id", "maybe_present",
            F.coalesce("is_member", F.lit(0)).cast("bigint")
            .alias("is_member"),
        )
    )


# Synthetic-but-deterministic URLs for the URL gate: scheme, www, port,
# path depth, query and fragment all vary by doc_id, mirrored verbatim
# in the oracle.
_URL_EXPR_SQL = """
    CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END
    || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
    || CASE WHEN doc_id % 6 = 0 THEN 'cdn.' ELSE '' END
    || source || '-site.Com'
    || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END
    || '/docs/' || CAST(doc_id % 7 AS VARCHAR) || '/page'
    || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
    || '?ref=' || CAST(doc_id AS VARCHAR) || '#frag'
"""

def _docs_with_urls(d):
    """(doc_id, url): the synthetic-URL recipe, the single Spark-side
    mirror of _URL_EXPR_SQL — edit both together."""
    did = F.col("doc_id")
    return d.select(
        "doc_id",
        F.concat(
            F.when(did % 2 == 0, F.lit("HTTPS://")).otherwise("http://"),
            F.when(did % 3 == 0, F.lit("www.")).otherwise(""),
            F.when(did % 6 == 0, F.lit("cdn.")).otherwise(""),
            F.col("source"), F.lit("-site.Com"),
            F.when(did % 4 == 0, F.lit(":443")).otherwise(""),
            F.lit("/docs/"), (did % 7).cast("string"), F.lit("/page"),
            F.when(did % 5 == 0, F.lit("/")).otherwise(""),
            F.lit("?ref="), did.cast("string"), F.lit("#frag"),
        ).alias("url"),
    )


_URL_CANON_SQL = f"""
WITH urls AS (
    SELECT doc_id, {_URL_EXPR_SQL} AS url FROM documents
), stripped AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(trim(url),
               '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''),
               '#.*$', ''),
               '\\?.*$', '') AS su
    FROM urls
), parts AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(
               lower(regexp_extract(su, '^[^/]*')),
               ':[0-9]+$', ''), '^www\\.', '') AS host,
           regexp_replace(regexp_extract(su, '/.*$'), '/+$', '') AS path
    FROM stripped
)
SELECT doc_id,
       host || path AS url_canon,
       host,
       regexp_extract(host, '[^.]+\\.[^.]+$') AS domain,
       CAST(CASE WHEN regexp_extract(host, '[^.]+\\.[^.]+$')
                      = 'src0-site.com' THEN 1 ELSE 0 END AS BIGINT)
           AS blocked
FROM parts
"""


@query("text_url_canonicalize", _URL_CANON_SQL)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL gate: canonical dedup key (scheme/query/fragment/
    www/port/trailing-slash stripped), host + naive registered domain,
    and a blocklist verdict — all anchored regex chains in codegen."""
    from _event_intelligence_data_warehouse_spark.operators import urls as ur

    withurl = _docs_with_urls(load(spark, sf_dir, "documents"))
    return ur.canonicalize_urls(
        withurl, blocked_domains=["src0-site.com"]
    )


@query(
    "text_url_host_stats",
    f"""
WITH urls AS (
    SELECT doc_id, {_URL_EXPR_SQL} AS url FROM documents
), stripped AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(trim(url),
               '^[a-zA-Z][a-zA-Z0-9+.-]*://', ''),
               '#.*$', ''),
               '\\?.*$', '') AS su
    FROM urls
), parts AS (
    SELECT doc_id,
           regexp_replace(regexp_replace(
               lower(regexp_extract(su, '^[^/]*')),
               ':[0-9]+$', ''), '^www\\.', '') AS host
    FROM stripped
)
SELECT regexp_extract(host, '[^.]+\\.[^.]+$') AS domain,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts
FROM parts
GROUP BY regexp_extract(host, '[^.]+\\.[^.]+$')
""",
)
def text_url_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain corpus concentration (docs + distinct
    hosts) — the screen that catches one domain dominating a crawl."""
    from _event_intelligence_data_warehouse_spark.operators import urls as ur

    withurl = _docs_with_urls(load(spark, sf_dir, "documents"))
    return ur.host_stats(withurl)


@query(
    "split_kfold_leakage_safe",
    _CC_CTES + """
SELECT doc_id, component_id,
       CAST((CAST(('0x' || substr(md5(CAST(component_id AS VARCHAR)),
                   1, 8)) AS BIGINT) % 100) % 5 AS BIGINT) AS fold
FROM comp
""",
)
def split_kfold_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 5-fold assignment: folds hash the near-dup CLUSTER
    id, so a document and its near-twin always share a fold — k-fold
    eval without cross-fold contamination."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    docs = _docs_near(spark, sf_dir)
    pairs = dd.minhash_dedup(docs, threshold=0.8)
    return smp.leakage_safe_kfold(docs.select("doc_id"), pairs, 5)


_INCR_CC_SQL = (
    _INCR_DOCS_CTE.replace("WITH docs2", "WITH RECURSIVE docs2")
    + _LSH_PAIR_CTES
    + f"""
, pairs AS (
    {_LSH_PAIR_SELECT}
), sym AS (
    SELECT doc_a AS a, doc_b AS b FROM pairs
    UNION ALL
    SELECT doc_b AS a, doc_a AS b FROM pairs
), reach AS (
    SELECT doc_id AS src, doc_id AS node FROM docs2
    UNION
    SELECT r.src, s.b AS node FROM reach r JOIN sym s ON r.node = s.a
), comp AS (
    SELECT src AS doc_id, MIN(node) AS component_id
    FROM reach GROUP BY src
)
SELECT doc_id, component_id FROM comp
"""
)


@query("dedup_cc_incremental", _INCR_CC_SQL)
def dedup_cc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state duplicate-group maintenance: the stored corpus keeps
    its component labels; a batch's edges (from the incremental MinHash
    probe) merge in via touched-component star edges only — untouched
    clusters never enter the propagation. Must equal the full-graph
    recompute, which is exactly what the oracle's recursive CTE over
    ALL pairs of the union corpus computes."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0).unionByName(
        corpus.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzextra")).alias("text"),
        )
    )
    index_sets, index_sigs = dd.minhash_index(corpus)
    stored = dd.connected_components(
        corpus.select("doc_id"), dd.minhash_dedup(corpus, threshold=0.8)
    )
    batch_pairs = dd.incremental_minhash_dedup(
        batch, index_sets, index_sigs, threshold=0.8
    )
    return dd.connected_components_incremental(
        stored, batch.select("doc_id"), batch_pairs
    )


# curation v2: the round-4 operators composed end-to-end — planted
# boilerplate lines AND a planted in-body duplicate sentence, removed in
# sequence (lines by document frequency, spans by cross-doc 10-gram
# duplication), then re-scored. The oracle rebuilds the whole chain.
_V2_DOCS_CTE = f"""
WITH docs2 AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                THEN 'Subscribe to our newsletter!' || chr(10) ELSE '' END
           || text
           || CASE WHEN doc_id % 7 = 0 THEN ' {_SPAN_SENTENCE}' ELSE '' END
           || CASE WHEN doc_id % 4 = 0
                   THEN chr(10) || 'All rights reserved.' ELSE '' END
           AS text
    FROM documents
)
"""

_V2_SQL = _V2_DOCS_CTE + f"""
, ls AS (
    SELECT doc_id, string_split(text, chr(10)) AS la FROM docs2
), lines AS (
    SELECT doc_id, unnest(la) AS line,
           unnest(generate_series(1, len(la))) AS pos
    FROM ls
), normed AS (
    SELECT doc_id, pos, line,
           trim(regexp_replace(lower(line), '\\s+', ' ', 'g')) AS nline
    FROM lines
), boiler AS (
    SELECT md5(nline) AS lh FROM normed WHERE nline <> ''
    GROUP BY md5(nline)
    HAVING COUNT(DISTINCT doc_id) >= {_BOILER_MIN_DF}
), cleaned AS (
    SELECT n.doc_id,
           coalesce(string_agg(n.line, chr(10) ORDER BY n.pos)
               FILTER (WHERE b.lh IS NULL), '') AS clean_text,
           CAST(COUNT(*) FILTER (WHERE b.lh IS NOT NULL) AS BIGINT)
               AS n_lines_removed
    FROM normed n LEFT JOIN boiler b ON md5(n.nline) = b.lh
    GROUP BY n.doc_id
), ctoks AS (
    SELECT doc_id, n_lines_removed,
           list_filter(regexp_split_to_array(lower(trim(clean_text)),
                       '\\s+'), x -> x != '') AS toks
    FROM cleaned
), grams AS (
    SELECT doc_id, i - 1 AS pos,
           md5(array_to_string(list_slice(toks, i, i + {_SPAN_N} - 1), ' '))
               AS gh
    FROM (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {_SPAN_N} + 1)) AS i
        FROM ctoks WHERE len(toks) >= {_SPAN_N}
    )
), dupg AS (
    SELECT gh FROM grams GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2
), flagged AS (
    SELECT g.doc_id, g.pos FROM grams g JOIN dupg USING (gh)
), cover AS (
    SELECT DISTINCT f.doc_id, f.pos + o.off AS tpos
    FROM flagged f,
         (SELECT unnest(generate_series(0, {_SPAN_N} - 1)) AS off) o
), tok_pos AS (
    SELECT doc_id, n_lines_removed, unnest(toks) AS tok,
           unnest(generate_series(0, len(toks) - 1)) AS tpos
    FROM ctoks
), kept AS (
    SELECT t.doc_id, t.n_lines_removed, t.tok, t.tpos,
           (c.tpos IS NOT NULL) AS cut
    FROM tok_pos t LEFT JOIN cover c
      ON t.doc_id = c.doc_id AND t.tpos = c.tpos
), final AS (
    SELECT doc_id, n_lines_removed,
           coalesce(string_agg(tok, ' ' ORDER BY tpos)
               FILTER (WHERE NOT cut), '') AS ftext,
           CAST(COUNT(*) FILTER (WHERE cut) AS BIGINT) AS n_tokens_cut,
           CAST(COUNT(*) FILTER (WHERE NOT cut) AS BIGINT) AS n_tokens
    FROM kept GROUP BY doc_id, n_lines_removed
), scored AS (
    SELECT doc_id, n_lines_removed, n_tokens_cut, n_tokens,
           md5(ftext) AS final_text_md5,
           CAST(n_tokens AS DOUBLE) AS n_tok,
           CASE WHEN length(ftext) > 0 THEN
                CAST(length(ftext) - length(regexp_replace(ftext,
                     '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                / CAST(length(ftext) AS DOUBLE)
           ELSE 0.0 END AS punct,
           CASE WHEN n_tokens > 0 THEN
                CAST(len(list_filter(
                     list_filter(regexp_split_to_array(lower(trim(ftext)),
                                 '\\s+'), x -> x != ''),
                     x -> list_contains({_STOP_EN_SQL}, x))) AS DOUBLE)
                / CAST(n_tokens AS DOUBLE)
           ELSE 0.0 END AS sw
    FROM final
)
SELECT doc_id, n_lines_removed, n_tokens_cut, n_tokens, final_text_md5,
       CAST(ROUND(CAST(
           least(n_tok / 20.0, 1.0) * 0.4
           + greatest(0.0, 1.0 - punct * 4.0) * 0.3
           + least(sw * 5.0, 1.0) * 0.3
           AS DECIMAL(10,6)), 4) AS DOUBLE) AS quality
FROM scored
"""


@query("curation_pipeline_v2", _V2_SQL)
def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 curation chain in ONE composed plan: CCNet boilerplate-
    line removal -> ExactSubstr duplicate-span cut over the CLEANED text
    -> re-tokenize -> quality re-score. Each stage is oracle-checked in
    isolation (text_boilerplate_lines, dedup_exact_substrings,
    text_quality_score); this checks the composition, reconstructed
    hash-for-hash by the oracle."""
    from _event_intelligence_data_warehouse_spark.operators import text as tx2

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    aug = d.select(
        "doc_id",
        F.concat(
            F.when(did % 3 == 0, F.lit("Subscribe to our newsletter!\n"))
            .otherwise(""),
            F.col("text"),
            F.when(did % 7 == 0, F.lit(" " + _SPAN_SENTENCE)).otherwise(""),
            F.when(did % 4 == 0, F.lit("\nAll rights reserved."))
            .otherwise(""),
        ).alias("text"),
    )
    cleaned = tx2.boilerplate_line_filter(aug, min_df=_BOILER_MIN_DF).select(
        "doc_id", F.col("clean_text").alias("text"),
        F.col("n_removed").alias("n_lines_removed"),
    )
    from _event_intelligence_data_warehouse_spark import cache

    cleaned = cache.persist(cleaned)
    spans = dd.duplicate_text_spans(cleaned, n=_SPAN_N, min_docs=2)
    cut = tx2.cut_spans(cleaned.select("doc_id", "text"), spans)
    return (
        cut.join(cleaned.select("doc_id", "n_lines_removed"), "doc_id")
        .select(
            "doc_id", "n_lines_removed", "n_tokens_cut", "n_tokens",
            F.md5("ftext").alias("final_text_md5"),
            tx2.quality_score(F.col("ftext")).alias("quality"),
        )
    )


# Semantic-dedup recall audit: planted copies are PERTURBED (first
# component scaled 1.5x), so capture is not structural — a pair whose
# members straddle a cell boundary is genuinely missed, which is
# SemDeDup's known failure mode and exactly what this measures.
_SEM_PERT_VECS_SRC = """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    UNION ALL
    SELECT vec_id + 100000 AS vec_id,
           [v[1] * 1.5] || list_slice(v, 2, len(v)) AS v
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id % 10 = 0)"""


@query(
    "dedup_semantic_recall",
    _sem_core(_SEM_PERT_VECS_SRC) + """
, planted AS (
    SELECT vec_id AS id_a, vec_id + 100000 AS id_b
    FROM embeddings WHERE vec_id % 10 = 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
       CAST(SUM(CASE WHEN ca.component_id = cb.component_id
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_captured
FROM planted p
JOIN comp ca ON ca.vec_id = p.id_a
JOIN comp cb ON cb.vec_id = p.id_b
""",
)
def dedup_semantic_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit for semantic dedup: perturbed near-copies (cosine
    just under 1.0) planted across the corpus; captured = the pair
    shares a duplicate component. Misses measure the cell-boundary
    split — the accuracy gate that justifies bounding the pair search
    to cells (the analog of the LSH/IVF recall audits)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding").getItem(0) * 1.5),
            F.slice(F.col("embedding"), 2, F.size("embedding") - 1),
        ).alias("embedding"),
    )
    out = sim.semantic_dedup(
        emb.unionByName(pert), threshold=_SEM_TAU
    ).select("vec_id", "component_id")
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("id_a"),
        (F.col("vec_id") + 100000).alias("id_b"),
    )
    a = out.toDF("id_a", "comp_a")
    b = out.toDF("id_b", "comp_b")
    return (
        planted.join(a, "id_a").join(b, "id_b")
        .agg(
            F.count("*").cast("bigint").alias("n_planted"),
            F.sum(
                (F.col("comp_a") == F.col("comp_b")).cast("bigint")
            ).cast("bigint").alias("n_captured"),
        )
    )


@query(
    "clean_winsorize_values",
    """
    WITH ranked AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY CAST(floor(value * 100 + 0.5)
                                                AS BIGINT),
                                           event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ), cuts AS (
        SELECT event_type,
               MAX(CASE WHEN rn = CAST(floor(0.05 * (n - 1)) AS BIGINT) + 1
                        THEN v END) AS lo,
               MAX(CASE WHEN rn = CAST(floor(0.95 * (n - 1)) AS BIGINT) + 1
                        THEN v END) AS hi
        FROM ranked GROUP BY event_type
    )
    SELECT r.event_id, r.event_type,
           CAST(least(greatest(r.v, c.lo), c.hi) AS DOUBLE) / 100.0
               AS value_clamped,
           CAST(CASE WHEN r.v < c.lo OR r.v > c.hi
                     THEN 1 ELSE 0 END AS BIGINT) AS clamped
    FROM ranked r JOIN cuts c USING (event_type)
    """,
)
def clean_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise winsorization of event values at exact p05/p95 rank
    selections — robust preprocessing before normalization; clamp
    bounds are integer rank picks, so both engines choose the identical
    element. Values quantize to integer CENTS (floor(x*100+0.5), pure
    double floor — identical IEEE both engines) instead of a
    double->DECIMAL cast, whose Spark-shortest-repr-HALF_UP vs
    DuckDB-exact-binary rounding splits on half-cent ties (the r8
    timeseries_ohlc_hourly driver-red class; r9 registry sweep)."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint").alias("value"),
    )
    out = smp.winsorize(
        e, "value", ["event_type"], p_lo=0.05, p_hi=0.95,
        tiebreak_col="event_id",
    )
    return out.select(
        "event_id", "event_type",
        (F.col("value_clamped").cast("double") / F.lit(100.0))
        .alias("value_clamped"),
        "clamped",
    )


@query(
    "text_ngram_novelty",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(t) - 2),
                   i -> CAST(('0x' || substr(md5(
                       array_to_string(t[i:i+2], ' ')), 1, 8)) AS BIGINT)
               )) AS g
        FROM toks WHERE len(t) >= 3
    ), ex AS (
        SELECT doc_id, unnest(g) AS gram_hash FROM grams
    ), dfreq AS (
        SELECT gram_hash, COUNT(*) AS df FROM ex GROUP BY gram_hash
    )
    SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
           CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS novelty
    FROM ex e JOIN dfreq d USING (gram_hash)
    GROUP BY e.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty: fraction of the doc's distinct word
    trigrams with corpus document frequency 1 — the derivativeness
    signal between exact quality metrics and pairwise dedup."""
    return tx.ngram_novelty(load(spark, sf_dir, "documents"), n=3)


@query(
    "text_lm_surprise",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), occ AS (
        SELECT doc_id, unnest(list_transform(
            generate_series(1, len(t) - 1),
            i -> struct_pack(
                h1 := CAST(('0x' || substr(md5(t[i]), 1, 8)) AS BIGINT),
                h2 := CAST(('0x' || substr(md5(t[i+1]), 1, 8)) AS BIGINT))
        )) AS g
        FROM toks WHERE len(t) >= 2
    ), pairs AS (
        SELECT doc_id, g.h1 AS h1, g.h2 AS h2 FROM occ
    ), c2 AS (
        SELECT h1, h2, CAST(COUNT(*) AS BIGINT) AS c2
        FROM pairs GROUP BY h1, h2
    ), c1 AS (
        SELECT h1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY h1
    )
    -- HUGEINT intermediates + // (exact integer division) mirror the
    -- Spark side's DECIMAL(38,0) div — bit-identical on both engines
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM((CAST(c1 AS HUGEINT) * 1000000) // c2) AS BIGINT)
               AS surprise_total,
           CAST(CAST(SUM((CAST(c1 AS HUGEINT) * 1000000) // c2) AS BIGINT)
                AS DOUBLE) / COUNT(*) AS surprise_mean
    FROM pairs p JOIN c2 USING (h1, h2) JOIN c1 USING (h1)
    GROUP BY p.doc_id
    """,
)
def text_lm_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM surprise per document — the CCNet-style
    perplexity proxy (head/middle/tail quality bucketing), reformulated
    as floor-scaled inverse conditional probability so the score is
    exact integer arithmetic on both engines (sum-of-float-logs would
    not even be deterministic across partition orders)."""
    return tx.lm_bigram_surprise(load(spark, sf_dir, "documents"))


@query(
    "curation_quality_percentile",
    f"""
    WITH s AS (
        SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS score
        FROM documents
    )
    SELECT doc_id, source, score,
           percent_rank() OVER (
               PARTITION BY source ORDER BY score, doc_id
           ) AS pct_rank
    FROM s
    """,
)
def curation_quality_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source percentile calibration of a quality score (token
    count here): raw scores from different sources aren't comparable;
    their within-source percent_rank is — the normalization before a
    global keep-top-X% curation threshold. (rank-1)/(n-1) is one exact
    integer division, engine-identical."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", tx.token_count("text").cast("bigint").alias("score")
    )
    return smp.group_percentile(
        d, "score", ["source"], tiebreak_col="doc_id"
    )


@query(
    "profile_key_skew",
    """
    WITH counts AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM events GROUP BY user_id
    ), tot AS (
        SELECT CAST(SUM(n_rows) AS BIGINT) AS t FROM counts
    )
    SELECT user_id, n_rows,
           CAST((CAST(n_rows AS HUGEINT) * 1000000) // t AS BIGINT)
               AS share_ppm,
           CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, user_id)
                AS BIGINT) AS rnk
    FROM counts CROSS JOIN tot
    ORDER BY n_rows DESC, user_id
    LIMIT 20
    """,
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile of events.user_id: the 20 heaviest keys
    with exact counts and ppm share — the measurement that decides
    whether a join/agg needs salting before anyone pays for it."""
    from _event_intelligence_data_warehouse_spark.operators import (
        skew as sk,
    )

    e = load(spark, sf_dir, "events")
    return sk.key_skew_profile(e, ["user_id"], top_n=20)


@query(
    "embedding_random_projection",
    """
    WITH ex AS (
        SELECT vec_id, unnest(generate_series(1, len(embedding))) - 1 AS i,
               unnest(embedding) AS v
        FROM embeddings
    ), dims AS (
        SELECT unnest(generate_series(0, 7)) AS dim
    )
    SELECT vec_id, CAST(d.dim AS BIGINT) AS dim,
           CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000000 + 0.5)
                         AS BIGINT) *
               (CASE WHEN CAST(('0x' || substr(md5(
                    'rp|' || i || '|' || d.dim), 1, 1)) AS INT) % 2 = 0
                THEN 1 ELSE -1 END)) AS DOUBLE) / 1000000000.0 AS value
    FROM ex CROSS JOIN dims d
    GROUP BY vec_id, d.dim
    """,
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss Rademacher projection of the embedding
    table to 8 dims (long form) — signs are pure md5 hashes, element
    sums run in the decimal domain, so the reduced vectors are
    bit-identical on every engine. The shrink step before a 100 TB ANN
    index."""
    from _event_intelligence_data_warehouse_spark.operators import (
        similarity as sim,
    )

    e = load(spark, sf_dir, "embeddings")
    return sim.random_projection(e, k=8)


# Fixed pretrained merge list for the BPE serving path — exercises
# multi-character merges ((at,ch) only fires after (a,t) and (c,h)).
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("a", "t"), ("c", "h"), ("at", "ch"),
    ("o", "w"), ("e", "r"),
]


def _bpe_apply_duckdb(merges) -> str:
    """DuckDB expression equivalent of the Spark merge folds: reduce()
    accumulates the word as a \\x1f-delimited symbol string (reduce's
    accumulator must be element-typed), re-split between merges."""
    sep = chr(31)
    expr = "str_split(w, '')"
    for left, right in merges:
        folded = (
            f"reduce({expr}, (acc, x) -> "
            f"CASE WHEN (acc = '{left}' OR acc LIKE '%{sep}{left}') "
            f"AND x = '{right}' "
            f"THEN substr(acc, 1, len(acc) - {len(left)}) "
            f"|| '{left}' || '{right}' "
            f"ELSE acc || '{sep}' || x END)"
        )
        expr = f"str_split({folded}, '{sep}')"
    return expr


@query(
    "text_bpe_encode",
    f"""
    WITH w AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents
    ), t AS (
        SELECT doc_id, len(w) AS nc,
               len({_bpe_apply_duckdb(_BPE_MERGES)}) AS nt
        FROM w
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(nc) AS BIGINT) AS n_chars,
           CAST(SUM(nt) AS BIGINT) AS n_tokens,
           CAST(SUM(nc) AS DOUBLE) / SUM(nt) AS chars_per_token
    FROM t GROUP BY doc_id
    """,
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE serving path: tokenize every document with a FIXED trained
    merge list (greedy left-to-right merge folds, the Sennrich apply
    step) and report per-doc token accounting — the numbers packing
    budgets and training-cost estimates are built from. Merge folds run
    as codegen'd array algebra; the merge list compiles into the plan."""
    return tx.bpe_encode_stats(
        load(spark, sf_dir, "documents"), _BPE_MERGES
    )


# Token-level decontamination knobs shared by the Spark call and its
# oracle: 4-token grams over the fixed _BPE_MERGES tokenizer; 80 shared
# distinct grams ≈ substantial verbatim overlap on this template-heavy
# corpus (12 pairs at sf0.01, ~2.7k at sf0.1 — the genuine suspect set).
# The benchmark is a FIXED eval suite, as in production: doc_id % 41
# capped below BENCH_MAX_ID, which covers every doc at the gate-checked
# SFs (sf0.01 has 500 ids, sf0.1 has 5,000 — results there are
# identical with or without the cap) and binds only at the sf1 probe's
# 50k-id scale-up, where an uncapped benchmark would grow WITH the
# corpus and overstate the operator's scaling exponent (real eval
# suites don't grow when the training corpus does — the first committed
# probe row measured 9.7-10.7x with the growing benchmark, the
# corpus-linear term alone is ~5x).
_TOKDECON_N = 4
_TOKDECON_MIN_SHARED = 80
_TOKDECON_BENCH_MAX_ID = 20_000


@query(
    "text_token_decontaminate",
    f"""
    WITH toks AS (
        SELECT doc_id,
               flatten(list_transform(
                   regexp_extract_all(lower(text), '[a-z]+'),
                   w -> {_bpe_apply_duckdb(_BPE_MERGES)})) AS t
        FROM documents
    ), grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(t) - {_TOKDECON_N - 1}),
                   i -> CAST(('0x' || substr(md5(array_to_string(
                       t[i:i+{_TOKDECON_N - 1}], ' ')), 1, 8)) AS BIGINT)
               )) AS g
        FROM toks WHERE len(t) >= {_TOKDECON_N}
    ), ex AS (
        SELECT doc_id, unnest(g) AS gram_hash FROM grams
    ), bench AS (
        SELECT doc_id AS bench_id, gram_hash FROM ex
        WHERE doc_id % 41 = 0 AND doc_id < {_TOKDECON_BENCH_MAX_ID}
    )
    SELECT e.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM ex e JOIN bench b USING (gram_hash)
    WHERE e.doc_id <> b.bench_id
    GROUP BY e.doc_id, b.bench_id
    HAVING COUNT(*) >= {_TOKDECON_MIN_SHARED}
    """,
)
def text_token_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-level benchmark decontamination (r10 verdict item 5,
    operators/text.py::token_decontaminate): flag corpus docs sharing
    >= 80 distinct 4-grams of BPE TOKENIZER output with a benchmark
    doc (stand-in: doc_id % 41 == 0 capped at a FIXED id range — an
    eval suite does not grow with the training corpus; the cap covers
    every doc at the gate-checked SFs, see _TOKDECON_BENCH_MAX_ID) —
    real eval-leak policies operate on token sequences, not raw
    words, so the overlap rule here is measured in the same units as
    the model's context window. The token stream composes
    bpe_encode_stats' fixed-merge-list apply with the
    ngram_contamination join shape; grams span word boundaries.
    100 TB: the tokenizer folds and gram hashing are row-local column
    algebra riding the scan (zero shuffles before the join); only
    8-byte gram hashes join against a broadcast benchmark index
    bounded by the eval suite."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(
        (F.col("doc_id") % 41 == 0)
        & (F.col("doc_id") < _TOKDECON_BENCH_MAX_ID)
    )
    return tx.token_decontaminate(
        docs, bench, _BPE_MERGES,
        n=_TOKDECON_N, min_shared=_TOKDECON_MIN_SHARED,
    )


@query(
    "text_token_decontaminate_fast",
    f"""
    WITH toks AS (
        SELECT doc_id,
               flatten(list_transform(
                   regexp_extract_all(lower(text), '[a-z]+'),
                   w -> {_bpe_apply_duckdb(_BPE_MERGES)})) AS t
        FROM documents
    ), grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(t) - {_TOKDECON_N - 1}),
                   i -> array_to_string(
                       t[i:i+{_TOKDECON_N - 1}], ' ')
               )) AS g
        FROM toks WHERE len(t) >= {_TOKDECON_N}
    ), ex AS (
        SELECT doc_id, unnest(g) AS gram FROM grams
    ), bench AS (
        SELECT doc_id AS bench_id, gram FROM ex
        WHERE doc_id % 41 = 0 AND doc_id < {_TOKDECON_BENCH_MAX_ID}
    )
    SELECT e.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM ex e JOIN bench b USING (gram)
    WHERE e.doc_id <> b.bench_id
    GROUP BY e.doc_id, b.bench_id
    HAVING COUNT(*) >= {_TOKDECON_MIN_SHARED}
    """,
)
def text_token_decontaminate_fast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION configuration of token-level decontamination
    (r11 verdict item 3): identical policy knobs to
    text_token_decontaminate (4-token grams, >= 80 shared, fixed
    capped eval suite) but with both documented fast levers ON —
    xxhash64 gram hashing (JVM-intrinsic, no md5 digest + hex-conv
    round trip) and the ``vocab_join`` merge fold: the corpus
    collapses to its VOCABULARY, each distinct word folds once per
    corpus, and the word→tokens table broadcasts back onto the
    positional word explode (measured sf0.1: 5.6 s cold / 2.6 s warm
    vs the md5-inline contract's 9.8-11 s — the fold, not the hash,
    dominates: inline+xxhash64 alone measured 9.8 s). A 100 TB
    deployment does not run portable md5 folds in the hot path; the
    md5 entry stays registered as the cross-engine hash contract.

    Correctness: the hash value never reaches the output — only pair
    membership and the per-pair distinct-gram COUNT do — so the
    DuckDB oracle counts shared gram STRINGS directly (hash-free);
    equality holds up to 64-bit xxhash collisions (~1e-13 at the
    probe's gram cardinality). The md5-vs-fast pair-set equality is
    additionally pinned by tests/test_round11_ops.py."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(
        (F.col("doc_id") % 41 == 0)
        & (F.col("doc_id") < _TOKDECON_BENCH_MAX_ID)
    )
    return tx.token_decontaminate(
        docs, bench, _BPE_MERGES,
        n=_TOKDECON_N, min_shared=_TOKDECON_MIN_SHARED,
        portable_hash=False, fold="vocab_join",
    )


@query(
    "text_leakage_attribution",
    f"""
    WITH toks AS (
        SELECT doc_id,
               flatten(list_transform(
                   regexp_extract_all(lower(text), '[a-z]+'),
                   w -> {_bpe_apply_duckdb(_BPE_MERGES)})) AS t
        FROM documents
    ), grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(t) - {_TOKDECON_N - 1}),
                   i -> CAST(('0x' || substr(md5(array_to_string(
                       t[i:i+{_TOKDECON_N - 1}], ' ')), 1, 8)) AS BIGINT)
               )) AS g
        FROM toks WHERE len(t) >= {_TOKDECON_N}
    ), ex AS (
        SELECT doc_id, unnest(g) AS gram_hash FROM grams
    ), bench AS (
        SELECT doc_id AS bench_id, gram_hash FROM ex
        WHERE doc_id % 41 = 0 AND doc_id < {_TOKDECON_BENCH_MAX_ID}
    ), toto AS (
        SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS bench_ngrams
        FROM bench GROUP BY 1
    ), matches AS (
        SELECT e.doc_id, b.bench_id, e.gram_hash
        FROM ex e JOIN bench b USING (gram_hash)
        WHERE e.doc_id <> b.bench_id
    ), pairs AS (
        SELECT doc_id, bench_id, COUNT(*) AS n_shared
        FROM matches GROUP BY 1, 2
        HAVING COUNT(*) >= {_TOKDECON_MIN_SHARED}
    ), leak AS (
        SELECT m.bench_id,
               CAST(COUNT(DISTINCT m.doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT m.gram_hash) AS BIGINT)
                   AS leaked_grams
        FROM matches m JOIN pairs p
          ON m.doc_id = p.doc_id AND m.bench_id = p.bench_id
        GROUP BY 1
    ), mx AS (
        SELECT bench_id, CAST(MAX(n_shared) AS BIGINT) AS max_shared
        FROM pairs GROUP BY 1
    ), scored AS (
        SELECT l.bench_id, l.n_docs, m.max_shared, l.leaked_grams,
               t.bench_ngrams,
               CAST(1000000 * l.leaked_grams // t.bench_ngrams
                    AS BIGINT) AS leak_share_ppm
        FROM leak l JOIN mx m USING (bench_id)
                    JOIN toto t USING (bench_id)
    )
    SELECT bench_id, n_docs, max_shared, leaked_grams, bench_ngrams,
           leak_share_ppm,
           CAST(ROW_NUMBER() OVER (
               ORDER BY leak_share_ppm DESC, bench_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 20
    """,
)
def text_leakage_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-BENCHMARK leakage attribution (r11 verdict item 7) — the
    table an eval owner asks for first: for each eval-suite member,
    how badly is it leaked into the training corpus? Composes the
    token_decontaminate pair frame (same policy knobs: 4-token grams,
    >= 80 shared, fixed capped suite) with per-bench gram totals:

    - n_docs: corpus documents flagged against this bench member;
    - max_shared: the worst single-document overlap;
    - leaked_grams: DISTINCT bench grams found in any flagged doc —
      the union coverage, robust to the same grams repeating across
      many training docs (summing per-pair counts would double-count);
    - leak_share_ppm = 1e6 * leaked_grams / bench_ngrams — the share
      of the member's token 4-grams that escaped;
    - rank: densest leak first (ties broken by bench_id), top 20.

    100 TB: everything reuses the decontamination topology — the
    benchmark side is suite-bounded and broadcasts; the corpus gram
    frame is CACHED (r12: pass 2 reads it instead of re-tokenizing
    suspects), so at production scale it is a corpus-sized but narrow
    (doc_id, int64) persist that spills MEMORY_AND_DISK — the trade is
    one spill-backed materialization vs running the tokenize+fold
    pipeline (and recompiling its giant codegen class) once per pass,
    which the r12 A/B measured as the win; the attribution adds only
    bench-sized aggregates on top of the (sparse) match frame."""
    from _event_intelligence_data_warehouse_spark import cache

    docs = load(spark, sf_dir, "documents")
    # vocab_join fold: the merge folds run once per corpus-distinct
    # word (the production tokenizer shape — the fold, not the hash,
    # dominates this pipeline); the gram STRINGS are identical across
    # fold modes, so the md5 gram hashes still match the oracle's
    # exactly
    # Persisted (r12): the corpus gram frame feeds the bench-side
    # filter AND pass 1's broadcast join — unpersisted, the vocab_join
    # fold pipeline (whose giant merge-fold projection also costs
    # seconds of whole-stage codegen COMPILATION when the class cache
    # is cold — the fixed 100-entry codegen cache is routinely evicted
    # by the 100+ cached plans a full bench session accumulates)
    # executed and recompiled once per consumer. The frame is narrow
    # (doc_id, int64 gram hash).
    cg = cache.persist(tx.token_ngram_hashes(
        docs, _BPE_MERGES, n=_TOKDECON_N, fold="vocab_join"
    ))
    # bench-side lineage is cheap (reads the persisted gram frame),
    # but persist it too: it feeds the broadcast join twice plus the
    # totals aggregate
    bg = cache.persist(
        cg.filter(
            (F.col("doc_id") % 41 == 0)
            & (F.col("doc_id") < _TOKDECON_BENCH_MAX_ID)
        )
        .withColumnRenamed("doc_id", "bench_id")
    )
    totals = bg.groupBy("bench_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("bench_ngrams")
    )
    # PASS 1 — pair counting: one corpus stream past the broadcast
    # bench index, straight into the (doc, bench) aggregate. The raw
    # (doc, bench, gram) match frame is NOT persisted: on a
    # template-heavy corpus it is corpus-scale, and caching it
    # measured slower than the recompute it saved.
    pairs = cache.persist(
        cg.join(F.broadcast(bg), "gram_hash")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _TOKDECON_MIN_SHARED)
    )
    # PASS 2 — distinct-leaked-gram rollup, SUSPECT-BOUNDED: only the
    # docs that actually flagged contribute, via a broadcast semi-join
    # against the PERSISTED gram frame — the suspects' (doc, gram)
    # rows are by construction exactly cg restricted to suspect ids,
    # so re-tokenizing them (the r12-build shape) paid the fold
    # pipeline and its multi-second whole-stage-codegen compile a
    # second time for rows the cache already holds. At production
    # contamination rates the suspect set is <<1% of the corpus;
    # persisting pass 1's corpus-scale MATCH frame instead would cost
    # more than it saves (measured, r12 build).
    sus_docs = pairs.select("doc_id").distinct()
    cg2 = cg.join(F.broadcast(sus_docs), "doc_id")
    leak = (
        cg2.join(F.broadcast(bg), "gram_hash")
        .filter(F.col("doc_id") != F.col("bench_id"))
        .join(
            F.broadcast(pairs.select("doc_id", "bench_id")),
            ["doc_id", "bench_id"],
        )
        .groupBy("bench_id")
        .agg(
            F.countDistinct("gram_hash").cast("bigint")
            .alias("leaked_grams"),
        )
    )
    per_bench = pairs.groupBy("bench_id").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.max("n_shared").cast("bigint").alias("max_shared"),
    )
    scored = (
        leak.join(per_bench, "bench_id")
        .join(F.broadcast(totals), "bench_id")
        .select(
            "bench_id", "n_docs", "max_shared", "leaked_grams",
            "bench_ngrams",
            F.expr("1000000 * leaked_grams div bench_ngrams")
            .cast("bigint").alias("leak_share_ppm"),
        )
    )
    w = Window.orderBy(F.desc("leak_share_ppm"), F.asc("bench_id"))
    return (
        scored.withColumn(
            "rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("rank") <= 20)
    )


@query(
    "curation_dsir_affinity",
    f"""
    WITH occ AS (
        SELECT doc_id,
               unnest(list_transform({_TOKS}, t ->
                   CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 4096
               )) AS b
        FROM documents
    ), tocc AS (
        SELECT o.b FROM occ o JOIN documents d USING (doc_id)
        WHERE d.lang = 'en'
    ), tf AS (
        SELECT b, CAST((CAST(COUNT(*) AS HUGEINT) * 1000000) //
               (SELECT COUNT(*) FROM tocc) AS BIGINT) AS tp
        FROM tocc GROUP BY b
    ), rf AS (
        SELECT b, CAST((CAST(COUNT(*) AS HUGEINT) * 1000000) //
               (SELECT COUNT(*) FROM occ) AS BIGINT) AS rp
        FROM occ GROUP BY b
    ), score AS (
        SELECT r.b, CAST(coalesce(t.tp, 0) - r.rp AS BIGINT) AS delta_ppm
        FROM rf r LEFT JOIN tf t USING (b)
    )
    SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
           CAST(SUM(s.delta_ppm) AS BIGINT) AS affinity_sum_ppm,
           CAST(CAST(SUM(s.delta_ppm) AS BIGINT) AS DOUBLE) / COUNT(*)
               AS affinity_ppm
    FROM occ o JOIN score s USING (b)
    GROUP BY o.doc_id
    """,
)
def curation_dsir_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection signal: hashed unigram buckets score
    target-vs-raw frequency difference in exact ppm; each document's
    affinity is its mean bucket score (target = the English subset).
    Rank raw data by it to select target-looking training data. The
    4096-row score table broadcasts; the corpus never shuffles text."""
    docs = load(spark, sf_dir, "documents")
    return tx.dsir_affinity(docs, docs.filter(F.col("lang") == "en"))


@query(
    "text_ccnet_buckets",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), occ2 AS (
        SELECT doc_id, unnest(list_transform(
            generate_series(1, len(t) - 1),
            i -> struct_pack(
                h1 := CAST(('0x' || substr(md5(t[i]), 1, 8)) AS BIGINT),
                h2 := CAST(('0x' || substr(md5(t[i+1]), 1, 8)) AS BIGINT))
        )) AS g
        FROM toks WHERE len(t) >= 2
    ), pairs AS (
        SELECT doc_id, g.h1 AS h1, g.h2 AS h2 FROM occ2
    ), c2 AS (
        SELECT h1, h2, CAST(COUNT(*) AS BIGINT) AS c2
        FROM pairs GROUP BY h1, h2
    ), c1 AS (
        SELECT h1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY h1
    ), doc AS (
        SELECT p.doc_id,
               CAST(COUNT(*) AS BIGINT) AS nb,
               CAST(SUM((CAST(c1 AS HUGEINT) * 1000000) // c2) AS BIGINT)
                   AS st
        FROM pairs p JOIN c2 USING (h1, h2) JOIN c1 USING (h1)
        GROUP BY p.doc_id
    ), bucketed AS (
        SELECT d.source, doc.nb, doc.st,
               ntile(3) OVER (
                   PARTITION BY d.source
                   ORDER BY CAST(doc.st AS DOUBLE) / doc.nb, doc.doc_id
               ) AS bucket
        FROM doc JOIN documents d USING (doc_id)
    )
    SELECT source, CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nb) AS BIGINT) AS n_bigrams,
           CAST(CAST(SUM(st) AS BIGINT) AS DOUBLE) / SUM(nb)
               AS bucket_surprise
    FROM bucketed
    GROUP BY source, bucket
    """,
)
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split, end to end: per-source ntile(3)
    over the bigram-LM surprise score (head = most predictable third).
    Per (source, bucket): doc count and the bucket's pooled surprise —
    pooled from INTEGER totals (sum of per-doc int64 surprise / sum of
    bigram counts), because averaging per-doc doubles would be
    partition-order-dependent. The mixture planner consumes this table
    to sample head/middle/tail at different rates."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    scored = tx.lm_bigram_surprise(docs)
    w = Window.partitionBy("source").orderBy(
        F.col("surprise_mean"), F.col("doc_id")
    )
    b = (
        scored.join(docs.select("doc_id", "source"), "doc_id")
        .withColumn("bucket", F.ntile(3).over(w).cast("bigint"))
    )
    return (
        b.groupBy("source", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("n_bigrams"),
            (
                F.sum("surprise_total").cast("bigint").cast("double")
                / F.sum("n_bigrams").cast("bigint").cast("double")
            ).alias("bucket_surprise"),
        )
    )


@query(
    "sample_stratified_exact",
    """
    WITH counts AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS stratum_n
        FROM events GROUP BY event_type
    ), tot AS (
        SELECT CAST(SUM(stratum_n) AS BIGINT) AS N FROM counts
    ), q AS (
        SELECT event_type, stratum_n,
               CAST((CAST(1000 AS HUGEINT) * stratum_n) // N AS BIGINT)
                   AS base,
               CAST((CAST(1000 AS HUGEINT) * stratum_n) % N AS BIGINT)
                   AS rem
        FROM counts CROSS JOIN tot
    ), r AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, event_type)
                   AS rrank,
               1000 - SUM(base) OVER () AS leftover
        FROM q
    ), quotas AS (
        SELECT event_type, stratum_n,
               least(stratum_n, base + CASE WHEN rrank <= leftover
                     THEN 1 ELSE 0 END) AS quota
        FROM r
    ), sel AS (
        SELECT event_id, event_type,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS srank
        FROM events
    )
    SELECT s.event_id, s.event_type, CAST(q.quota AS BIGINT) AS quota,
           q.stratum_n
    FROM sel s JOIN quotas q USING (event_type)
    WHERE s.srank <= q.quota
    """,
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size stratified sample of events: a 1000-row budget
    apportioned across event types by largest remainder (quotas sum to
    the budget exactly — rate-based sampling can't), membership by md5
    rank — deterministic across runs and repartitioning."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    e = load(spark, sf_dir, "events").select("event_id", "event_type")
    out = smp.allocate_stratified(
        e, ["event_type"], 1000, tiebreak_col="event_id"
    )
    return out.select("event_id", "event_type", "quota", "stratum_n")


@query(
    "embedding_contrastive_pairs",
    f"""
    WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000, embedding FROM embeddings
        WHERE vec_id % 10 = 0
    ), vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM corpus
    ), sig AS (
        SELECT vec_id, {_planes_sql()} AS bucket FROM vecs
    ), a AS (
        SELECT s.bucket, v.vec_id, v.v FROM vecs v JOIN sig s USING (vec_id)
    ), scored AS (
        SELECT x.vec_id AS id_a, y.vec_id AS id_b,
               list_dot_product(x.v, y.v)
                 / (sqrt(list_dot_product(x.v, x.v))
                    * sqrt(list_dot_product(y.v, y.v))) AS sim
        FROM a x JOIN a y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    )
    SELECT id_a, id_b, sim,
           CASE WHEN sim >= 0.92 THEN 'positive'
                WHEN sim >= 0.25 AND sim < 0.4 THEN 'hard_negative'
           END AS kind
    FROM scored
    WHERE sim >= 0.92 OR (sim >= 0.25 AND sim < 0.4)
    """,
)
def embedding_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair mining: same-LSH-bucket pairs scored
    once, split into positives (near-duplicate views — planted copies
    of every 10th vector, the same construction the exact-dedup oracle
    uses on documents) and hard negatives (related-but-distinct band —
    the pairs that actually teach an embedding model; random negatives
    are free at training time). Never O(n^2): the bucket join bounds
    the pair space."""
    emb = load(spark, sf_dir, "embeddings")
    dup = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(dup)
    return sim.contrastive_pairs(
        corpus, pos_threshold=0.92, neg_lo=0.25, neg_hi=0.4
    )


def _duck_colstats(src: str, cols: list[str]) -> str:
    """DuckDB replica of operators.text.column_stats over ``src``."""
    parts = [
        f"""SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_str,
               CAST(MAX({c}) AS VARCHAR) AS max_str
        FROM {src}"""
        for c in cols
    ]
    return " UNION ALL ".join(parts)


@query(
    "governance_stats_drift",
    f"""
    WITH bsrc AS (SELECT * FROM documents WHERE doc_id < 250),
    bstats AS ({_duck_colstats('bsrc', ['lang', 'source', 'n_chars'])}),
    astats AS (
        {_duck_colstats('documents', ['source', 'n_chars', 'doc_id'])}
    ), j AS (
        SELECT coalesce(b.column_name, a.column_name) AS column_name,
               b.n_rows AS b_rows, b.n_nulls AS b_nulls,
               b.n_distinct AS b_distinct, b.min_str AS b_min,
               b.max_str AS b_max,
               a.n_rows AS a_rows, a.n_nulls AS a_nulls,
               a.n_distinct AS a_distinct, a.min_str AS a_min,
               a.max_str AS a_max
        FROM bstats b FULL OUTER JOIN astats a USING (column_name)
    ), scored AS (
        SELECT column_name,
               coalesce(b_distinct, 0) AS b_distinct,
               coalesce(a_distinct, 0) AS a_distinct,
               (b_rows IS NULL OR a_rows IS NULL) AS schema_change,
               CAST(CASE WHEN a_rows IS NULL OR a_rows = 0 THEN 0
                    ELSE (CAST(a_nulls AS HUGEINT) * 1000000) // a_rows
                    END AS BIGINT)
               - CAST(CASE WHEN b_rows IS NULL OR b_rows = 0 THEN 0
                      ELSE (CAST(b_nulls AS HUGEINT) * 1000000) // b_rows
                      END AS BIGINT) AS d_null,
               coalesce(b_min IS NOT NULL AND a_min IS NOT NULL
                        AND (b_min <> a_min OR b_max <> a_max), FALSE)
                   AS envelope_moved
        FROM j
    )
    SELECT column_name, b_distinct, a_distinct,
           CAST(CASE WHEN schema_change THEN 0 ELSE d_null END AS BIGINT)
               AS null_delta_ppm,
           envelope_moved,
           CASE WHEN schema_change THEN 'schema'
                WHEN envelope_moved OR NOT (d_null BETWEEN -999 AND 999)
                THEN 'drift'
                ELSE 'stable' END AS verdict
    FROM scored
    """,
)
def governance_stats_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-over-batch profile drift screen: column_stats of the first
    half of the corpus vs the full corpus (with one column dropped and
    one added to exercise schema drift) joined into a per-column
    verdict — the screen that catches an upstream feed silently
    changing shape before a month of it lands."""
    docs = load(spark, sf_dir, "documents")
    before = tx.column_stats(
        docs.filter(F.col("doc_id") < 250), ["lang", "source", "n_chars"]
    )
    after = tx.column_stats(docs, ["source", "n_chars", "doc_id"])
    return tx.stats_drift(before, after)


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — train M per-subspace
# codebooks, encode the corpus as M small codes, serve top-k by ADC
# lookup + exact rerank. The oracle replays training/encode/serve
# exactly: every quantity is an INTEGER below 2^53, so double-domain
# list_dot_product arithmetic in DuckDB is exact and matches Spark's
# BIGINT folds bit for bit.
_PQ_M = 16          # subspaces (64-dim embeddings -> 4 dims each)
_PQ_SUB = 4
_PQ_CODES = 64
_PQ_TRAIN = 1024
_PQ_RERANK = 50


def _pq_l2(a: str, b: str) -> str:
    """Exact integer squared L2 via double dot products (all values
    integer-valued and < 2^53)."""
    return (
        f"(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}))"
    )


def _pq_assign(train_src: str, cb_src: str) -> str:
    """Argmin-code assignment of ``train_src`` (vec_id, sub, svd [, rk])
    against ``cb_src`` (sub, code, cwd): (vec_id, sub, code, svd)."""
    return f"""
    SELECT vec_id, sub, code, svd FROM (
        SELECT t.vec_id, t.sub, c.code, t.svd,
               row_number() OVER (
                   PARTITION BY t.vec_id, t.sub
                   ORDER BY {_pq_l2('t.svd', 'c.cwd')}, c.code
               ) AS ark
        FROM {train_src} t JOIN {cb_src} c USING (sub)
    ) WHERE ark = 1
    """


def _pq_update(assign_cte: str, prev_cte: str) -> str:
    """New codebook from an assignment: element-wise sum div count
    (truncating integer division — Spark `div` semantics); empty codes
    carry the previous round's word."""
    return f"""
    SELECT p.sub, p.code, coalesce(n.cwd, p.cwd) AS cwd
    FROM {prev_cte} p LEFT JOIN (
        SELECT sub, code,
               list(CAST(sx // cnt AS DOUBLE) ORDER BY pos) AS cwd
        FROM (
            SELECT sub, code, pos,
                   CAST(SUM(val) AS BIGINT) AS sx,
                   COUNT(*) AS cnt
            FROM (
                SELECT sub, code,
                       unnest(generate_series(1, len(svd))) AS pos,
                       unnest(list_transform(svd,
                           x -> CAST(x AS BIGINT))) AS val
                FROM {assign_cte}
            )
            GROUP BY sub, code, pos
        )
        GROUP BY sub, code
    ) n ON p.sub = n.sub AND p.code = n.code
    """


def _pq_core(p: str) -> str:
    """PQ training + corpus-encode CTEs with ``p``-prefixed names, so
    the standalone PQ queries (p='') and the IVF x PQ composition
    (p='pq_', where IVF already owns `ivecs`/`seed`) share one
    definition. Requires upstream CTEs ``vecs`` and ``ranked``."""
    return f"""
, {p}ivecs AS (
    SELECT vec_id,
           list_transform(v, x -> CAST(CAST(floor(x * 1000000 + 0.5)
                                       AS BIGINT) AS DOUBLE)) AS ivd
    FROM vecs
), {p}subs AS (
    SELECT unnest(generate_series(0, {_PQ_M - 1})) AS sub
), {p}allsub AS (
    SELECT i.vec_id, s.sub,
           list_slice(i.ivd, s.sub * {_PQ_SUB} + 1,
                      s.sub * {_PQ_SUB} + {_PQ_SUB}) AS svd
    FROM {p}ivecs i CROSS JOIN {p}subs s
), {p}tsub AS (
    SELECT a.vec_id, r.rk, a.sub, a.svd
    FROM {p}allsub a JOIN ranked r USING (vec_id)
    WHERE r.rk <= {_PQ_TRAIN}
), {p}seed AS (
    SELECT sub, CAST(rk AS INT) AS code, svd AS cwd
    FROM {p}tsub WHERE rk <= {_PQ_CODES}
), {p}pa1 AS (
    {_pq_assign(f'{p}tsub', f'{p}seed')}
), {p}pc1 AS (
    {_pq_update(f'{p}pa1', f'{p}seed')}
), {p}pa2 AS (
    {_pq_assign(f'{p}tsub', f'{p}pc1')}
), {p}books AS (
    {_pq_update(f'{p}pa2', f'{p}pc1')}
), {p}codes AS (
    {_pq_assign(f'{p}allsub', f'{p}books')}
)"""


_PQ_CTE = f"""
WITH vecs AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), ranked AS (
    SELECT vec_id,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                              vec_id) AS rk
    FROM vecs
){_pq_core('')}
, qsub AS (
    SELECT vec_id AS query_id, sub, svd AS qvd
    FROM allsub WHERE vec_id < 20
), lut AS (
    SELECT q.query_id, b.sub, b.code,
           list_dot_product(q.qvd, b.cwd) AS pdot
    FROM qsub q JOIN books b USING (sub)
), adc AS (
    SELECT query_id, neighbor_id FROM (
        SELECT l.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY l.query_id
                   ORDER BY SUM(l.pdot) DESC, c.vec_id
               ) AS adcrk
        FROM codes c JOIN lut l
          ON c.sub = l.sub AND c.code = l.code
        WHERE c.vec_id <> l.query_id
        GROUP BY l.query_id, c.vec_id
    ) WHERE adcrk <= {_PQ_RERANK}
), rescored AS (
    SELECT a.query_id, a.neighbor_id,
           list_dot_product(q.v, n.v)
             / (sqrt(list_dot_product(q.v, q.v))
                * sqrt(list_dot_product(n.v, n.v))) AS sim
    FROM adc a
    JOIN vecs q ON q.vec_id = a.query_id
    JOIN vecs n ON n.vec_id = a.neighbor_id
)
"""


@query(
    "similarity_pq_topk",
    _PQ_CTE + """
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM rescored
    ) WHERE rank <= 5
    """,
)
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (train + encode + ADC serve + exact
    rerank): M=16 codebooks of 64 integer centroids train on a bounded
    md5-ranked sample (2 Lloyd rounds, exact integer L2, truncating-div
    centroids); the corpus compresses to 16 codes/vector; each query
    scores the code stream through a broadcast LUT and exact cosine
    re-ranks its top 50. All-integer until the final rerank, so the
    oracle replays every step bit-for-bit."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.pq_index_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=5,
        m=_PQ_M, n_codes=_PQ_CODES, max_train=_PQ_TRAIN,
        rerank=_PQ_RERANK,
    )


@query(
    "similarity_pq_recall",
    _PQ_CTE + f"""
, approx AS (
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM rescored
    ) WHERE rank <= 5
), eq AS (
    SELECT vec_id AS query_id, v AS qv FROM vecs WHERE vec_id < 20
), ec AS (
    SELECT vec_id AS neighbor_id, v AS cv FROM vecs
), escored AS (
    SELECT query_id, neighbor_id, {_COS} AS sim
    FROM ec CROSS JOIN eq
    WHERE query_id <> neighbor_id
), exact AS (
    SELECT query_id, neighbor_id, rank FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM escored
    ) WHERE rank <= 5
)
{_RECALL_TAIL}
""",
)
def similarity_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit for the PQ path (same configuration as
    similarity_pq_topk): per-query top-5 overlap and top-1 agreement vs
    exact search — quantifies what 16x4-dim x 64-code quantization plus
    a 50-candidate rerank trades away."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    return sim.topk_recall(
        sim.brute_force_topk(emb, q, k=5),
        sim.pq_index_topk(
            emb, q, k=5, m=_PQ_M, n_codes=_PQ_CODES,
            max_train=_PQ_TRAIN, rerank=_PQ_RERANK,
        ),
    )


@query(
    "text_lang_fertility",
    f"""
    WITH w AS (
        SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
        FROM documents
    ), t AS (
        SELECT doc_id, len(w) AS nc,
               len({_bpe_apply_duckdb(_BPE_MERGES)}) AS nt
        FROM w
    )
    SELECT d.lang,
           CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(t.nc) AS BIGINT) AS n_chars,
           CAST(SUM(t.nt) AS BIGINT) AS n_tokens,
           CAST(SUM(t.nc) AS DOUBLE) / SUM(t.nt) AS chars_per_token
    FROM t JOIN documents d USING (doc_id)
    GROUP BY d.lang
    """,
)
def text_lang_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: pooled chars-per-token of the
    fixed BPE merge list per language — the multilingual-equity metric
    (a tokenizer trained on English spends ~2-4x more tokens per
    character on underrepresented scripts, which silently taxes their
    training budget). Pooled from integer totals; one double division
    per language."""
    docs = load(spark, sf_dir, "documents")
    per_doc = tx.bpe_encode_stats(docs, _BPE_MERGES)
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_words").cast("bigint").alias("n_words"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "chars_per_token",
            F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"),
        )
    )


@query(
    "curation_pipeline_v3",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), occ3 AS (
        SELECT doc_id, unnest(list_transform(
            generate_series(1, len(t) - 1),
            i -> struct_pack(
                h1 := CAST(('0x' || substr(md5(t[i]), 1, 8)) AS BIGINT),
                h2 := CAST(('0x' || substr(md5(t[i+1]), 1, 8)) AS BIGINT))
        )) AS g
        FROM toks WHERE len(t) >= 2
    ), pairs3 AS (
        SELECT doc_id, g.h1 AS h1, g.h2 AS h2 FROM occ3
    ), c23 AS (
        SELECT h1, h2, CAST(COUNT(*) AS BIGINT) AS c2
        FROM pairs3 GROUP BY h1, h2
    ), c13 AS (
        SELECT h1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c23 GROUP BY h1
    ), doc3 AS (
        SELECT p.doc_id,
               CAST(SUM((CAST(c1 AS HUGEINT) * 1000000) // c2) AS BIGINT)
                   AS st,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM pairs3 p JOIN c23 USING (h1, h2) JOIN c13 USING (h1)
        GROUP BY p.doc_id
    ), gated AS (
        -- keep each source's most-predictable half (percentile gate)
        SELECT doc_id, source FROM (
            SELECT d.doc_id, dd.source,
                   percent_rank() OVER (
                       PARTITION BY dd.source
                       ORDER BY CAST(d.st AS DOUBLE) / d.nb, d.doc_id
                   ) AS pr
            FROM doc3 d JOIN documents dd USING (doc_id)
        ) WHERE pr <= 0.5
    ), counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS stratum_n
        FROM gated GROUP BY source
    ), tot AS (
        SELECT CAST(SUM(stratum_n) AS BIGINT) AS N FROM counts
    ), q3 AS (
        SELECT source, stratum_n,
               CAST((CAST(200 AS HUGEINT) * stratum_n) // N AS BIGINT)
                   AS base,
               CAST((CAST(200 AS HUGEINT) * stratum_n) % N AS BIGINT) AS rem
        FROM counts CROSS JOIN tot
    ), r3 AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rrank,
               200 - SUM(base) OVER () AS leftover
        FROM q3
    ), quotas3 AS (
        SELECT source, stratum_n,
               least(stratum_n, base + CASE WHEN rrank <= leftover
                     THEN 1 ELSE 0 END) AS quota
        FROM r3
    ), sel3 AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS srank
        FROM gated
    )
    SELECT s.doc_id, s.source, CAST(q.quota AS BIGINT) AS quota,
           q.stratum_n
    FROM sel3 s JOIN quotas3 q USING (source)
    WHERE s.srank <= q.quota
    """,
)
def curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 curation chain, one plan end to end: bigram-LM surprise
    scores every document (the model trains in-plan), each source
    keeps its most-predictable half (within-source percentile gate —
    calibrated, so no source is wiped out by a global threshold), and
    a 200-document budget is apportioned exactly across sources by
    largest remainder with md5-rank membership."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    docs = load(spark, sf_dir, "documents")
    scored = tx.lm_bigram_surprise(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    gated = (
        smp.group_percentile(
            scored, "surprise_mean", ["source"], tiebreak_col="doc_id"
        )
        .filter(F.col("pct_rank") <= 0.5)
        .select("doc_id", "source")
    )
    out = smp.allocate_stratified(
        gated, ["source"], 200, tiebreak_col="doc_id"
    )
    return out.select("doc_id", "source", "quota", "stratum_n")


_IVFPQ_RERANK = 10


@query(
    "similarity_ivfpq_topk",
    _IVF_CELLS_CTE + _pq_core("pq_") + f"""
, xp_probes AS (
    SELECT vec_id AS query_id, cell FROM cell_scores
    WHERE cell_rank <= 2 AND vec_id < 20
), xp_assign AS (
    SELECT vec_id AS neighbor_id, cell FROM cell_scores
    WHERE cell_rank = 1
), xp_cand AS (
    SELECT p.query_id, a.neighbor_id
    FROM xp_assign a JOIN xp_probes p USING (cell)
    WHERE p.query_id <> a.neighbor_id
), xp_qsub AS (
    SELECT vec_id AS query_id, sub, svd AS qvd
    FROM pq_allsub WHERE vec_id < 20
), xp_lut AS (
    SELECT q.query_id, b.sub, b.code,
           list_dot_product(q.qvd, b.cwd) AS pdot
    FROM xp_qsub q JOIN pq_books b USING (sub)
), xp_adc AS (
    SELECT query_id, neighbor_id FROM (
        SELECT cd.query_id, cd.neighbor_id,
               row_number() OVER (
                   PARTITION BY cd.query_id
                   ORDER BY SUM(l.pdot) DESC, cd.neighbor_id
               ) AS adcrk
        FROM xp_cand cd
        JOIN pq_codes c ON c.vec_id = cd.neighbor_id
        JOIN xp_lut l ON l.query_id = cd.query_id
                     AND l.sub = c.sub AND l.code = c.code
        GROUP BY cd.query_id, cd.neighbor_id
    ) WHERE adcrk <= {_IVFPQ_RERANK}
), xp_rescored AS (
    SELECT a.query_id, a.neighbor_id,
           list_dot_product(q.v, n.v)
             / (sqrt(list_dot_product(q.v, q.v))
                * sqrt(list_dot_product(n.v, n.v))) AS sim
    FROM xp_adc a
    JOIN vecs q ON q.vec_id = a.query_id
    JOIN vecs n ON n.vec_id = a.neighbor_id
)
SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rank
    FROM xp_rescored
) WHERE rank <= 5
""",
)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF x PQ — the full 100 TB ANN serving composition: the coarse
    quantizer bounds WHICH vectors a query considers (nprobe=2 of 16
    cells), PQ bounds WHAT is read per considered vector (16 codes
    through the query's integer ADC LUT), and exact cosine reranks the
    surviving 10. Both quantizers train on the same bounded md5-ranked
    sample; the oracle replays cell training, codebook training,
    encode, probe, ADC and rerank end to end."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ivf_pq_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=5,
        n_cells=_IVF_N_CELLS, nprobe=2,
        m=_PQ_M, n_codes=_PQ_CODES, max_train=_PQ_TRAIN,
        rerank=_IVFPQ_RERANK,
    )


def _bands_sql_k(n_bands: int) -> str:
    """Banding bucket SQL for an explicit band count (mirrors
    dd.minhash_lsh_candidates(bands=n_bands))."""
    rows_per_band = dd.MINHASH_K // n_bands
    selects = []
    for b in range(n_bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        key = "md5(concat_ws(',', " + ", ".join(
            f"CAST({c} AS VARCHAR)" for c in cols
        ) + "))"
        selects.append(
            f"SELECT doc_id, {b} AS band, {key} AS bkey FROM sigs"
        )
    return "\n    UNION ALL\n    ".join(selects)


# Containment corpus: every 7th document contributes an 8-token QUOTE
# (its tokenized prefix) — near-zero Jaccard vs its source, containment
# 1.0. The construction is identical on both engines.
_DOCS_QUOTE_CTE = f"""
WITH docs2 AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 200000 AS doc_id,
           array_to_string(list_slice({_TOKS}, 1, 8), ' ') AS text
    FROM documents WHERE doc_id % 7 = 0
)
"""


@query(
    "dedup_containment_pairs",
    _DOCS_QUOTE_CTE + _TOKEN_HASH_CTE + _SIGS_CTE + f"""
, buckets AS (
    {_bands_sql_k(32)}
), cands AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM buckets a JOIN buckets b
      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
), sizes AS (
    SELECT doc_id, COUNT(*) AS sz FROM th GROUP BY doc_id
), inter AS (
    SELECT ta.doc_id AS doc_a, tb.doc_id AS doc_b, COUNT(*) AS inter
    FROM th ta JOIN th tb ON ta.th = tb.th AND ta.doc_id < tb.doc_id
    JOIN cands c ON c.doc_a = ta.doc_id AND c.doc_b = tb.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, jaccard, containment_a_in_b, containment_b_in_a
FROM (
    SELECT sc.*,
           row_number() OVER (
               PARTITION BY CASE WHEN doc_a >= 200000 THEN doc_a
                                 ELSE doc_b END
               ORDER BY greatest(containment_a_in_b,
                                 containment_b_in_a) DESC,
                        jaccard DESC, doc_a, doc_b
           ) AS crk
    FROM (
        SELECT i.doc_a, i.doc_b,
               CAST(i.inter AS DOUBLE)
                   / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) AS jaccard,
               CAST(i.inter AS DOUBLE) / sa.sz AS containment_a_in_b,
               CAST(i.inter AS DOUBLE) / sb.sz AS containment_b_in_a
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        WHERE (CAST(i.inter AS DOUBLE) / sa.sz >= 0.8
               OR CAST(i.inter AS DOUBLE) / sb.sz >= 0.8)
          AND (i.doc_a >= 200000 OR i.doc_b >= 200000)
    ) sc
) WHERE crk <= 3
""",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment detection: an 8-token quote planted from
    every 7th document scores near-zero Jaccard against its source
    (symmetric dedup is blind to it) but containment 1.0. Banding runs
    at 16 one-row bands — containment search needs candidate recall at
    LOW Jaccard, which threshold-tuned banding deliberately suppresses."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    quotes = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.array_join(F.slice(tx.tokens("text"), 1, 8), " ").alias("text"),
    )
    from pyspark.sql import Window

    corpus = docs.unionByName(quotes)
    pairs = dd.containment_pairs(corpus, threshold=0.8, bands=32).filter(
        (F.col("doc_a") >= 200000) | (F.col("doc_b") >= 200000)
    )
    # the small synthetic vocabulary makes containment ubiquitous among
    # real docs; the report keeps each quote's 3 strongest containers
    quote = F.when(
        F.col("doc_a") >= 200000, F.col("doc_a")
    ).otherwise(F.col("doc_b"))
    w = Window.partitionBy(quote).orderBy(
        F.greatest(
            F.col("containment_a_in_b"), F.col("containment_b_in_a")
        ).desc(),
        F.col("jaccard").desc(), F.col("doc_a"), F.col("doc_b"),
    )
    return (
        pairs.withColumn("crk", F.row_number().over(w))
        .filter(F.col("crk") <= 3)
        .drop("crk")
    )


@query(
    "embedding_trimmed_centroids",
    """
    WITH tex AS (
        SELECT label, vec_id AS vid,
               unnest(generate_series(1, len(embedding))) - 1 AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ), tr AS (
        SELECT label, dim, v,
               row_number() OVER (PARTITION BY label, dim
                                  ORDER BY v, vid) AS rk,
               COUNT(*) OVER (PARTITION BY label, dim) AS n
        FROM tex
    )
    SELECT CAST(label AS BIGINT) AS label, CAST(dim AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(CAST(floor(v * 1000000000 + 0.5) AS BIGINT))
                AS DOUBLE) / 1000000000.0 / COUNT(*)
               AS avg_val_trimmed
    FROM tr
    WHERE rk > (n * 1) // 10 AND rk <= n - (n * 1) // 10
    GROUP BY label, dim
    """,
)
def embedding_trimmed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-label centroids: each (label, dim) drops its lowest
    and highest 10% of values by exact integer rank before the decimal
    average — one poisoned embedding can move a mean centroid
    arbitrarily far; a trimmed mean it cannot."""
    return sim.trimmed_label_centroids(load(spark, sf_dir, "embeddings"))


@query(
    "dedup_similarity_histogram",
    _DOCS_NEAR_CTE + _LSH_PAIR_CTES + """
SELECT CAST((10 * i.inter) // (sa.sz + sb.sz - i.inter) AS BIGINT)
           AS sim_decile,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
GROUP BY 1
""",
)
def dedup_similarity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-pair similarity histogram — the threshold-tuning
    artifact: how much pair mass sits in each Jaccard decile among the
    0.8-tuned banding's candidates. A fat bucket just under the dedup
    threshold is the signature of a threshold set slightly too high
    (or a corpus of systematic near-misses). Deciles are computed in
    exact integer arithmetic ((10*inter) div union), so the report is
    engine-identical."""
    docs = _docs_near(spark, sf_dir)
    sets_ = dd.doc_token_sets(docs)
    sigs = dd.minhash_signatures(sets_)
    cands = dd.minhash_lsh_candidates(
        sigs, bands=dd.bands_for_threshold(0.8)
    )
    inter = F.size(F.array_intersect("ths_a", "ths_b"))
    return (
        cands.join(
            sets_.select(F.col("doc_id").alias("doc_a"),
                         F.col("ths").alias("ths_a")), "doc_a",
        )
        .join(
            sets_.select(F.col("doc_id").alias("doc_b"),
                         F.col("ths").alias("ths_b")), "doc_b",
        )
        .select(
            F.expr(
                "CAST((10 * size(array_intersect(ths_a, ths_b))) div "
                "(size(ths_a) + size(ths_b) "
                "- size(array_intersect(ths_a, ths_b))) AS BIGINT)"
            ).alias("sim_decile")
        )
        .groupBy("sim_decile")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


@query(
    "text_langid_confusion",
    """
WITH docs2 AS (SELECT doc_id, text, lang FROM documents)
"""
    + _LANG_VOTE_SQL
    + """
, pred AS (
    SELECT d.doc_id, d.lang,
           CASE WHEN (CASE WHEN length(d.text) > 0 THEN
                     CAST(length(regexp_replace(d.text, '[^一-鿿]', '',
                          'g')) AS DOUBLE) / length(d.text)
                ELSE 0.0 END) > 0.2 THEN 'zh'
                WHEN greatest(v.v_de, v.v_en, v.v_es, v.v_fr) <= 0
                    THEN 'und'
                WHEN v.v_de = greatest(v.v_de, v.v_en, v.v_es, v.v_fr)
                    THEN 'de'
                WHEN v.v_en = greatest(v.v_de, v.v_en, v.v_es, v.v_fr)
                    THEN 'en'
                WHEN v.v_es = greatest(v.v_de, v.v_en, v.v_es, v.v_fr)
                    THEN 'es'
                ELSE 'fr' END AS lang_pred
    FROM docs2 d JOIN votes v USING (doc_id)
)
SELECT lang AS lang_true, lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       (lang = lang_pred) AS is_correct
FROM pred
GROUP BY lang, lang_pred
""",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-engine model evaluation: the language-ID confusion matrix
    (true lang x predicted lang x count) over the whole corpus in one
    aggregate — the artifact that says WHERE a classifier fails, not
    just how often. The pattern generalizes to any cheap in-plan
    classifier evaluated against labels."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("lang_true"),
            tx.lang_id(F.col("text")).alias("lang_pred"),
        )
        .groupBy("lang_true", "lang_pred")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .withColumn(
            "is_correct", F.col("lang_true") == F.col("lang_pred")
        )
    )


@query(
    "clean_mad_outliers",
    """
    WITH vals AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        FROM events
    ), med AS (
        SELECT event_type, v AS group_median FROM (
            SELECT event_type, v,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY v, event_id) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM vals
        ) WHERE rk = (n + 1) // 2
    ), dev AS (
        SELECT x.event_id, x.event_type, x.v, m.group_median,
               abs(x.v - m.group_median) AS d
        FROM vals x JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, d AS group_mad FROM (
            SELECT event_type, d,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY d, event_id) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ) WHERE rk = (n + 1) // 2
    )
    SELECT d.event_id, d.event_type,
           CAST(d.v AS DOUBLE) / 100.0 AS value,
           CAST(d.group_median AS DOUBLE) / 100.0 AS group_median,
           CAST(a.group_mad AS DOUBLE) / 100.0 AS group_mad,
           (d.d > 3 * a.group_mad) AS is_outlier
    FROM dev d JOIN mad a USING (event_type)
    """,
)
def clean_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier flags on event values per type — the robust
    detector (50% breakdown point) whose own statistics the outliers
    cannot drag, unlike the z-test's mean/stddev. Lower-median rank
    selections and decimal arithmetic keep every flag engine-exact."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    e = load(spark, sf_dir, "events").select(
        "event_id", "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint").alias("v"),
    )
    out = smp.mad_outliers(
        e, "v", ["event_type"], k=3, tiebreak_col="event_id"
    )
    return out.select(
        "event_id", "event_type",
        (F.col("v").cast("double") / F.lit(100.0)).alias("value"),
        (F.col("group_median").cast("double") / F.lit(100.0))
        .alias("group_median"),
        (F.col("group_mad").cast("double") / F.lit(100.0))
        .alias("group_mad"),
        "is_outlier",
    )


@query(
    "dedup_cluster_density",
    _CC_CTES + """
, gm AS (
    SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM pairs
        UNION ALL SELECT doc_b FROM pairs
    )
), gv AS (
    SELECT c.component_id, CAST(COUNT(*) AS BIGINT) AS n_vertices
    FROM comp c JOIN gm USING (doc_id) GROUP BY 1
), ge AS (
    SELECT c.component_id, CAST(COUNT(*) AS BIGINT) AS n_edges
    FROM pairs p JOIN comp c ON c.doc_id = p.doc_a GROUP BY 1
), gt AS (
    SELECT c.component_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (
        SELECT e1.doc_a AS x, e1.doc_b AS y, e2.doc_b AS z
        FROM pairs e1
        JOIN pairs e2 ON e1.doc_b = e2.doc_a
        JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ) t JOIN comp c ON c.doc_id = t.x
    GROUP BY 1
)
SELECT v.component_id, v.n_vertices, e.n_edges,
       CAST(CASE WHEN e.n_edges <= 50000
            THEN coalesce(t.n_triangles, 0) END AS BIGINT) AS n_triangles,
       CAST((CAST(2 AS HUGEINT) * e.n_edges * 1000000)
            // (v.n_vertices * (v.n_vertices - 1)) AS BIGINT)
           AS density_ppm
FROM gv v JOIN ge e USING (component_id)
LEFT JOIN gt t USING (component_id)
""",
)
def dedup_cluster_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural audit of every dup cluster: vertex/edge/triangle
    counts and exact-ppm edge density — near-clique components are
    true duplicate groups; sparse, triangle-poor chains are the
    transitive-closure artifacts of a too-loose threshold and should
    not be collapsed to one survivor."""
    docs = _docs_near(spark, sf_dir)
    # Materialized ONCE (localCheckpoint): connected_components
    # checkpoints only its INTERNAL copy of the edge frame, so the
    # audit's el join would otherwise re-execute the whole minhash
    # pair pipeline a second time (profiled: 116 -> 84 jobs for this
    # one query; guide §1.2). Checkpoint, not bare persist: the pair
    # frame is threshold-bounded and truncation stops the audit's
    # multi-consumer plan from nesting the full minhash lineage per
    # reference (the persisted variant's formatted plan hit 1.4 MB —
    # real single-threaded planning cost, guide §7.3). The bench's
    # staged entry persists these same frames via its harness — this
    # aligns the query path.
    pairs = dd.minhash_dedup(docs, threshold=0.8).localCheckpoint()
    labels = dd.connected_components(docs.select("doc_id"), pairs)
    return dd.graph_cluster_stats(pairs, labels)


# -- round-5 additions ------------------------------------------------------

_GOPHER_DOCS_CTE = """
WITH docs2 AS (
    -- plant structural variety the rules can discriminate: every 5th
    -- doc gets bullet lines, every 9th an ellipsis tail, every 11th a
    -- symbol-heavy suffix, every 13th is truncated to a short stub
    SELECT doc_id,
           CASE WHEN doc_id % 13 = 0
                THEN substr(text, 1, 80)
                ELSE text
                  || CASE WHEN doc_id % 5 = 0
                          THEN chr(10) || '- bullet one' || chr(10)
                               || '- bullet two' ELSE '' END
                  || CASE WHEN doc_id % 9 = 0
                          THEN chr(10) || 'to be continued...' ELSE '' END
                  || CASE WHEN doc_id % 11 = 0
                          THEN ' ## ## ## ## ## ## ## ##' ELSE '' END
           END AS text
    FROM documents
)
"""

_GOPHER_SQL = _GOPHER_DOCS_CTE + """
, toks AS (
    SELECT doc_id, text,
           list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                       x -> x != '') AS tk,
           string_split(text, chr(10)) AS lines
    FROM docs2
), m AS (
    SELECT doc_id,
           CAST(len(tk) AS BIGINT) AS n_words,
           CAST(coalesce(list_sum(list_transform(tk, x -> len(x))), 0)
                AS BIGINT) AS tot_len,
           CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))
                AS BIGINT) AS alpha_words,
           CAST(len(list_filter(['the','be','to','of','and','that',
                                 'have','with'],
                                w -> list_contains(tk, w)))
                AS BIGINT) AS n_stop,
           CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
               AS n_hash,
           CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT)
               AS n_ellipsis,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(list_filter(lines,
                    l -> regexp_matches(ltrim(l), '^[-*•]')))
                AS BIGINT) AS bullet_lines,
           CAST(len(list_filter(lines,
                    l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
                AS BIGINT) AS ellipsis_lines
    FROM toks
), r AS (
    SELECT doc_id, n_words,
           CASE WHEN n_words > 0
                THEN CAST(tot_len AS DOUBLE) / n_words END AS mean_word_len,
           CASE WHEN n_words > 0
                THEN CAST(n_hash + n_ellipsis AS DOUBLE) / n_words
                ELSE 0.0 END AS symbol_word_ratio,
           CASE WHEN n_lines > 0
                THEN CAST(bullet_lines AS DOUBLE) / n_lines
                ELSE 0.0 END AS bullet_line_ratio,
           CASE WHEN n_lines > 0
                THEN CAST(ellipsis_lines AS DOUBLE) / n_lines
                ELSE 0.0 END AS ellipsis_line_ratio,
           CASE WHEN n_words > 0
                THEN CAST(alpha_words AS DOUBLE) / n_words
                ELSE 0.0 END AS alpha_word_ratio,
           n_stop AS n_required_stopwords
    FROM m
)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
       bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
       n_required_stopwords,
       coalesce(n_words >= 50 AND n_words <= 100000, FALSE)
           AS pass_word_count,
       coalesce(mean_word_len >= 3.0 AND mean_word_len <= 10.0, FALSE)
           AS pass_mean_word_len,
       coalesce(symbol_word_ratio <= 0.1, FALSE) AS pass_symbol_ratio,
       coalesce(bullet_line_ratio <= 0.9, FALSE) AS pass_bullet_lines,
       coalesce(ellipsis_line_ratio <= 0.3, FALSE) AS pass_ellipsis_lines,
       coalesce(alpha_word_ratio >= 0.8, FALSE) AS pass_alpha_words,
       coalesce(n_required_stopwords >= 2, FALSE) AS pass_stopwords,
       (coalesce(n_words >= 50 AND n_words <= 100000, FALSE)
        AND coalesce(mean_word_len >= 3.0 AND mean_word_len <= 10.0, FALSE)
        AND coalesce(symbol_word_ratio <= 0.1, FALSE)
        AND coalesce(bullet_line_ratio <= 0.9, FALSE)
        AND coalesce(ellipsis_line_ratio <= 0.3, FALSE)
        AND coalesce(alpha_word_ratio >= 0.8, FALSE)
        AND coalesce(n_required_stopwords >= 2, FALSE)) AS pass_gopher
FROM r
"""


@query("text_gopher_filters", _GOPHER_SQL)
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery (Rae et al. 2021): the seven published
    structural quality rules as one shuffle-free column-algebra pass.
    The corpus is decorated with planted bullet blocks, ellipsis tails,
    symbol runs and short stubs so every rule discriminates (mirrored
    verbatim in the oracle)."""
    docs = load(spark, sf_dir, "documents")
    decorated = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0, F.substring("text", 1, 80)
        ).otherwise(
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 5 == 0,
                    F.lit("\n- bullet one\n- bullet two"),
                ).otherwise(F.lit("")),
                F.when(
                    F.col("doc_id") % 9 == 0,
                    F.lit("\nto be continued..."),
                ).otherwise(F.lit("")),
                F.when(
                    F.col("doc_id") % 11 == 0,
                    F.lit(" ## ## ## ## ## ## ## ##"),
                ).otherwise(F.lit("")),
            )
        ).alias("text"),
    )
    return tx.gopher_quality_filters(decorated)


_TEMP_BUDGET = 4000

_TEMP_MIX_SQL = f"""
WITH ttoks AS (
    SELECT source, len({_TOKS}) AS nt FROM documents
), tagg AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tokens
    FROM ttoks GROUP BY source
), tsqrt AS (
    -- exact isqrt: double-sqrt seed corrected ±1 with integer compares
    SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS sd
    FROM tagg
), tw AS (
    SELECT source, n_docs, n_tokens,
           CAST(CASE WHEN (sd + 1) * (sd + 1) <= n_tokens THEN sd + 1
                     WHEN sd * sd <= n_tokens THEN sd
                     ELSE sd - 1 END AS BIGINT) AS weight
    FROM tsqrt
), tt AS (
    SELECT *, CAST(SUM(weight) OVER () AS BIGINT) AS wsum FROM tw
)
SELECT source, n_docs, n_tokens, weight,
       CAST(CASE WHEN wsum = 0 THEN 0
            ELSE (CAST({_TEMP_BUDGET} AS HUGEINT) * weight) // wsum END
            AS BIGINT) AS target_tokens,
       CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(least(1000000, CAST(
                 ((CAST({_TEMP_BUDGET} AS HUGEINT) * weight) // wsum
                      * 1000000) // n_tokens AS BIGINT)) AS BIGINT)
       END AS rate_ppm
FROM tt
"""


@query("curation_mixture_temperature", _TEMP_MIX_SQL)
def curation_mixture_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-smoothed (alpha=0.5) mixture plan: source shares
    proportional to sqrt(n_tokens) — the multilingual rebalancing rule
    that up-weights small sources. The isqrt is exact on both engines
    (double seed, integer ±1 correction), so the whole plan is pure
    int64/int128 arithmetic."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    docs = load(spark, sf_dir, "documents")
    return smp.mixture_plan_temperature(docs, _TEMP_BUDGET, alpha=0.5)


_PROTO_SQL = _IVF_CELLS_CTE + """
, passign AS (
    SELECT vec_id, cell, cs FROM cell_scores WHERE cell_rank = 1
), pr AS (
    SELECT vec_id, CAST(cell AS BIGINT) AS cell, cs AS cell_sim,
           CAST(row_number() OVER (PARTITION BY cell
                                   ORDER BY cs DESC, vec_id)
                AS BIGINT) AS proto_rank,
           CAST(COUNT(*) OVER (PARTITION BY cell) AS BIGINT) AS n_cell
    FROM passign
)
SELECT vec_id, cell, cell_sim, proto_rank,
       proto_rank > (n_cell * 200000) // 1000000 AS is_kept
FROM pr
"""


@query("curation_prototypes", _PROTO_SQL)
def curation_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-supervised-prototypes density pruning (Sorscher et al.
    2022): drop the most centroid-prototypical 20% of every k-means
    cell — the abundant-data pruning rule. No pairwise work: train is
    sample-bounded, assignment broadcasts the centroids, the cutoff is
    one window per cell with an exact integer threshold."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.prototype_prune(emb, prune_ppm=200_000)


_V4_BUDGET = 3000

# v4 oracle: structural Gopher gate (stopword rule recorded but not
# gated — this synthetic corpus has no English function words, the same
# per-corpus configuration any non-English deployment makes) ->
# temperature-smoothed plan over the survivors -> per-source md5-bucket
# application. Composes the gopher and temperature CTE machinery over
# RAW documents (no decoration).
_V4_SQL = f"""
WITH toks AS (
    SELECT doc_id, source, text,
           list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                       x -> x != '') AS tk,
           string_split(text, chr(10)) AS lines
    FROM documents
), m AS (
    SELECT doc_id, source, tk,
           CAST(len(tk) AS BIGINT) AS n_words,
           CAST(coalesce(list_sum(list_transform(tk, x -> len(x))), 0)
                AS BIGINT) AS tot_len,
           CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]')))
                AS BIGINT) AS alpha_words,
           CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
               AS n_hash,
           CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT)
               AS n_ellipsis,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(list_filter(lines,
                    l -> regexp_matches(ltrim(l), '^[-*•]')))
                AS BIGINT) AS bullet_lines,
           CAST(len(list_filter(lines,
                    l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))
                AS BIGINT) AS ellipsis_lines
    FROM toks
), surv AS (
    SELECT doc_id, source, CAST(len(tk) AS BIGINT) AS nt
    FROM m
    WHERE coalesce(n_words >= 50 AND n_words <= 100000, FALSE)
      AND coalesce(CAST(tot_len AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0,
                   FALSE)
      AND coalesce(CASE WHEN n_words > 0
                        THEN CAST(n_hash + n_ellipsis AS DOUBLE) / n_words
                        ELSE 0.0 END <= 0.1, FALSE)
      AND coalesce(CASE WHEN n_lines > 0
                        THEN CAST(bullet_lines AS DOUBLE) / n_lines
                        ELSE 0.0 END <= 0.9, FALSE)
      AND coalesce(CASE WHEN n_lines > 0
                        THEN CAST(ellipsis_lines AS DOUBLE) / n_lines
                        ELSE 0.0 END <= 0.3, FALSE)
      AND coalesce(CASE WHEN n_words > 0
                        THEN CAST(alpha_words AS DOUBLE) / n_words
                        ELSE 0.0 END >= 0.8, FALSE)
), tagg AS (
    SELECT source, CAST(SUM(nt) AS BIGINT) AS n_tokens
    FROM surv GROUP BY source
), tsqrt AS (
    SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS sd
    FROM tagg
), tw AS (
    SELECT source, n_tokens,
           CAST(CASE WHEN (sd + 1) * (sd + 1) <= n_tokens THEN sd + 1
                     WHEN sd * sd <= n_tokens THEN sd
                     ELSE sd - 1 END AS BIGINT) AS weight
    FROM tsqrt
), tt AS (
    SELECT *, CAST(SUM(weight) OVER () AS BIGINT) AS wsum FROM tw
), rates AS (
    SELECT source,
           CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(least(1000000, CAST(
                     ((CAST({_V4_BUDGET} AS HUGEINT) * weight) // wsum
                          * 1000000) // n_tokens AS BIGINT)) AS BIGINT)
           END AS rate_ppm
    FROM tt
)
SELECT s.doc_id, s.source
FROM surv s JOIN rates r USING (source)
WHERE CAST(('0x' || substr(md5(s.source || '|'
               || CAST(s.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 1000000 < r.rate_ppm
"""


@query("curation_pipeline_v4", _V4_SQL)
def curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation v4, one plan end-to-end: the inline Gopher
    STRUCTURAL gate (pure predicate — pushdown reaches the scan; the
    English-stopword rule is recorded by the battery but not gated on
    this synthetic corpus, the standard per-corpus configuration) ->
    temperature-smoothed (alpha=0.5) mixture plan over the survivors ->
    deterministic per-source md5-bucket sampling at the planned ppm
    rate. The corpus never shuffles: the gate is a filter, the plan
    frame is sources-sized and broadcasts."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sampling as smp,
    )

    docs = load(spark, sf_dir, "documents")
    surv = docs.filter(tx.gopher_structural_pass(F.col("text")))
    return smp.mixture_sample_temperature(surv, _V4_BUDGET, alpha=0.5)


# Gap planting for the gap-fill query: whole (day-of-month, type-length)
# cells are excluded by a deterministic predicate (constant per cell, so
# entire (type, day) combos vanish) — mirrored verbatim in the oracle.
_GAP_PRED = (
    "(EXTRACT(day FROM ts) * 31 + length(event_type)) % 11 >= 2"
)

_GAPFILL_SQL = f"""
WITH ev AS (
    SELECT * FROM events WHERE {_GAP_PRED}
), daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM ev GROUP BY 1, 2
), span AS (
    SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
    FROM ev
), days AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
    FROM span
), keys AS (
    SELECT DISTINCT event_type FROM daily
)
SELECT k.event_type, d.day,
       CAST(coalesce(a.n_events, 0) AS BIGINT) AS n_events,
       CAST(coalesce(a.n_users, 0) AS BIGINT) AS n_users,
       a.n_events IS NULL AS is_gap
FROM keys k CROSS JOIN days d
LEFT JOIN daily a ON a.event_type = k.event_type AND a.day = d.day
"""


@query("timeseries_gapfill_daily", _GAPFILL_SQL)
def timeseries_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling: a dense (event_type, day) spine over the
    table's full span with zeroed measures and an explicit is_gap flag
    — the contract every moving-average / day-over-day / z-score
    consumer assumes. Gaps are planted by deterministically excluding
    whole (day, type) cells. The corpus is scanned once; spine and key
    frames are broadcast-sized."""
    from _event_intelligence_data_warehouse_spark.operators import (
        timeseries as tss,
    )

    ev = load(spark, sf_dir, "events").filter(
        F.expr(f"(EXTRACT(day FROM ts) * 31 + length(event_type)) % 11 >= 2")
    )
    return tss.gapfill_daily(ev)


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_CORR_SQL = """
-- Integer-scaled exact arithmetic (see numeric_correlations docstring):
-- inputs x100 rounded to integers, DECIMAL(38,0) sums in HUGEINT; the
-- only roundings are per-value scale-0 casts to double, identical on
-- both engines. corr is invariant under the scaling.
WITH base AS (
    SELECT CAST(round(l_quantity * 100) AS DECIMAL(38,0)) AS l_quantity,
           CAST(round(l_extendedprice * 100) AS DECIMAL(38,0)) AS l_extendedprice,
           CAST(round(l_discount * 100) AS DECIMAL(38,0)) AS l_discount,
           CAST(round(l_tax * 100) AS DECIMAL(38,0)) AS l_tax
    FROM lineitem
    WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      AND l_discount IS NOT NULL AND l_tax IS NOT NULL
), s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           SUM(l_quantity) AS s_q, SUM(l_quantity * l_quantity) AS ss_q,
           SUM(l_extendedprice) AS s_p,
           SUM(l_extendedprice * l_extendedprice) AS ss_p,
           SUM(l_discount) AS s_d, SUM(l_discount * l_discount) AS ss_d,
           SUM(l_tax) AS s_t, SUM(l_tax * l_tax) AS ss_t,
           SUM(l_quantity * l_extendedprice) AS sp_qp,
           SUM(l_quantity * l_discount) AS sp_qd,
           SUM(l_quantity * l_tax) AS sp_qt,
           SUM(l_extendedprice * l_discount) AS sp_pd,
           SUM(l_extendedprice * l_tax) AS sp_pt,
           SUM(l_discount * l_tax) AS sp_dt
    FROM base
), pairs(col_a, col_b, sx, sxx, sy, syy, sxy, n) AS (
    SELECT 'l_quantity', 'l_extendedprice', s_q, ss_q, s_p, ss_p, sp_qp, n FROM s
    UNION ALL SELECT 'l_quantity', 'l_discount', s_q, ss_q, s_d, ss_d, sp_qd, n FROM s
    UNION ALL SELECT 'l_quantity', 'l_tax', s_q, ss_q, s_t, ss_t, sp_qt, n FROM s
    UNION ALL SELECT 'l_extendedprice', 'l_discount', s_p, ss_p, s_d, ss_d, sp_pd, n FROM s
    UNION ALL SELECT 'l_extendedprice', 'l_tax', s_p, ss_p, s_t, ss_t, sp_pt, n FROM s
    UNION ALL SELECT 'l_discount', 'l_tax', s_d, ss_d, s_t, ss_t, sp_dt, n FROM s
)
SELECT col_a, col_b, n AS n_rows,
       CASE WHEN sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) > 0
            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS corr
FROM pairs
"""


@query("stats_numeric_correlations", _CORR_SQL)
def stats_numeric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over lineitem's numeric measures in
    one scan: every accumulated sum is an exact DECIMAL (partition
    order cannot perturb it), only the final corr formula runs in
    double — so both engines produce bit-identical coefficients."""
    li = load(spark, sf_dir, "lineitem")
    return tx.numeric_correlations(li, _CORR_COLS)


# C4 corpus decoration: sentences with terminal punctuation planted on
# most docs, short/unpunctuated/javascript lines planted modularly so
# every rule discriminates — mirrored verbatim in the oracle.
_C4_DOCS_CTE = """
WITH c4docs AS (
    SELECT doc_id,
           'This is a clean first sentence. Another full sentence here.'
           || chr(10) || 'A third sentence with enough words, surely.'
           || chr(10) || 'Sentence four is present. Sentence five too.'
           || CASE WHEN doc_id % 3 = 0
                   THEN chr(10) || 'no terminal punctuation line' ELSE '' END
           || CASE WHEN doc_id % 4 = 0
                   THEN chr(10) || 'Too short.' ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                   THEN chr(10)
                        || 'Please enable Javascript to view comments.' ELSE '' END
           || CASE WHEN doc_id % 7 = 0
                   THEN chr(10) || 'if (x) { return 1; } it said.' ELSE '' END
           || CASE WHEN doc_id % 11 = 0
                   THEN chr(10) || 'Lorem ipsum dolor sit amet, filler.' ELSE '' END
           AS text
    FROM documents
)
"""

_C4_SQL = _C4_DOCS_CTE + """
, lf AS (
    SELECT doc_id,
           string_split(text, chr(10)) AS lines,
           list_filter(string_split(text, chr(10)),
               l -> regexp_matches(rtrim(l), '[.!?"]$')
                    AND len(list_filter(
                            regexp_split_to_array(trim(l), '\\s+'),
                            x -> x != '')) >= 3
                    AND NOT contains(lower(l), 'javascript')) AS kept
    FROM c4docs
), rec AS (
    SELECT doc_id,
           array_to_string(kept, chr(10)) AS clean_text,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(lines) - len(kept) AS BIGINT) AS n_removed
    FROM lf
)
SELECT doc_id, clean_text, n_lines, n_removed,
       contains(clean_text, '{') AS has_brace,
       contains(lower(clean_text), 'lorem ipsum') AS has_lorem,
       CAST(len(regexp_extract_all(clean_text, '[.!?]')) AS BIGINT)
           AS n_sentences,
       (NOT contains(clean_text, '{')
        AND NOT contains(lower(clean_text), 'lorem ipsum')
        AND len(regexp_extract_all(clean_text, '[.!?]')) >= 5)
           AS keep_doc
FROM rec
"""


@query("text_c4_line_filter", _C4_SQL)
def text_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line/page cleaning rules (Raffel et al. 2020 §2.2): terminal
    punctuation, >= 3 words, no javascript warnings per line; brace /
    lorem-ipsum / sentence-count page flags. One shuffle-free pass over
    a corpus decorated so every rule fires (mirrored in the oracle)."""
    docs = load(spark, sf_dir, "documents")
    nl = "\n"
    decorated = docs.select(
        "doc_id",
        F.concat(
            F.lit(
                "This is a clean first sentence. Another full sentence"
                " here.\nA third sentence with enough words, surely."
                "\nSentence four is present. Sentence five too."
            ),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit(nl + "no terminal punctuation line"),
            ).otherwise(""),
            F.when(F.col("doc_id") % 4 == 0, F.lit(nl + "Too short."))
            .otherwise(""),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.lit(nl + "Please enable Javascript to view comments."),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit(nl + "if (x) { return 1; } it said."),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.lit(nl + "Lorem ipsum dolor sit amet, filler."),
            ).otherwise(""),
        ).alias("text"),
    )
    return tx.c4_line_filter(decorated)


_RPQ_RERANK = 10

# Residual IVFADC oracle: IVF cell training + full-corpus assignment
# (shared CTEs), then integer mean centroids (sum div count per cell),
# residual vectors (iv - mc)/1e6 as the PQ training source (the /1e6
# round-trips exactly through _pq_core's x*1e6+0.5 snap on both
# engines), the standard PQ train/encode core over `rvecs`, and serving
# with a per-(query, cell) integer-L2 LUT ranked ascending before the
# exact cosine rerank.
_RPQ_SQL = (
    _IVF_CELLS_CTE
    + """
, r_assign AS (
    SELECT vec_id, cell FROM cell_scores WHERE cell_rank = 1
), r_mc AS (
    SELECT cell, list(CAST(sx // cnt AS BIGINT) ORDER BY pos) AS mcv
    FROM (
        SELECT a.cell, t.pos, CAST(SUM(t.val) AS BIGINT) AS sx,
               COUNT(*) AS cnt
        FROM r_assign a JOIN (
            SELECT vec_id,
                   unnest(generate_series(1, len(iv))) AS pos,
                   unnest(iv) AS val
            FROM ivecs
        ) t USING (vec_id)
        GROUP BY a.cell, t.pos
    )
    GROUP BY cell
), rvecs AS (
    SELECT i.vec_id,
           list_transform(generate_series(1, len(i.iv)),
               j -> (i.iv[j] - m.mcv[j]) / 1000000.0) AS v
    FROM ivecs i
    JOIN r_assign a USING (vec_id)
    JOIN r_mc m USING (cell)
)"""
    + _pq_core("rpq_").replace("FROM vecs", "FROM rvecs")
    + f"""
, rq_probes AS (
    SELECT vec_id AS query_id, cell FROM cell_scores
    WHERE cell_rank <= 2 AND vec_id < 20
), rq_cand AS (
    SELECT p.query_id, p.cell, a.vec_id AS neighbor_id
    FROM r_assign a JOIN rq_probes p USING (cell)
    WHERE p.query_id <> a.vec_id
), rq_qres AS (
    SELECT p.query_id, p.cell,
           list_transform(generate_series(1, len(i.iv)),
               j -> CAST(i.iv[j] - m.mcv[j] AS DOUBLE)) AS qrv
    FROM rq_probes p
    JOIN ivecs i ON i.vec_id = p.query_id
    JOIN r_mc m USING (cell)
), rq_qsub AS (
    SELECT q.query_id, q.cell, s.sub,
           list_slice(q.qrv, s.sub * {_PQ_SUB} + 1,
                      s.sub * {_PQ_SUB} + {_PQ_SUB}) AS qvd
    FROM rq_qres q CROSS JOIN rpq_subs s
), rq_lut AS (
    SELECT q.query_id, q.cell, b.sub, b.code,
           {_pq_l2('q.qvd', 'b.cwd')} AS pl2
    FROM rq_qsub q JOIN rpq_books b USING (sub)
), rq_adc AS (
    SELECT query_id, neighbor_id FROM (
        SELECT cd.query_id, cd.neighbor_id,
               row_number() OVER (
                   PARTITION BY cd.query_id
                   ORDER BY SUM(l.pl2) ASC, cd.neighbor_id
               ) AS adcrk
        FROM rq_cand cd
        JOIN rpq_codes c ON c.vec_id = cd.neighbor_id
        JOIN rq_lut l ON l.query_id = cd.query_id AND l.cell = cd.cell
                     AND l.sub = c.sub AND l.code = c.code
        GROUP BY cd.query_id, cd.neighbor_id
    ) WHERE adcrk <= {_RPQ_RERANK}
), rq_rescored AS (
    SELECT a.query_id, a.neighbor_id,
           list_dot_product(q.v, n.v)
             / (sqrt(list_dot_product(q.v, q.v))
                * sqrt(list_dot_product(n.v, n.v))) AS sim
    FROM rq_adc a
    JOIN vecs q ON q.vec_id = a.query_id
    JOIN vecs n ON n.vec_id = a.neighbor_id
)
SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rank
    FROM rq_rescored
) WHERE rank <= 5
"""
)


@query("similarity_ivfpq_residual_topk", _RPQ_SQL)
def similarity_ivfpq_residual_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """True IVFADC (Jégou et al. 2011): PQ over RESIDUALS x - mean(cell)
    — the Faiss IVFxPQ(residual) configuration; squared-L2 residual ADC
    (cross-cell consistent by construction) prunes to 10 candidates,
    exact cosine reranks. The oracle replays cell training, the
    full-corpus assignment, integer mean centroids, residual codebook
    training, encode, the per-(query, cell) LUT probe and the rerank
    end to end."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ivf_pq_residual_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=5,
        n_cells=_IVF_N_CELLS, nprobe=2,
        m=_PQ_M, n_codes=_PQ_CODES, max_train=_PQ_TRAIN,
        rerank=_RPQ_RERANK,
    )


_KMV_HV = (
    "CAST(('0x' || substr(md5(CAST(o_custkey AS STRING)), 1, 15))"
    " AS BIGINT)"
)
_KMV_EST = (
    "CASE WHEN {p}_cnt < 64 THEN CAST({p}_cnt AS BIGINT)"
    "     ELSE CAST(CAST(63 AS HUGEINT) * 1152921504606846976"
    "               // {p}_kth AS BIGINT) END"
)


@query(
    "sketch_kmv_set_ops",
    f"""
    WITH da AS (
        SELECT DISTINCT {_KMV_HV} AS hv FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    ), db AS (
        SELECT DISTINCT {_KMV_HV} AS hv FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    ), ka AS (
        SELECT hv FROM (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
                        FROM da) WHERE rn <= 64
    ), kb AS (
        SELECT hv FROM (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
                        FROM db) WHERE rn <= 64
    ), ku AS (
        SELECT hv FROM (
            SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
            FROM (SELECT hv FROM ka UNION SELECT hv FROM kb)
        ) WHERE rn <= 64
    ), stats AS (
        SELECT (SELECT COUNT(*) FROM ka) AS a_cnt,
               (SELECT MAX(hv) FROM ka) AS a_kth,
               (SELECT COUNT(*) FROM kb) AS b_cnt,
               (SELECT MAX(hv) FROM kb) AS b_kth,
               (SELECT COUNT(*) FROM ku) AS u_cnt,
               (SELECT MAX(hv) FROM ku) AS u_kth,
               (SELECT COUNT(*) FROM ku
                WHERE hv IN (SELECT hv FROM ka)
                  AND hv IN (SELECT hv FROM kb)) AS c_both,
               (SELECT COUNT(*) FROM da) AS ex_a,
               (SELECT COUNT(*) FROM db) AS ex_b,
               (SELECT COUNT(*) FROM
                  (SELECT hv FROM da UNION SELECT hv FROM db)) AS ex_u,
               (SELECT COUNT(*) FROM da
                WHERE hv IN (SELECT hv FROM db)) AS ex_i
        FROM (SELECT 1)
    ), ests AS (
        SELECT {_KMV_EST.format(p='a')} AS est_a,
               {_KMV_EST.format(p='b')} AS est_b,
               {_KMV_EST.format(p='u')} AS est_u,
               c_both, ex_a, ex_b, ex_u, ex_i
        FROM stats
    )
    SELECT 'cohort_h1' AS measure, est_a AS kmv_estimate,
           CAST(ex_a AS BIGINT) AS exact_value FROM ests
    UNION ALL
    SELECT 'cohort_h2', est_b, CAST(ex_b AS BIGINT) FROM ests
    UNION ALL
    SELECT 'union', est_u, CAST(ex_u AS BIGINT) FROM ests
    UNION ALL
    SELECT 'intersection',
           CAST(CAST(c_both AS HUGEINT) * est_u // 64 AS BIGINT),
           CAST(ex_i AS BIGINT) FROM ests
    UNION ALL
    SELECT 'jaccard_ppm',
           CAST(CAST(c_both AS HUGEINT) * 1000000 // 64 AS BIGINT),
           CAST(CAST(ex_i AS HUGEINT) * 1000000 // ex_u AS BIGINT)
    FROM ests
    """,
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values (bottom-k) sketch set algebra [Beyer et al.
    2007] over two half-year buyer cohorts: cardinality estimates for
    each cohort, their union (merged sketches), their intersection and
    Jaccard (overlap of the union's bottom-k with both input sketches)
    — the set operations HLL registers cannot answer — each next to the
    exact answer so the estimate quality is part of the contract.

    All register math is exact integers (60-bit md5 hashes; the
    (k-1)*2^60/kth estimator runs in DECIMAL(38,0)/HUGEINT floor
    division), so both engines compute bit-identical sketches, not just
    close estimates.

    100 TB: each sketch is a two-level tournament (per-salt bottom-k in
    parallel, final bottom-k over <= 16*64 survivors — see
    operators/sketches.py:kmv_sketch), so no task ever sorts the full
    distinct-key stream; merge/estimate work is O(k), constant in the
    data. The exact audit columns are one distinct-aggregate each and
    exist for the contract, not the production path.
    """
    from _event_intelligence_data_warehouse_spark.operators import (
        sketches as sk,
    )

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    h1 = o.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    h2 = o.where(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")

    from _event_intelligence_data_warehouse_spark import cache

    # session-owned persists (released by the harness via
    # cache.release_all — a bare .persist() would leak in a long
    # session, the round-1 ADVICE bug class)
    ka = cache.persist(sk.kmv_sketch(h1, "o_custkey"))
    kb = cache.persist(sk.kmv_sketch(h2, "o_custkey"))
    ku = cache.persist(sk.kmv_merge(ka, kb))

    c_both = (
        ku.join(ka, "hv", "left_semi")
        .join(kb, "hv", "left_semi")
        .agg(F.count(F.lit(1)).alias("c_both"))
    )
    # Exact audit side: distinct hashes reuse the same hash family so
    # union/intersection counts agree with the sketch domain exactly.
    da = h1.select(sk._hash60(F.col("o_custkey")).alias("hv")).distinct()
    db = h2.select(sk._hash60(F.col("o_custkey")).alias("hv")).distinct()
    exacts = (
        da.agg(F.count(F.lit(1)).alias("ex_a"))
        .crossJoin(F.broadcast(db.agg(F.count(F.lit(1)).alias("ex_b"))))
        .crossJoin(
            F.broadcast(
                da.unionByName(db)
                .distinct()
                .agg(F.count(F.lit(1)).alias("ex_u"))
            )
        )
        .crossJoin(
            F.broadcast(
                da.join(db, "hv", "left_semi").agg(
                    F.count(F.lit(1)).alias("ex_i")
                )
            )
        )
    )
    stats = (
        sk.kmv_stats(ka, "a")
        .crossJoin(F.broadcast(sk.kmv_stats(kb, "b")))
        .crossJoin(F.broadcast(sk.kmv_stats(ku, "u")))
        .crossJoin(F.broadcast(c_both))
        .crossJoin(F.broadcast(exacts))
    )
    ests = stats.select(
        sk.kmv_estimate_expr("a_cnt", "a_kth").alias("est_a"),
        sk.kmv_estimate_expr("b_cnt", "b_kth").alias("est_b"),
        sk.kmv_estimate_expr("u_cnt", "u_kth").alias("est_u"),
        "c_both", "ex_a", "ex_b", "ex_u", "ex_i",
    )
    return ests.select(
        F.expr(
            "stack(5,"
            " 'cohort_h1', est_a, CAST(ex_a AS BIGINT),"
            " 'cohort_h2', est_b, CAST(ex_b AS BIGINT),"
            " 'union', est_u, CAST(ex_u AS BIGINT),"
            " 'intersection',"
            " CAST(CAST(c_both AS DECIMAL(38,0)) * est_u div 64 AS BIGINT),"
            " CAST(ex_i AS BIGINT),"
            " 'jaccard_ppm',"
            " CAST(CAST(c_both AS DECIMAL(38,0)) * 1000000 div 64 AS BIGINT),"
            " CAST(CAST(ex_i AS DECIMAL(38,0)) * 1000000 div ex_u AS BIGINT))"
            " AS (measure, kmv_estimate, exact_value)"
        )
    )


# Gap planting for the interpolation query: a deterministic per-(type,
# day-of-month) predicate removes whole daily cells, mirrored verbatim
# in the oracle — different modulus from _GAP_PRED so this family
# exercises interior gaps rather than near-dense data.
_LERP_KEEP = "(EXTRACT(day FROM ts) * 31 + length(event_type)) % 7 < 5"

_LERP_SQL = f"""
WITH ev AS (
    SELECT * FROM events WHERE {_LERP_KEEP}
), daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           SUM(CAST(floor(value * 100 + 0.5) AS BIGINT))
               AS value_c
    FROM ev GROUP BY 1, 2
), span AS (
    SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
    FROM ev
), days AS (
    SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
    FROM span
), spine AS (
    SELECT k.event_type, d.day, a.value_c
    FROM (SELECT DISTINCT event_type FROM daily) k
    CROSS JOIN days d
    LEFT JOIN daily a ON a.event_type = k.event_type AND a.day = d.day
), anchored AS (
    SELECT event_type, day, value_c,
           LAST_VALUE(value_c IGNORE NULLS) OVER w_prev AS prev_v,
           LAST_VALUE(CASE WHEN value_c IS NOT NULL THEN day END
                      IGNORE NULLS) OVER w_prev AS prev_d,
           FIRST_VALUE(value_c IGNORE NULLS) OVER w_next AS next_v,
           FIRST_VALUE(CASE WHEN value_c IS NOT NULL THEN day END
                       IGNORE NULLS) OVER w_next AS next_d
    FROM spine
    WINDOW w_prev AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_next AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, day,
       CAST(CASE WHEN value_c IS NOT NULL THEN value_c
                 ELSE prev_v + (next_v - prev_v)
                      * DATE_DIFF('day', prev_d, day)
                      // DATE_DIFF('day', prev_d, next_d) END
            AS BIGINT) AS value_c,
       value_c IS NULL AS interpolated
FROM anchored
WHERE value_c IS NOT NULL OR (prev_v IS NOT NULL AND next_v IS NOT NULL)
"""


@query("timeseries_interpolate_linear", _LERP_SQL)
def timeseries_interpolate_linear(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear interpolation over interior gaps in a daily value series
    per event type: missing days between two anchors get
    v0 + (v1-v0)*(d-d0) div (d1-d0) in exact integer cents — signed
    integer division truncates toward zero identically on Spark (div)
    and DuckDB (//), so downward slopes are bit-portable too. Days
    before the first / after the last anchor are dropped (no
    extrapolation), matching the oracle's WHERE.

    Complements timeseries_gapfill_daily (zero-fill) with the
    anchor-pair mechanism: prev/next value AND day via
    last/first_value(IGNORE NULLS) over mirrored unbounded frames.

    100 TB: windows partition by event_type, and each per-type frame is
    calendar-bounded (days, not events) — the heavy reduction happened
    in the combinable daily aggregate, so window state stays O(span)
    per type regardless of event volume.
    """
    e = load(spark, sf_dir, "events").where(F.expr(_LERP_KEEP))
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")
        ).alias("value_c")
    )
    span = e.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    days = span.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    keys = daily.select("event_type").distinct()
    spine = keys.crossJoin(F.broadcast(days)).join(
        daily, ["event_type", "day"], "left"
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    anchor_day = F.when(F.col("value_c").isNotNull(), F.col("day"))
    anchored = spine.select(
        "event_type",
        "day",
        "value_c",
        F.last("value_c", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.last(anchor_day, ignorenulls=True).over(w_prev).alias("prev_d"),
        F.first("value_c", ignorenulls=True).over(w_next).alias("next_v"),
        F.first(anchor_day, ignorenulls=True).over(w_next).alias("next_d"),
    )
    lerp = F.col("prev_v") + F.expr(
        "CAST((next_v - prev_v) * datediff(day, prev_d)"
        " div datediff(next_d, prev_d) AS BIGINT)"
    )
    return anchored.where(
        F.col("value_c").isNotNull()
        | (F.col("prev_v").isNotNull() & F.col("next_v").isNotNull())
    ).select(
        "event_type",
        "day",
        F.when(F.col("value_c").isNotNull(), F.col("value_c"))
        .otherwise(lerp)
        .alias("value_c"),
        F.col("value_c").isNull().alias("interpolated"),
    )


# Incremental IVF serving split (mirror of dedup_semantic_incremental):
# the 90% corpus (vec_id % 10 != 0) trained the stored quantizer and
# assignment; the 10% batch is merged by frozen-centroid assignment
# only. Queries are batch members — new data served immediately against
# the merged index, neighbors drawn from corpus AND batch.
_IVF_INCR_CORPUS_SRC = (
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
    " FROM embeddings WHERE vec_id % 10 != 0"
)


@query(
    "similarity_ivf_incremental",
    _ivf_train_cte(_IVF_INCR_CORPUS_SRC)
    + f"""
, allv AS (
    SELECT * FROM vecs
    UNION ALL
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
    FROM embeddings WHERE vec_id % 10 = 0
), cell_scores AS (
    SELECT x.vec_id, c.cell,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_dot_product(x.v, c.centroid)
                                    / (sqrt(list_dot_product(x.v, x.v))
                                       * sqrt(list_dot_product(c.centroid,
                                              c.centroid))) DESC,
                              c.cell) AS cell_rank
    FROM allv x CROSS JOIN cents c
), assign AS (
    SELECT vec_id AS neighbor_id, cell FROM cell_scores
    WHERE cell_rank = 1
), probes AS (
    SELECT vec_id AS query_id, cell FROM cell_scores
    WHERE cell_rank <= 2 AND vec_id % 10 = 0 AND vec_id < 200
), cand AS (
    SELECT DISTINCT p.query_id, a.neighbor_id
    FROM assign a JOIN probes p USING (cell)
    WHERE p.query_id <> a.neighbor_id
), scored AS (
    SELECT c.query_id, c.neighbor_id, {_COS} AS sim
    FROM cand c
    JOIN (SELECT vec_id, v AS cv FROM allv) nv ON nv.vec_id = c.neighbor_id
    JOIN (SELECT vec_id, v AS qv FROM allv) qv ON qv.vec_id = c.query_id
)
SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rank
    FROM scored
) WHERE rank <= 5
""",
)
def similarity_ivf_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Steady-state IVF serving: the stored index (centroids +
    assignment, trained on the 90% corpus only) absorbs a new batch via
    frozen-centroid assignment (similarity.py::ivf_index_merge — one
    broadcast pass over the increment, no retraining), then batch
    queries probe the MERGED index, finding corpus and same-batch
    neighbors alike. The oracle trains on the corpus slice, assigns
    everything against those centroids, and serves identically — so
    "merge-then-serve equals rebuild-under-frozen-quantizer" is the
    checked contract, the invariant that makes incremental ANN
    maintenance safe.

    100 TB: batch cost is centroid-broadcast assignment over the
    increment; the serve path inherits ivf_topk_prebuilt's cell
    equi-join (~nprobe/n_cells of brute force per query)."""
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    centroids, assign = sim.ivf_index(
        corpus, n_cells=_IVF_N_CELLS, max_train=_IVF_MAX_TRAIN
    )
    merged_assign = sim.ivf_index_merge(centroids, assign, batch)
    merged_corpus = corpus.unionByName(batch)
    queries = batch.filter(F.col("vec_id") < 200)
    return sim.ivf_topk_prebuilt(
        centroids, merged_assign, merged_corpus, queries, k=5, nprobe=2
    )


# Bloom-prefiltered incremental dedup split: 90% of documents
# (doc_id % 10 != 0) are the stored corpus; the batch is the
# doc_id % 10 == 0 slice plus exact copies (+1000000) of every 7th
# stored doc — planted batch-vs-corpus duplicates. The Bloom gate is an
# INTERMEDIATE: no false negatives, and false positives are removed by
# the exact verify join, so the final disposition equals the pure-exact
# computation the oracle runs.
_BLOOM_INCR_SQL = """
WITH corpus AS (
    SELECT doc_id, md5(text) AS dg FROM documents WHERE doc_id % 10 != 0
), batch AS (
    SELECT doc_id, md5(text) AS dg FROM documents WHERE doc_id % 10 = 0
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, md5(text) AS dg
    FROM documents WHERE doc_id % 10 != 0 AND doc_id % 7 = 0
), marked AS (
    SELECT b.doc_id, b.dg,
           b.dg IN (SELECT dg FROM corpus) AS vs_corpus,
           MIN(b.doc_id) OVER (PARTITION BY b.dg) AS first_in_batch
    FROM batch b
)
SELECT doc_id,
       CASE WHEN vs_corpus THEN 'dup_vs_corpus'
            WHEN doc_id > first_in_batch THEN 'dup_in_batch'
            ELSE 'new' END AS disposition
FROM marked
"""


@query("dedup_bloom_prefilter_incremental", _BLOOM_INCR_SQL)
def dedup_bloom_prefilter_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Steady-state landing dedup with a Bloom pre-filter: the stored
    corpus digests compile into a broadcast Bloom filter
    (sketches.py::bloom_build); only batch rows the filter says MAYBE
    exist pay the exact corpus semi-join — definite absences skip it
    entirely. No false negatives means no missed duplicate; false
    positives die in the verify join; so the disposition (new /
    dup_vs_corpus / dup_in_batch, first-id-wins within the batch) is
    EXACT and the oracle computes it with plain set logic.

    100 TB: the corpus-sized anti-join — the steady-state cost center
    of landing dedup — shrinks to the maybe-present slice (true-dup
    rate + false-positive rate of the batch). The filter is m=2^16
    bits here; production sizes m to the stored-corpus cardinality
    (~10 bits/key for 1% fp) or shards it by digest prefix, and the
    verify join keeps correctness independent of that tuning. The
    in-batch dedup is a per-digest window over the (small) batch.
    """
    from _event_intelligence_data_warehouse_spark.operators import (
        sketches as sk,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 10 != 0).select(
        "doc_id", F.md5("text").alias("dg")
    )
    batch = (
        docs.where(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
        .unionByName(
            docs.where(
                (F.col("doc_id") % 10 != 0) & (F.col("doc_id") % 7 == 0)
            ).select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        )
        .select("doc_id", F.md5("text").alias("dg"))
    )
    bloom = sk.bloom_build(corpus, "dg")
    probed = sk.bloom_probe(batch, "dg", bloom, id_col="doc_id")
    batch_p = batch.join(probed, "doc_id")
    maybe = batch_p.where(F.col("maybe_present") == 1)
    # exact verify ONLY for maybe-present rows; definite absences never
    # touch the corpus
    confirmed = maybe.join(
        corpus.select("dg").distinct(), "dg", "left_semi"
    ).select("doc_id")
    w = Window.partitionBy("dg")
    first_in_batch = batch_p.withColumn(
        "first_in_batch", F.min("doc_id").over(w)
    )
    return (
        first_in_batch.join(
            confirmed.withColumn("_vs_corpus", F.lit(True)),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.when(F.col("_vs_corpus"), "dup_vs_corpus")
            .when(F.col("doc_id") > F.col("first_in_batch"), "dup_in_batch")
            .otherwise("new")
            .alias("disposition"),
        )
    )


_RAKE_STOPS_SQL = ", ".join(f"'{w}'" for w in tx.ENGLISH_STOPWORDS)

_RAKE_SQL = f"""
WITH src AS (
    SELECT doc_id AS _doc,
           regexp_split_to_array(lower(text), '[^a-z]+') AS t
    FROM documents WHERE lang = 'en'
), toks AS (
    SELECT _doc,
           unnest(generate_series(1, len(t))) - 1 AS pos,
           unnest(t) AS tok
    FROM src
), nonstop AS (
    SELECT _doc, pos, tok,
           pos - ROW_NUMBER() OVER (PARTITION BY _doc ORDER BY pos)
               AS island
    FROM toks
    WHERE tok <> '' AND tok NOT IN ({_RAKE_STOPS_SQL})
), phrases AS (
    SELECT _doc, island,
           string_agg(tok, ' ' ORDER BY pos) AS phrase,
           COUNT(*) AS phrase_len
    FROM nonstop GROUP BY 1, 2
), instances AS (
    SELECT n._doc, n.island, n.tok, p.phrase_len
    FROM nonstop n JOIN phrases p USING (_doc, island)
), words AS (
    SELECT tok,
           CAST(SUM(CAST(phrase_len AS HUGEINT)) * 1000000
                // COUNT(*) AS BIGINT) AS word_ppm
    FROM instances GROUP BY 1
), scored AS (
    SELECT i._doc, i.island, SUM(w.word_ppm) AS score_ppm
    FROM instances i JOIN words w USING (tok)
    GROUP BY 1, 2
)
SELECT p.phrase,
       CAST(MAX(s.score_ppm) AS BIGINT) AS score_ppm,
       CAST(MAX(p.phrase_len) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM scored s JOIN phrases p USING (_doc, island)
GROUP BY p.phrase
ORDER BY score_ppm DESC, phrase
LIMIT 20
"""


@query("text_rake_keyphrases", _RAKE_SQL)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction over the English documents
    (operators/text.py::rake_keyphrases): top-20 stopword-delimited
    phrases by summed degree/freq word scores, integer-ppm quantized so
    the ranking is engine-exact. Completes the term-importance family
    (tf-idf: per-doc terms; chi2: per-source discriminative terms;
    PMI: collocation pairs; BM25: query relevance) with multi-word
    unit extraction."""
    d = load(spark, sf_dir, "documents").where(F.col("lang") == "en")
    return tx.rake_keyphrases(d, text_col="text", id_col="doc_id", top_k=20)


_MMR_IVEC = (
    "list_transform(CAST(embedding AS DOUBLE[]),"
    " x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))"
)

_MMR_SQL = f"""
WITH RECURSIVE iv AS (
    SELECT vec_id, {_MMR_IVEC} AS v FROM embeddings
), qv AS (
    SELECT vec_id AS query_id, v AS q FROM iv WHERE vec_id < 20
), relall AS (
    SELECT q.query_id, c.vec_id AS cand,
           CAST(list_sum(list_transform(
               generate_series(1, len(c.v)),
               i -> c.v[i] * q.q[i])) AS BIGINT) AS rel
    FROM iv c CROSS JOIN qv q
    WHERE c.vec_id <> q.query_id
), relc AS (
    SELECT query_id, cand, rel FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, cand) AS rn
        FROM relall
    ) WHERE rn <= 10
), pairs AS (
    SELECT a.query_id, a.cand AS a, b.cand AS b,
           CAST(list_sum(list_transform(
               generate_series(1, len(va.v)),
               i -> va.v[i] * vb.v[i])) AS BIGINT) AS sim
    FROM relc a
    JOIN relc b ON a.query_id = b.query_id AND a.cand <> b.cand
    JOIN iv va ON va.vec_id = a.cand
    JOIN iv vb ON vb.vec_id = b.cand
), sel AS (
    -- arg_max takes one scalar key: pack (score desc, cand asc) as
    -- score*1e7 - cand in HUGEINT (cand << 1e7)
    SELECT query_id, 1 AS step,
           [arg_max(cand, CAST(rel AS HUGEINT) * 10000000 - cand)]
               AS picks
    FROM relc GROUP BY query_id
    UNION ALL
    SELECT query_id, step + 1,
           list_append(picks,
               arg_max(cand, CAST(score AS HUGEINT) * 10000000 - cand))
    FROM (
        SELECT s.query_id, s.step, s.picks, c.cand,
               7 * c.rel - 3 * MAX(p.sim) AS score
        FROM sel s
        JOIN relc c ON c.query_id = s.query_id
                   AND NOT list_contains(s.picks, c.cand)
        JOIN pairs p ON p.query_id = s.query_id AND p.a = c.cand
                    AND list_contains(s.picks, p.b)
        WHERE s.step < 5
        GROUP BY s.query_id, s.step, s.picks, c.cand, c.rel
    )
    GROUP BY query_id, step, picks
)
SELECT query_id,
       unnest(picks) AS neighbor_id,
       unnest(generate_series(1, len(picks))) AS mmr_rank
FROM sel WHERE step = 5
"""


@query("similarity_mmr_rerank", _MMR_SQL)
def similarity_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified retrieval (similarity.py::mmr_rerank): 20 query
    vectors each fetch 10 exact inner-product candidates, then a
    lambda=0.7 greedy picks 5 that trade relevance against redundancy
    — the re-rank step a curation pipeline uses so near-identical
    documents don't crowd a retrieval slate. Every quantity is an
    exact integer inner product of micro-unit vectors, so the greedy
    trajectory (not just the final set) is engine-reproducible; the
    oracle replays it with a recursive CTE carrying the picked list.
    """
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return sim.mmr_rerank(
        emb, emb.filter(F.col("vec_id") < 20),
        k_candidates=10, k_select=5,
    )


@query(
    "embedding_covariance_exact",
    """
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)
                             AS BIGINT)) AS qv
        FROM embeddings
    ), flat AS (
        SELECT vec_id, pos, qv[pos] AS qx FROM (
            SELECT vec_id, qv,
                   unnest(generate_series(1, len(qv))) AS pos
            FROM q
        )
    ), spp AS (
        SELECT a.pos - 1 AS dim_i, b.pos - 1 AS dim_j,
               COUNT(*) AS n, CAST(SUM(a.qx * b.qx) AS HUGEINT) AS sxy
        FROM flat a JOIN flat b
          ON a.vec_id = b.vec_id AND a.pos <= b.pos
        GROUP BY 1, 2
    ), ds AS (
        SELECT pos - 1 AS dim, CAST(SUM(qx) AS HUGEINT) AS s
        FROM flat GROUP BY 1
    )
    SELECT CAST(p.dim_i AS BIGINT) AS dim_i,
           CAST(p.dim_j AS BIGINT) AS dim_j,
           CAST(p.n AS BIGINT) AS n_vectors,
           CAST(p.n * p.sxy - di.s * dj.s AS BIGINT) AS cov_num
    FROM spp p
    JOIN ds di ON di.dim = p.dim_i
    JOIN ds dj ON dj.dim = p.dim_j
    """,
)
def embedding_covariance_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact integer covariance numerators over the embedding
    dimensions' upper triangle — the bounded d x d model PCA
    eigendecomposes (operators/similarity.py::pca_model; the
    projection itself is pytest-pinned since eigensolving is not
    SQL-expressible). Spark generates the per-row upper-triangle
    products inside the array, so the only shuffle is the
    d(d+1)/2-group aggregate with map-side combine; the oracle
    recomputes it with a flat self-join."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.covariance_pairs(emb, scale=1_000)


_PHRASES = ["scan slow fast", "query big"]


def _phrase_sql(phrases: list[str]) -> str:
    """Positional-adjacency phrase oracle: the postings CTE is
    MATERIALIZED (each phrase references it once per term; inlined it
    would re-tokenize the corpus that many times)."""
    parts = [f"""
    WITH posts AS MATERIALIZED (
        SELECT doc_id, pos - 1 AS pos, tk[pos] AS term FROM (
            SELECT doc_id, tk,
                   unnest(generate_series(1, len(tk))) AS pos
            FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)
        )
    )"""]
    selects = []
    for ph in phrases:
        terms = ph.split()
        frm = "posts t0"
        conds = [f"t0.term = '{terms[0]}'"]
        for i, t in enumerate(terms[1:], 1):
            frm += (
                f" JOIN posts t{i} ON t{i}.doc_id = t0.doc_id"
                f" AND t{i}.pos = t0.pos + {i}"
            )
            conds.append(f"t{i}.term = '{t}'")
        selects.append(f"""
    SELECT '{ph}' AS phrase, t0.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(t0.pos) AS BIGINT) AS first_pos
    FROM {frm} WHERE {" AND ".join(conds)}
    GROUP BY t0.doc_id""")
    return parts[0] + " UNION ALL ".join(selects)


@query("text_phrase_search", _phrase_sql(_PHRASES))
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-word phrase retrieval via positional-postings
    adjacency joins (operators/text.py::phrase_search) — the IR
    primitive BM25 cannot express (bag-of-words scoring finds the
    TERMS; this finds them ADJACENT, in order). Work is bounded by the
    query terms' posting lists, never the corpus text."""
    docs = load(spark, sf_dir, "documents")
    return tx.phrase_search(docs, _PHRASES)


_PROX_A, _PROX_B, _PROX_W = "spark", "merge", 3


@query(
    "text_proximity_search",
    f"""
    WITH posts AS MATERIALIZED (
        SELECT doc_id, pos - 1 AS pos, tk[pos] AS term FROM (
            SELECT doc_id, tk,
                   unnest(generate_series(1, len(tk))) AS pos
            FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)
        )
    )
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_cooccurrences,
           CAST(MIN(ABS(a.pos - b.pos)) AS BIGINT) AS min_distance
    FROM posts a JOIN posts b
      ON b.doc_id = a.doc_id AND ABS(a.pos - b.pos) <= {_PROX_W}
    WHERE a.term = '{_PROX_A}' AND b.term = '{_PROX_B}'
    GROUP BY a.doc_id
    """,
)
def text_proximity_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity retrieval ('{a} NEAR/{w} {b}'): co-occurrence within a
    token window via a banded range join over the two terms' posting
    lists (operators/text.py::proximity_search) — between bag-of-words
    relevance (any distance) and exact phrase adjacency (distance 1)."""
    docs = load(spark, sf_dir, "documents")
    return tx.proximity_search(docs, _PROX_A, _PROX_B, window=_PROX_W)


_JSZ_HV = (
    "CAST(('0x' || substr(md5(CAST(l_partkey AS STRING)), 1, 15))"
    " AS BIGINT)"
)


@query(
    "sketch_join_size_estimate",
    f"""
    WITH la AS (
        SELECT l_partkey FROM lineitem WHERE l_quantity >= 25
    ), lb AS (
        SELECT l_partkey FROM lineitem WHERE l_quantity < 25
    ), da AS (SELECT DISTINCT {_JSZ_HV} AS hv FROM la),
    db AS (SELECT DISTINCT {_JSZ_HV} AS hv FROM lb),
    ka AS (SELECT hv FROM (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv)
                           AS rn FROM da) WHERE rn <= 64),
    kb AS (SELECT hv FROM (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv)
                           AS rn FROM db) WHERE rn <= 64),
    ku AS (SELECT hv FROM (
               SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
               FROM (SELECT hv FROM ka UNION SELECT hv FROM kb)
           ) WHERE rn <= 64),
    common AS (
        SELECT hv FROM ku
        WHERE hv IN (SELECT hv FROM ka) AND hv IN (SELECT hv FROM kb)
    ),
    ca AS (SELECT {_JSZ_HV} AS hv, CAST(COUNT(*) AS BIGINT) AS ma
           FROM la GROUP BY l_partkey),
    cb AS (SELECT {_JSZ_HV} AS hv, CAST(COUNT(*) AS BIGINT) AS mb
           FROM lb GROUP BY l_partkey),
    samp AS (
        SELECT c.hv, ca.ma, cb.mb
        FROM common c JOIN ca USING (hv) JOIN cb USING (hv)
    ),
    st AS (
        SELECT (SELECT COUNT(*) FROM samp) AS c_both,
               (SELECT coalesce(SUM(CAST(ma AS HUGEINT) * mb),
                                CAST(0 AS HUGEINT)) FROM samp)
                   AS sum_prod,
               (SELECT COUNT(*) FROM ku) AS u_cnt,
               (SELECT MAX(hv) FROM ku) AS u_kth
        FROM (SELECT 1)
    ),
    est AS (
        -- divisor = registers actually in the union sketch (u_cnt in
        -- the sub-k regime, where the sketch IS the key set)
        SELECT c_both, sum_prod,
               CAST(c_both AS HUGEINT)
                 * (CASE WHEN u_cnt < 64 THEN CAST(u_cnt AS HUGEINT)
                         ELSE CAST(63 AS HUGEINT) * 1152921504606846976
                              // u_kth END)
                 // least(64, greatest(u_cnt, 1)) AS est_common
        FROM st
    ),
    exacts AS (
        SELECT (SELECT COUNT(*) FROM (
                    SELECT DISTINCT l_partkey FROM la
                    INTERSECT SELECT DISTINCT l_partkey FROM lb
                )) AS ex_common,
               (SELECT coalesce(SUM(CAST(x.ma AS HUGEINT) * y.mb),
                                CAST(0 AS HUGEINT))
                FROM (SELECT l_partkey, COUNT(*) AS ma FROM la
                      GROUP BY 1) x
                JOIN (SELECT l_partkey, COUNT(*) AS mb FROM lb
                      GROUP BY 1) y USING (l_partkey)) AS ex_join
        FROM (SELECT 1)
    )
    SELECT 'common_keys' AS measure,
           CAST(est_common AS BIGINT) AS kmv_estimate,
           CAST(ex_common AS BIGINT) AS exact_value
    FROM est CROSS JOIN exacts
    UNION ALL
    SELECT 'join_rows',
           CAST(CASE WHEN c_both = 0 THEN 0
                     ELSE est_common * sum_prod // c_both END AS BIGINT),
           CAST(ex_join AS BIGINT)
    FROM est CROSS JOIN exacts
    """,
)
def sketch_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-execution equi-join cardinality estimation from KMV
    synopses (operators/sketches.py::kmv_join_size_estimate) — the
    optimizer statistic behind build-side choice and broadcast
    thresholds, here predicting |bulk lineitems join non-bulk
    lineitems on l_partkey| from two 64-register sketches plus the
    sampled keys' multiplicity products, with the exact answer
    alongside so estimate quality is part of the contract. Everything
    is integer-exact on the deterministic hash family: both engines
    produce bit-identical estimates."""
    from _event_intelligence_data_warehouse_spark.operators import (
        sketches as sk,
    )

    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    a = li.filter(F.col("l_quantity") >= 25).select("l_partkey")
    b = li.filter(F.col("l_quantity") < 25).select("l_partkey")
    est = sk.kmv_join_size_estimate(a, b, "l_partkey")
    ca = a.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("ma"))
    cb = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("mb"))
    ex = ca.join(cb, "l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("ex_common"),
        F.coalesce(
            F.sum(F.col("ma").cast("decimal(38,0)") * F.col("mb")),
            F.lit(0).cast("decimal(38,0)"),
        ).cast("bigint").alias("ex_join"),
    )
    # One lineage pass: a union of two selects over the same one-row
    # frame would re-run the whole estimator AND the exact audit twice.
    one = est.crossJoin(ex)
    return one.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("common_keys").alias("measure"),
                    F.col("est_common_keys").alias("kmv_estimate"),
                    F.col("ex_common").alias("exact_value"),
                ),
                F.struct(
                    F.lit("join_rows").alias("measure"),
                    F.col("est_join_rows").alias("kmv_estimate"),
                    F.col("ex_join").alias("exact_value"),
                ),
            )
        ).alias("r")
    ).select("r.*")


@query(
    "multimodal_audio_vad",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 63)) AS i),
    chunks AS (
        SELECT i, unnest(generate_series(0, 8 + i % 5 - 1)) AS k
        FROM ids
    ), hx AS (
        SELECT i, k,
               md5('audio' || CAST(i AS VARCHAR) || ':'
                   || CAST(k AS VARCHAR)) AS h
        FROM chunks
    ), bytes AS (
        SELECT i, k,
               CAST(('0x' || substr(h, 2 * js.j + 1, 2)) AS INTEGER)
                   AS byte
        FROM hx CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) js
    ), fr AS (
        SELECT i AS media_id, CAST(k AS BIGINT) AS frame_no,
               CAST(SUM((byte - 128) * (byte - 128)) AS BIGINT) AS energy
        FROM bytes GROUP BY 1, 2
    ), act AS (
        SELECT media_id, frame_no, energy,
               frame_no - row_number() OVER (
                   PARTITION BY media_id ORDER BY frame_no) AS grp
        FROM fr WHERE energy > 87000
    )
    SELECT CAST(media_id AS BIGINT) AS media_id,
           CAST(MIN(frame_no) AS BIGINT) AS seg_start,
           CAST(MAX(frame_no) AS BIGINT) AS seg_end,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(energy) AS BIGINT) AS energy_sum
    FROM act GROUP BY media_id, grp
    """,
)
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-threshold voice-activity detection over audio payloads:
    Arrow-batched numpy frames each recording's bytes into exact int64
    frame energies (operators/multimodal.py::audio_frame_energies),
    then gaps-and-islands collapses active frames into maximal
    segments — the standard speech-curation primitive (silence/music
    trimming before ASR or audio-text alignment). The synthetic corpus
    is NON-periodic (per-chunk md5 digests, synthetic_audio) so frame
    energies genuinely vary; the oracle reconstructs the identical
    bytes from the same md5 hex and mirrors the island construction —
    the whole mapInPandas + window pipeline is hash-checked, not
    rows-only. 100 TB: per-media frames co-locate under one window
    partition; no self-joins; threshold logic is pure column algebra."""
    from _event_intelligence_data_warehouse_spark.operators import (
        multimodal as mm,
    )

    audio = mm.synthetic_audio(spark, 64)
    frames = mm.audio_frame_energies(audio, frame_bytes=16)
    return mm.vad_segments(frames, threshold=87000)


@query(
    "similarity_ivf_range_search",
    _IVF_CELLS_CTE
    + f"""
, assign AS (
    SELECT vec_id AS neighbor_id, cell FROM cell_scores WHERE cell_rank = 1
), probes AS (
    SELECT vec_id AS query_id, cell FROM cell_scores
    WHERE cell_rank <= 2 AND vec_id < 50
), cand AS (
    SELECT DISTINCT p.query_id, a.neighbor_id
    FROM assign a JOIN probes p USING (cell)
    WHERE p.query_id <> a.neighbor_id
)
SELECT CAST(c.query_id AS BIGINT) AS query_id,
       CAST(c.neighbor_id AS BIGINT) AS neighbor_id
FROM cand c
JOIN (SELECT vec_id, v AS cv FROM vecs) nv ON nv.vec_id = c.neighbor_id
JOIN (SELECT vec_id, v AS qv FROM vecs) qv2 ON qv2.vec_id = c.query_id
WHERE {_COS} >= 0.25
""",
)
def similarity_ivf_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE retrieval over the IVF index (radius query): ALL corpus
    members with cosine >= 0.25 of each probe vector (vec_id < 50),
    candidates bounded to the 2 probed cells — the similarity-bar
    companion to similarity_ivf_topk for contamination sweeps and
    "everything like these flagged docs" monitoring. No per-query
    window: selection is a pure filter, so the plan carries zero
    sorts; the oracle re-derives the trained cells with the unrolled
    Lloyd CTE and applies the identical threshold. 100 TB: per-query
    candidate work stays ~nprobe/n_cells of the corpus; output size is
    data-dependent by design (that IS the radius-query contract)."""
    emb = load(spark, sf_dir, "embeddings")
    return sim.ivf_range_search(
        emb, emb.filter(F.col("vec_id") < 50), 0.25,
        n_cells=_IVF_N_CELLS, max_train=_IVF_MAX_TRAIN, nprobe=2,
    )


@query(
    "dedup_global_lines",
    """
    WITH ls AS (
        SELECT doc_id, string_split(text, chr(10)) AS arr FROM documents
    ), lines AS (
        SELECT doc_id, unnest(arr) AS line,
               unnest(generate_series(1, len(arr))) AS pos
        FROM ls
    ), kept AS (
        SELECT doc_id, pos, line,
               row_number() OVER (PARTITION BY line
                                  ORDER BY doc_id, pos) AS occ
        FROM lines
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
           md5(string_agg(line, chr(10) ORDER BY pos)) AS rebuilt_md5
    FROM kept WHERE occ = 1
    GROUP BY doc_id
    """,
)
def dedup_global_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-GLOBAL first-occurrence line dedup with document
    reconstruction (operators/dedup.py::global_line_dedup): repeated
    nav bars / license blocks / quoted chains keep exactly ONE copy
    corpus-wide under the canonical (doc_id, position) order, and each
    document is rebuilt from its surviving lines — byte-checked via
    md5 of the reconstruction, so the whole explode -> global
    first-occurrence window -> reassembly pipeline is hash-verified
    cross-engine. Distinct mechanism from text_boilerplate_lines
    (frequency threshold): this is a global argmin over occurrences.
    100 TB: one shuffle keyed on line content, one on doc_id — the
    minimum the semantics admit."""
    docs = load(spark, sf_dir, "documents")
    return dd.global_line_dedup(docs)


# ---------------------------------------------------------------------------
# Round 9: density clustering, graded contamination, video frame sampling
# ---------------------------------------------------------------------------

# DBSCAN corpus: embeddings plus deterministic SATELLITES around every
# 10th vector — v + (j/10)*reverse(v) for j = 1..(1 + (vec_id//10) % 4),
# satellite ids = -(vec_id*10 + j): NEGATIVE, so they cannot collide
# with ANY non-negative base id space (the sf1 scale-up spreads vec_ids
# across 1e6-strided blocks, which collided with an additive offset and
# fanned the pair joins out through duplicate keys — the 21x first-probe
# ratio; SCALING.md r9 attribution). Pure double arithmetic in one fixed
# evaluation order, so both engines materialize bit-identical vectors;
# satellite counts vary 1-4 so the corpus genuinely mixes core / border
# / noise roles at eps_sim=0.98, min_pts=4 (empirically 46/50/527 at
# sf0.01, 209/190/2101 at sf0.1 — no role class is vacuous).
_DB_VECS_SRC = """SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    UNION ALL
    SELECT -(e.vec_id * 10 + j.j) AS vec_id,
           list_transform(generate_series(1, len(e.v)),
                          i -> e.v[i] + (j.j / 10.0)
                               * e.v[len(e.v) + 1 - i]) AS v
    FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          WHERE vec_id % 10 = 0) e
    JOIN (SELECT unnest(generate_series(1, 4)) AS j) j
      ON j.j <= 1 + (e.vec_id // 10) % 4"""

_DB_EPS = 0.98
_DB_MIN_PTS = 4

_DB_COS = (
    "list_dot_product(x.v, y.v)"
    " / (sqrt(list_dot_product(x.v, x.v))"
    " * sqrt(list_dot_product(y.v, y.v)))"
)

_DBSCAN_SQL = (
    _ivf_train_cte(_DB_VECS_SRC).replace("WITH vecs", "WITH RECURSIVE vecs", 1)
    + _CELL_SCORES_CTE
    + f"""
, assign AS (
    SELECT vec_id, cell FROM cell_scores WHERE cell_rank = 1
), m AS (
    SELECT a.vec_id, a.cell, v.v FROM assign a JOIN vecs v USING (vec_id)
), pr AS (
    SELECT x.vec_id AS ia, y.vec_id AS ib
    FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id
    WHERE {_DB_COS} >= {_DB_EPS}
), sym AS (
    SELECT ia AS a, ib AS b FROM pr
    UNION ALL
    SELECT ib AS a, ia AS b FROM pr
), core AS (
    SELECT a AS vec_id FROM sym GROUP BY a
    HAVING COUNT(*) + 1 >= {_DB_MIN_PTS}
), ce AS (
    SELECT s.a, s.b FROM sym s
    JOIN core c1 ON c1.vec_id = s.a
    JOIN core c2 ON c2.vec_id = s.b
), reach AS (
    SELECT vec_id AS src, vec_id AS node FROM core
    UNION
    SELECT r.src, e.b AS node FROM reach r JOIN ce e ON r.node = e.a
), comp AS (
    SELECT src AS vec_id, MIN(node) AS cluster_id FROM reach GROUP BY src
), border AS (
    SELECT s.a AS vec_id, MIN(c.cluster_id) AS cluster_id
    FROM sym s JOIN comp c ON c.vec_id = s.b
    WHERE s.a NOT IN (SELECT vec_id FROM core)
    GROUP BY s.a
)
SELECT a.vec_id,
       CASE WHEN cm.vec_id IS NOT NULL THEN 'core'
            WHEN b.vec_id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(COALESCE(cm.cluster_id, b.cluster_id, -1) AS BIGINT)
           AS cluster_id
FROM assign a
LEFT JOIN comp cm ON cm.vec_id = a.vec_id
LEFT JOIN border b ON b.vec_id = a.vec_id
"""
)


def _dbscan_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark mirror of _DB_VECS_SRC: same arithmetic, same evaluation
    order, so the satellite vectors are bit-identical doubles."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("embedding")
    )
    sats = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .withColumn(
            "j",
            F.explode(F.expr(
                "sequence(1, CAST(1 + (vec_id div 10) % 4 AS INT))"
            )),
        )
        .select(
            (-(F.col("vec_id") * 10 + F.col("j"))).alias("vec_id"),
            F.expr(
                "transform(sequence(1, size(embedding)), "
                "i -> embedding[i-1] + (CAST(j AS DOUBLE) / 10.0) "
                "* embedding[size(embedding) - i])"
            ).alias("embedding"),
        )
    )
    return emb.unionByName(sats)


@query("similarity_dbscan_clusters", _DBSCAN_SQL)
def similarity_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-restricted DBSCAN density clustering
    (operators/similarity.py::dbscan_cells): cosine >= 0.98 same-cell
    neighborhoods, min_pts=4 cores, clusters = connected components of
    the core-core graph (min core id label), borders attach to their
    smallest adjacent core's cluster, noise carries -1 — mode-collapse
    / template detection and outlier mining over an embedding corpus,
    one level up from SemDeDup's drop-the-copies contract. The oracle
    re-derives the trained cells with the unrolled Lloyd CTE and the
    clusters with a recursive reachability CTE over core-core edges.
    100 TB: same scale shape as dedup_semantic — within-cell pairs
    (sqrt-n cells above the pinned regime), bounded training, one
    degree aggregate, size-gated component propagation."""
    return sim.dbscan_cells(
        _dbscan_corpus(spark, sf_dir), eps_sim=_DB_EPS, min_pts=_DB_MIN_PTS
    )


@query(
    "text_rouge2_contamination",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ), grams AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, len(t) - 1),
                   i -> CAST(('0x' || substr(md5(
                       array_to_string(t[i:i+1], ' ')), 1, 8)) AS BIGINT)
               )) AS g
        FROM toks WHERE len(t) >= 2
    ), ex AS (
        SELECT doc_id, unnest(g) AS gram_hash FROM grams
    ), bench AS (
        SELECT doc_id AS bench_id, gram_hash FROM ex WHERE doc_id % 20 = 0
    ), tot AS (
        SELECT bench_id, COUNT(*) AS bench_ngrams FROM bench GROUP BY 1
    ), sh AS (
        SELECT e.doc_id, b.bench_id, COUNT(*) AS shared_ngrams
        FROM ex e JOIN bench b USING (gram_hash)
        WHERE e.doc_id <> b.bench_id
        GROUP BY 1, 2
    )
    SELECT s.doc_id, s.bench_id,
           CAST(s.shared_ngrams AS BIGINT) AS shared_ngrams,
           CAST(t.bench_ngrams AS BIGINT) AS bench_ngrams,
           CAST(1000000 * s.shared_ngrams // t.bench_ngrams AS BIGINT)
               AS rouge_recall_ppm
    FROM sh s JOIN tot t USING (bench_id)
    WHERE 1000000 * s.shared_ngrams // t.bench_ngrams >= 250000
    """,
)
def text_rouge2_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRADED benchmark contamination (operators/text.py::rouge_recall):
    set-ROUGE-2 recall of every benchmark document (stand-in: doc_id %
    20 == 0) against every corpus document covering >= 25% of its
    distinct bigrams — exact ppm integer division, the severity table
    a decontamination report publishes where text_decontaminate gives
    only the binary flag. The 25% cut keeps the output the genuine
    suspect set (10 pairs at sf0.01, ~4k at sf0.1) on this
    template-heavy synthetic corpus; production tunes it per corpus.
    100 TB: 8-byte gram hashes join against a broadcast benchmark
    index; per-bench totals are a tiny aggregate joined onto the
    sparse pair frame, and the ppm filter prunes before anything
    corpus-sized materializes."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    return tx.rouge_recall(docs, bench, n=2, min_recall_ppm=250000)


@query(
    "multimodal_frame_sample",
    """
    WITH ids AS (SELECT unnest(generate_series(0, 47)) AS i),
    fr AS (
        SELECT i, unnest(generate_series(0, 24 + (i % 7) * 8 - 1)) AS f
        FROM ids
    ), samp AS (
        SELECT i, f FROM fr WHERE f % 4 = 0
    ), ch AS (
        SELECT s.i, s.f, c.c,
               md5('video' || CAST(s.i AS VARCHAR) || ':'
                   || CAST(s.f AS VARCHAR) || ':'
                   || CAST(c.c AS VARCHAR)) AS h
        FROM samp s
        CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS c) c
    ), hx AS (
        SELECT i, f, string_agg(h, '' ORDER BY c) AS frame_hex
        FROM ch GROUP BY i, f
    ), bs AS (
        SELECT i, f,
               SUM(CAST(('0x' || substr(h, 2 * j.j + 1, 2)) AS INTEGER))
                   AS byte_sum
        FROM ch CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) j
        GROUP BY i, f
    )
    SELECT CAST(hx.i AS BIGINT) AS media_id,
           CAST(hx.f AS BIGINT) AS frame_no,
           hx.frame_hex,
           CAST(bs.byte_sum AS BIGINT) AS byte_sum
    FROM hx JOIN bs ON bs.i = hx.i AND bs.f = hx.f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride video frame sampling
    (operators/multimodal.py::sample_frames_stride): every 4th frame of each
    raw-container payload sliced out executor-side (Arrow-batched
    mapInPandas), summarized as frame hex + exact byte sum — the
    pre-embedding cost bound every video pipeline applies. The
    synthetic corpus (synthetic_video) concatenates per-frame md5
    chunks, so the oracle rebuilds the identical bytes from the same
    md5 hex and the whole demux -> slice -> sample pipeline is
    hash-checked, not rows-only. 100 TB: pure per-row scan work, no
    shuffle; payload bytes never leave the executor — only sampled
    frame summaries do."""
    from _event_intelligence_data_warehouse_spark.operators import (
        multimodal as mm,
    )

    video = mm.synthetic_video(spark, 48, frame_bytes=32)
    return mm.sample_frames_stride(video, every_k=4, frame_bytes=32)


@query(
    "similarity_matryoshka_recall",
    f"""
    WITH vecs AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), pvecs AS (
        SELECT vec_id, v[1:16] AS pv FROM vecs
    ), pq AS (
        SELECT vec_id AS query_id, pv AS qv FROM pvecs WHERE vec_id < 50
    ), pc AS (
        SELECT vec_id AS neighbor_id, pv AS cv FROM pvecs
    ), ascored AS (
        SELECT query_id, neighbor_id, {_COS} AS sim
        FROM pc CROSS JOIN pq
        WHERE query_id <> neighbor_id
    ), approx AS (
        SELECT query_id, neighbor_id, rank FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id)
                       AS rank
            FROM ascored
        ) WHERE rank <= 5
    )
    {_EXACT_TOPK_CTE}
    {_RECALL_TAIL}
    """,
)
def similarity_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation retrieval audit (Kusupati et al. 2022,
    arXiv:2205.13147): top-5 by cosine over the FIRST 16 of 64
    dimensions vs the full-dimension exact baseline — per-query overlap
    and top-1 agreement, the accuracy ledger for serving ANN on a
    truncated prefix (4x less dot-product compute and cache footprint;
    MRL-trained embedders order information so prefixes degrade
    gracefully). The prefix slice is exact in both engines (no
    arithmetic), so the audit itself is hash-checked like every other
    recall query. 100 TB: prefix scoring cuts candidate-scan FLOPs and
    bytes by dim_full/dim_prefix; the standard production shape is
    prefix shortlist -> full-dim rerank, both expressible with the
    existing topk operators."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("embedding")
    )
    pre = emb.select(
        "vec_id", F.expr("slice(embedding, 1, 16)").alias("embedding")
    )
    q_full = emb.filter(F.col("vec_id") < 50)
    q_pre = pre.filter(F.col("vec_id") < 50)
    return sim.topk_recall(
        sim.brute_force_topk(emb, q_full, k=5),
        sim.brute_force_topk(pre, q_pre, k=5),
    )
