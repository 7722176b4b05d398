"""Python UDTF (Spark 4 user-defined table function) API surface: a
sentence-splitting table function, asserted EQUIVALENT to the native
explode/split path that the engine actually uses in production.

House position (SCALE.md): UDTFs are row-at-a-time Python — cold-path
API coverage only; every hot-path expansion in the package is a native
explode/posexplode/inline. This test pins both the API and that the
native rewrite is a drop-in replacement."""

from __future__ import annotations

from pyspark.sql import functions as F


def _native_sentences(df):
    s = F.split(F.col("text"), r"\.")
    return (
        df.select(
            "doc_id",
            F.posexplode(s).alias("sentence_idx", "sentence"),
        )
        .withColumn("sentence", F.trim("sentence"))
        .where(F.col("sentence") != "")
        .withColumn(
            "n_tokens",
            F.size(F.filter(F.split("sentence", r"\s+"), lambda x: x != "")),
        )
    )


def test_udtf_matches_native_explode(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, sentence_idx: int, sentence: string,"
                     " n_tokens: int")
    class SplitSentences:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            idx = 0
            for raw in text.split("."):
                s = raw.strip()
                if not s:
                    idx += 1
                    continue
                yield doc_id, idx, s, len([t for t in s.split() if t])
                idx += 1

    rows = [
        (1, "alpha beta. gamma.  delta epsilon zeta"),
        (2, "one."),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    spark.udtf.register("split_sentences", SplitSentences)
    df.createOrReplaceTempView("docs_udtf_in")
    got = spark.sql(
        """
        SELECT s.doc_id, s.sentence_idx, s.sentence, s.n_tokens
        FROM docs_udtf_in, LATERAL split_sentences(doc_id, text) s
        """
    ).collect()
    want = _native_sentences(df).collect()
    got_t = sorted([(r.doc_id, r.sentence_idx, r.sentence, r.n_tokens)
                    for r in got])
    want_t = sorted([(r.doc_id, r.sentence_idx, r.sentence, r.n_tokens)
                     for r in want])
    assert got_t == want_t
    assert (1, 0, "alpha beta", 2) in got_t
