"""Corpus retrieval operators: BM25 keyword search and TF-IDF term
profiling over the documents table.

A training-data pipeline needs corpus *search* as much as corpus
*filtering*: locating contaminated spans, auditing what a dedup pass
removed, or pulling topical slices for mixture design all reduce to
"score every document against a small term set and take the top k".
Both operators here are two-aggregate plans — a corpus-statistics
pass (df / avgdl; Zipf bounds the vocabulary, so the stats side is
broadcastable at any corpus size) and a per-document scoring pass —
with the final top-k as a TakeOrderedAndProject, never a global sort
materialization.

Determinism contract (the catalog hash gate): every score is emitted
as integer micros. BM25 needs non-integer math, so the Spark
expression and the SQL oracle are written with IDENTICAL literals,
parenthesization, and operation order — IEEE-754 double mul/div/add
are correctly rounded, so the same expression tree over the same
operands is bit-identical across engines, and the floor() cannot
disagree. TF-IDF avoids the issue entirely with bigint-only
arithmetic (rational idf, integer division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import table

# The standing demo query — in production this is a parameter.
QUERY_TERMS = ("spark", "window", "hash")
TOP_K = 20

_TERMS_SQL = ", ".join(f"('{t}')" for t in QUERY_TERMS)


@register(
    "corpus_bm25_search",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    stats AS (
        SELECT CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl,
               count(*) AS n
        FROM t
    ),
    qt (term) AS (VALUES {_TERMS_SQL}),
    tf AS (
        SELECT doc_id, len(tk) AS dl, term,
               len(list_filter(tk, x -> x = term)) AS tf
        FROM t, qt
    ),
    df AS (
        SELECT term, CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df
        FROM tf GROUP BY term
    ),
    sc AS (
        SELECT tf.doc_id,
               CAST(floor(
                   ((s.n - df.df + 0.5) / (df.df + 0.5))
                   * ((tf.tf * 2.2)
                      / (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * (tf.dl / s.avgdl))))
                   * 1000000.0
               ) AS BIGINT) AS term_micros
        FROM tf JOIN df USING (term) CROSS JOIN stats s
        WHERE tf.tf > 0
    )
    SELECT doc_id, CAST(sum(term_micros) AS BIGINT) AS bm25_micros
    FROM sc GROUP BY doc_id
    ORDER BY bm25_micros DESC, doc_id ASC
    LIMIT {TOP_K}
    """,
)
def corpus_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k keyword search (k1=1.2, b=0.75, rational idf
    (N-df+0.5)/(df+0.5) — the log-free Robertson-Sparck-Jones odds so
    the only transcendental-free double math mirrors the oracle
    bit-for-bit). Plan: per-(doc, term) tf is a native array filter
    (no token-stream explode — the term set, not the corpus, is
    enumerated), df/avgdl are two tiny aggregates broadcast back, the
    per-term integer micros sum per doc, and the top-k is
    TakeOrderedAndProject. At 100 TB the scan dominates; everything
    joined is O(|query|) rows."""
    d = table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("tk"))
    terms = spark.createDataFrame([(q,) for q in QUERY_TERMS], "term string")
    tf = t.crossJoin(F.broadcast(terms)).select(
        "doc_id",
        F.size("tk").alias("dl"),
        "term",
        F.size(F.filter("tk", lambda x: x == F.col("term"))).alias("tf"),
    )
    stats = t.agg(
        (F.sum(F.size("tk")).cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n"),
    )
    df = tf.groupBy("term").agg(
        F.sum(F.when(F.col("tf") > 0, 1).otherwise(0)).cast("bigint").alias("df")
    )
    # identical literals / parenthesization / op order as the oracle
    term_micros = F.floor(
        ((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (
            (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * ((1.0 - 0.75) + 0.75 * (F.col("dl") / F.col("avgdl"))))
        )
        * 1000000.0
    ).cast("bigint")
    sc = (
        tf.filter(F.col("tf") > 0)
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term_micros.alias("term_micros"))
    )
    return (
        sc.groupBy("doc_id")
        .agg(F.sum("term_micros").cast("bigint").alias("bm25_micros"))
        .orderBy(F.desc("bm25_micros"), F.asc("doc_id"))
        .limit(TOP_K)
    )


TFIDF_TOP = 3


@register(
    "corpus_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    sc AS (
        SELECT tf.doc_id, tf.term,
               CAST((tf.tf * n.n * 1000000) // df.df AS BIGINT) AS tfidf_micros
        FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    r AS (
        SELECT doc_id, term, tfidf_micros,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf_micros DESC, term ASC) AS rn
        FROM sc
    )
    SELECT doc_id, CAST(rn AS BIGINT) AS rank, term, tfidf_micros
    FROM r WHERE rn <= {TFIDF_TOP}
    """,
)
def corpus_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by rational
    TF-IDF (tf * N / df, bigint-exact integer division — no doubles
    anywhere). Plan: token explode → (doc, term) tf agg; the df side
    is a Zipf-bounded vocabulary aggregate broadcast back; the
    per-doc top-3 uses the grouped sort_array+slice shape (map-side
    combinable) instead of a row_number window, so no per-doc-group
    sort materializes at scale."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    sc = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.expr("CAST((tf * n * 1000000) div df AS BIGINT)").alias("tfidf_micros"),
        )
    )
    # grouped top-k: sort_array over struct(-score, term) ascending
    # == (score desc, term asc); slice keeps the head
    top = (
        sc.groupBy("doc_id")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            (-F.col("tfidf_micros")).alias("neg"),
                            F.col("term").alias("term"),
                            F.col("tfidf_micros").alias("tfidf_micros"),
                        )
                    )
                ),
                1,
                TFIDF_TOP,
            ).alias("top")
        )
        .select("doc_id", F.posexplode("top").alias("pos", "s"))
    )
    return top.select(
        "doc_id",
        (F.col("pos") + 1).cast("bigint").alias("rank"),
        F.col("s.term").alias("term"),
        F.col("s.tfidf_micros").alias("tfidf_micros"),
    )
