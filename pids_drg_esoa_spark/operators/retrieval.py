"""Corpus retrieval operators: BM25 keyword search and TF-IDF term
profiling over the documents table.

A training-data pipeline needs corpus *search* as much as corpus
*filtering*: locating contaminated spans, auditing what a dedup pass
removed, or pulling topical slices for mixture design all reduce to
"score every document against a small term set and take the top k".
Both operators are library functions (`bm25_search`,
`tfidf_top_terms`) taking the corpus DataFrame plus user parameters;
the catalog entries bind the standing demo constants so the oracle
gate pins the defaults while production callers pass their own terms
and weights.

Broadcast discipline for the term→df dim: by Heaps' law the
distinct-token count of raw space-split text grows with the corpus
(V(n) ≈ K·n^β, β ≈ 0.5–0.8 — hapax legomena, URLs, typos never
plateau), so the vocabulary aggregate is NOT broadcastable at
arbitrary scale. The df join is broadcast-hinted only below a
doc-count gate (same pattern as dedup._SEMI_FILTER_MIN_DOCS); above
it — or when the caller doesn't know the corpus size — the hint is
dropped and AQE promotes the join to broadcast at runtime iff the
measured dim size is actually small. BM25 is exempt: its df dim has
one row per QUERY term (O(|query|), never O(vocab)), so its hint is
always safe.

Determinism contract (the catalog hash gate): every score is emitted
as integer micros. BM25 needs non-integer math, so the Spark
expression and the SQL oracle are generated from the SAME Python
doubles (repr() round-trips IEEE-754) with identical
parenthesization and operation order — double mul/div/add are
correctly rounded, so the same expression tree over the same
operands is bit-identical across engines, and the floor() cannot
disagree for any (k1, b). TF-IDF avoids the issue entirely with
bigint-only arithmetic (rational idf, integer division).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import table

# The standing demo parameters — the catalog entries bind these; the
# library functions below take them as arguments.
QUERY_TERMS = ("spark", "window", "hash")
TOP_K = 20
BM25_K1 = 1.2
BM25_B = 0.75

# ONE broadcast policy for the vocabulary dim (Heaps' law — see
# module docstring and textstats.py, where the constant lives).
from .textstats import VOCAB_BROADCAST_MAX_DOCS  # noqa: E402


def _bm25_oracle_sql(terms: Sequence[str], top_k: int, k1: float, b: float) -> str:
    """The DuckDB oracle for ``bm25_search`` with the same parameters.
    Float literals are emitted with repr() from the exact doubles the
    Spark expression multiplies by, so both engines evaluate the same
    IEEE-754 expression tree."""
    # SQL-escape user terms ('' doubling) — terms are a public
    # parameter now, and an apostrophe must not break the oracle
    terms_sql = ", ".join("('{}')".format(t.replace("'", "''")) for t in terms)
    k1p1, omb = repr(k1 + 1.0), repr(1.0 - b)
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    stats AS (
        SELECT CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl,
               count(*) AS n
        FROM t
    ),
    qt (term) AS (VALUES {terms_sql}),
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
                   * ((tf.tf * {k1p1})
                      / (tf.tf + {k1!r} * ({omb} + {b!r} * (tf.dl / s.avgdl))))
                   * 1000000.0
               ) AS BIGINT) AS term_micros
        FROM tf JOIN df USING (term) CROSS JOIN stats s
        WHERE tf.tf > 0
    )
    SELECT doc_id, CAST(sum(term_micros) AS BIGINT) AS bm25_micros
    FROM sc GROUP BY doc_id
    ORDER BY bm25_micros DESC, doc_id ASC
    LIMIT {top_k}
    """


def bm25_search(
    docs: DataFrame,
    terms: Sequence[str],
    top_k: int = TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k keyword search with rational idf
    (N-df+0.5)/(df+0.5) — the log-free Robertson-Sparck-Jones odds so
    the only double math mirrors the oracle bit-for-bit (no
    transcendentals). Plan: per-(doc, term) tf is a native array
    filter (no token-stream explode — the term set, not the corpus,
    is enumerated), df/avgdl are two tiny aggregates broadcast back
    (O(|query|) rows — always broadcastable), the per-term integer
    micros sum per doc, and the top-k is TakeOrderedAndProject. At
    100 TB the scan dominates; everything joined is O(|query|) rows."""
    spark = docs.sparkSession
    t = docs.select(F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("tk"))
    term_dim = spark.createDataFrame([(q,) for q in terms], "term string")
    tf = t.crossJoin(F.broadcast(term_dim)).select(
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
    # same doubles / parenthesization / op order as _bm25_oracle_sql
    term_micros = F.floor(
        ((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * (
            (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * ((1.0 - b) + b * (F.col("dl") / F.col("avgdl"))))
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
        .limit(top_k)
    )


@register("corpus_bm25_search", oracle=_bm25_oracle_sql(QUERY_TERMS, TOP_K, BM25_K1, BM25_B))
def corpus_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog binding of ``bm25_search`` at the standing demo
    parameters (k1=1.2, b=0.75, 3 query terms, top 20)."""
    return bm25_search(table(spark, sf_dir, "documents"), QUERY_TERMS, TOP_K, BM25_K1, BM25_B)


TFIDF_TOP = 3


def tfidf_top_terms(
    docs: DataFrame,
    top_n: int = TFIDF_TOP,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """Top-n characteristic terms per document by rational TF-IDF
    (tf * N / df, bigint-exact integer division — no doubles
    anywhere). Plan: token explode → (doc, term) tf agg; the df side
    is the corpus vocabulary aggregate — broadcast-hinted only when
    the caller-known corpus size is under VOCAB_BROADCAST_MAX_DOCS
    (Heaps' law: the vocabulary GROWS with the corpus, so a forced
    broadcast OOMs at web scale; above the gate AQE picks broadcast
    at runtime iff the measured dim is actually small). Pass
    ``n_docs`` when cheaply known (a count() on a bare parquet scan
    is metadata-only); leave None for derived inputs rather than
    forcing an eager count. The per-doc top-n uses the grouped
    sort_array+slice shape (map-side combinable) instead of a
    row_number window, so no per-doc-group sort materializes at
    scale."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.split(text_col, " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    if n_docs is not None and n_docs <= VOCAB_BROADCAST_MAX_DOCS:
        df = F.broadcast(df)
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    sc = (
        tf.join(df, "term")
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
                top_n,
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
    """Catalog binding of ``tfidf_top_terms`` (top 3). The catalog
    corpus is a bare parquet scan, so the doc count is metadata-only
    and the broadcast gate gets an exact size."""
    d = table(spark, sf_dir, "documents")
    return tfidf_top_terms(d, TFIDF_TOP, n_docs=d.count())
