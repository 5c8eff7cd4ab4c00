"""Text analysis operators: language ID, quality scoring, token
counting, fingerprinting — the per-document scoring tier of a
training-data pipeline.

All scores are emitted as exact integers (counts, or floor'd
micro-units) so the oracle hash can never trip on float formatting.
Marker/stopword vocabularies are inline broadcast dims — in
production they are config tables, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import table

# Marker tokens per language — a deterministic n-gram-heuristic demo
# (real lists are data, not code; the plan shape is the deliverable).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "es": ("customer", "value", "data"),
    "de": ("filter", "window", "stream"),
    "fr": ("merge", "sort", "join"),
}

STOPWORDS = ("the", "a", "of", "and", "in")


@register(
    "text_lang_id",
    oracle=f"""
    WITH markers (lang, tok) AS (VALUES {", ".join(
        f"('{lang}', '{tok}')" for lang, toks in sorted(LANG_MARKERS.items()) for tok in toks
    )}),
    tokens AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    hits AS (
        SELECT t.doc_id, m.lang, count(*) AS n_hits
        FROM tokens t JOIN markers m ON t.tok = m.tok
        GROUP BY t.doc_id, m.lang
    ),
    best AS (
        SELECT doc_id, lang, n_hits,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY n_hits DESC, lang ASC) AS rn
        FROM hits
    )
    SELECT d.doc_id,
           coalesce(b.lang, 'und') AS predicted_lang,
           CAST(coalesce(b.n_hits, 0) AS BIGINT) AS marker_hits
    FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID by marker-token voting: explode tokens, broadcast-
    join the marker dim, argmax with lexical tie-break, 'und'
    fallback. The n-gram-heuristic shape; scales as one narrow explode
    + broadcast join + groupBy(doc)."""
    d = table(spark, sf_dir, "documents")
    markers = spark.createDataFrame(
        [(lang, tok) for lang, toks in sorted(LANG_MARKERS.items()) for tok in toks],
        "lang string, tok string",
    )
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    hits = (
        tokens.join(F.broadcast(markers), "tok")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("n_hits"), F.asc("lang"))
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred"), "n_hits")
    )
    return d.join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce("pred", F.lit("und")).alias("predicted_lang"),
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("marker_hits"),
    )


@register(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, string_split(text, ' ') AS toks,
               length(text) AS n_ch
        FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT)                                   AS n_tokens,
           CAST(n_ch AS BIGINT)                                        AS n_chars,
           CAST(floor(n_ch * 1000000.0 / len(toks)) AS BIGINT)         AS mean_tok_len_micros,
           CAST(len(list_filter(toks, x -> x IN ({", ".join(f"'{s}'" for s in STOPWORDS)})))
                AS BIGINT)                                             AS n_stopwords,
           CAST(floor(len(list_filter(toks, x -> x IN ({", ".join(f"'{s}'" for s in STOPWORDS)})))
                * 1000000.0 / len(toks)) AS BIGINT)                    AS stopword_ratio_micros,
           CAST(floor(len(list_distinct(toks)) * 1000000.0 / len(toks)) AS BIGINT) AS ttr_micros
    FROM t WHERE len(toks) > 0
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal battery per document: token count, char count,
    mean token length, stopword count/ratio, type-token ratio — all
    narrow array ops, no shuffle, integer outputs (floor micros)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_toks = F.size(toks)
    return d.filter(n_toks > 0).select(
        "doc_id",
        n_toks.cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.floor(F.length("text") * 1000000.0 / n_toks).cast("bigint").alias("mean_tok_len_micros"),
        n_stop.cast("bigint").alias("n_stopwords"),
        F.floor(n_stop * 1000000.0 / n_toks).cast("bigint").alias("stopword_ratio_micros"),
        F.floor(F.size(F.array_distinct(toks)).cast("bigint") * 1000000.0 / n_toks)
        .cast("bigint")
        .alias("ttr_micros"),
    )


@register(
    "text_token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)               AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS alnum_tokens,
           CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT)   AS n_vowels
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, regex word tokens
    (the BPE-ish pre-tokenizer shape), vowel count — all native
    regexp, codegen'd."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0))
        .cast("bigint")
        .alias("alnum_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[aeiou]"), 0)).cast("bigint").alias("n_vowels"),
    )


@register(
    "text_fingerprints",
    oracle="""
    WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT doc_id,
               min(md5(s)) AS min_shingle_md5
        FROM (SELECT doc_id,
                     unnest(list_transform(generate_series(1, greatest(len(t) - 2, 0)),
                                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
              FROM toks WHERE len(t) >= 3)
        GROUP BY doc_id
    )
    SELECT x.doc_id,
           md5(x.text)                     AS content_md5,
           substring(md5(x.text), 1, 8)    AS fp_prefix,
           sh.min_shingle_md5              AS min_shingle_md5
    FROM toks x LEFT JOIN sh ON sh.doc_id = x.doc_id
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-content md5, 32-bit prefix, and
    the min-shingle hash (the first MinHash coordinate — the
    winnowing primitive)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    idx = F.when(F.size(toks) >= 3, F.sequence(F.lit(1), F.size(toks) - 2)).otherwise(
        F.array().cast("array<int>")
    )
    sh = (
        d.select("doc_id", F.explode(idx).alias("i"), toks.alias("t"))
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ",
                    F.element_at("t", F.col("i")),
                    F.element_at("t", F.col("i") + 1),
                    F.element_at("t", F.col("i") + 2),
                )
            ).alias("hsh"),
        )
        .groupBy("doc_id")
        .agg(F.min("hsh").alias("min_shingle_md5"))
    )
    return d.join(sh, "doc_id", "left").select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.substring(F.md5("text"), 1, 8).alias("fp_prefix"),
        "min_shingle_md5",
    )
