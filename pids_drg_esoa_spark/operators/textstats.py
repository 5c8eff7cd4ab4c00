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
    from .dedup import word_shingles

    d = table(spark, sf_dir, "documents")
    # the min-shingle hash IS the MinHash operator's first coordinate:
    # share word_shingles so the shingling definition cannot drift
    # (min over the distinct set == min over all occurrences)
    sh = (
        word_shingles(d, "text", "doc_id", 3)
        .select(F.col("doc").alias("doc_id"), F.md5("sh").alias("hsh"))
        .groupBy("doc_id")
        .agg(F.min("hsh").alias("min_shingle_md5"))
    )
    return d.join(sh, "doc_id", "left").select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.substring(F.md5("text"), 1, 8).alias("fp_prefix"),
        "min_shingle_md5",
    )


@register(
    "text_repetition_signals",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    g2 AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
                                     i -> tk[i] || ' ' || tk[i+1])) AS gram
        FROM t
    ),
    c2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY doc_id, gram),
    s2 AS (
        SELECT doc_id,
               max(c) AS top2, CAST(sum(c) AS BIGINT) AS n2,
               CAST(coalesce(sum(c) FILTER (WHERE c >= 2), 0) AS BIGINT) AS dup2
        FROM c2 GROUP BY doc_id
    ),
    g3 AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(tk) - 2, 0)),
                                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS gram
        FROM t
    ),
    c3 AS (SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY doc_id, gram),
    s3 AS (
        SELECT doc_id, max(c) AS top3, CAST(sum(c) AS BIGINT) AS n3
        FROM c3 GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(s2.n2, 0) AS BIGINT) AS n_2grams,
           CAST(coalesce(floor(s2.top2 * 1000000.0 / s2.n2), 0) AS BIGINT) AS top_2gram_frac_micros,
           CAST(coalesce(floor(s2.dup2 * 1000000.0 / s2.n2), 0) AS BIGINT) AS dup_2gram_frac_micros,
           CAST(coalesce(floor(s3.top3 * 1000000.0 / s3.n3), 0) AS BIGINT) AS top_3gram_frac_micros
    FROM t LEFT JOIN s2 ON s2.doc_id = t.doc_id
           LEFT JOIN s3 ON s3.doc_id = t.doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1): per
    document, the fraction of word-2-grams taken by the single most
    frequent 2-gram, the fraction of 2-gram positions whose 2-gram
    occurs ≥2× in the doc, and the top-3-gram fraction — the signals
    that catch boilerplate/looping text. Shape: ONE keyed explode over
    2-gram start positions carries BOTH gram sizes as tagged rows (the
    3-gram is NULL on the last position and filtered), so the corpus is
    tokenized once and shuffled twice (count by (doc, n, gram), re-agg
    by doc) instead of the two-passes-four-exchanges per-size shape;
    every shuffle key carries doc_id so the work partitions with the
    corpus. Per-doc stats split back out of the tagged counts with
    conditional aggregates. Integer micros outputs (reference: the
    quality-filter tier a curation pipeline runs before training)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    idx2 = F.when(F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)).otherwise(
        F.array().cast("array<int>")
    )
    g2 = F.concat_ws(
        " ", F.element_at("tk", F.col("i")), F.element_at("tk", F.col("i") + 1)
    )
    g3 = F.when(
        F.col("i") <= F.size("tk") - 2,
        F.concat_ws(
            " ",
            F.element_at("tk", F.col("i")),
            F.element_at("tk", F.col("i") + 1),
            F.element_at("tk", F.col("i") + 2),
        ),
    )
    both = (
        d.select("doc_id", F.explode(idx2).alias("i"), toks.alias("tk"))
        .select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(F.lit(2).alias("n"), g2.alias("gram")),
                    F.struct(F.lit(3).alias("n"), g3.alias("gram")),
                )
            ).alias("t"),
        )
        .select("doc_id", F.col("t.n").alias("n"), F.col("t.gram").alias("gram"))
        .filter(F.col("gram").isNotNull())
    )
    counts = both.groupBy("doc_id", "n", "gram").agg(F.count(F.lit(1)).alias("c"))
    is2, is3 = F.col("n") == 2, F.col("n") == 3
    s = counts.groupBy("doc_id").agg(
        F.max(F.when(is2, F.col("c"))).alias("top2"),
        F.sum(F.when(is2, F.col("c"))).cast("bigint").alias("n2"),
        F.coalesce(F.sum(F.when(is2 & (F.col("c") >= 2), F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("dup2"),
        F.max(F.when(is3, F.col("c"))).alias("top3"),
        F.sum(F.when(is3, F.col("c"))).cast("bigint").alias("n3"),
    )
    micros = lambda num, den: F.coalesce(  # noqa: E731
        F.floor(num * 1000000.0 / den), F.lit(0)
    ).cast("bigint")
    return d.join(s, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n2", F.lit(0)).cast("bigint").alias("n_2grams"),
        micros(F.col("top2"), F.col("n2")).alias("top_2gram_frac_micros"),
        micros(F.col("dup2"), F.col("n2")).alias("dup_2gram_frac_micros"),
        micros(F.col("top3"), F.col("n3")).alias("top_3gram_frac_micros"),
    )


@register(
    "text_rare_token_stats",
    oracle="""
    WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 0
                    THEN text || ' rareword' || CAST(doc_id AS VARCHAR)
                    ELSE text END AS text
        FROM documents
    ),
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM planted
    ),
    vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS corpus_n FROM tok GROUP BY tok)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT)                                  AS n_tokens,
           CAST(min(v.corpus_n) AS BIGINT)                           AS min_corpus_count,
           CAST(coalesce(count(*) FILTER (WHERE v.corpus_n = 1), 0) AS BIGINT) AS n_hapax,
           CAST(floor(sum(v.corpus_n) * 1000000.0 / count(*)) AS BIGINT) AS mean_corpus_count_micros
    FROM tok t JOIN vocab v ON v.tok = t.tok
    GROUP BY t.doc_id
    """,
)
def text_rare_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog binding of ``rare_token_stats``. A doc-unique token is
    planted on doc_id % 11 = 0 — ORACLE-ONLY synthetic signal so the
    hapax column is non-trivial on the test corpus (whose organic
    vocabulary is fully shared); real callers (the curate CLI) invoke
    ``rare_token_stats`` on the raw corpus instead."""
    d = table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat("text", F.lit(" rareword"), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return rare_token_stats(planted, n_docs=d.count())


# Above this corpus size the vocabulary dim loses its broadcast hint:
# by Heaps' law the distinct-token count of raw space-split text GROWS
# with the corpus (V(n) ≈ K·n^β, β ≈ 0.5–0.8 — hapaxes, URLs, typos
# never plateau), so at 100 TB the token→count dim is billions of rows
# and a forced broadcast OOMs executors instead of degrading. Same
# gating pattern as dedup._SEMI_FILTER_MIN_DOCS.
VOCAB_BROADCAST_MAX_DOCS = 100_000


def rare_token_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_docs: int | None = None,
) -> DataFrame:
    """Corpus-frequency quality signals (the integer-exact stand-in
    for unigram-LM perplexity): per document, the rarest token's
    corpus count, the hapax-token count, and the mean corpus frequency
    — low values flag OOV-dense / garbled docs, high values flag
    stopword soup. Two-pass shape: explode → groupBy(token) builds the
    corpus vocabulary (map-side combinable), then the frequency join
    back, and the per-doc re-aggregation shuffles on doc_id only.
    All-integer outputs.

    The vocabulary join is broadcast-hinted only when the
    caller-known corpus size is under VOCAB_BROADCAST_MAX_DOCS; above
    the gate (or when ``n_docs`` is None) the hint is dropped and AQE
    promotes the join to broadcast at runtime iff the measured dim is
    actually small. Pass ``n_docs`` when cheaply known (count() on a
    bare parquet scan is metadata-only); leave None for derived
    inputs rather than forcing an eager count."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.split(text_col, " ")).alias("tok")
    )
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("corpus_n"))
    if n_docs is not None and n_docs <= VOCAB_BROADCAST_MAX_DOCS:
        vocab = F.broadcast(vocab)
    return (
        tok.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.min("corpus_n").cast("bigint").alias("min_corpus_count"),
            F.coalesce(F.sum(F.when(F.col("corpus_n") == 1, 1)), F.lit(0))
            .cast("bigint")
            .alias("n_hapax"),
            F.floor(F.sum("corpus_n") * 1000000.0 / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_corpus_count_micros"),
        )
    )


WINNOW_W = 4  # fingerprint window: positions per selection window


@register(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    grams AS (
        SELECT doc_id, i,
               md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS h
        FROM t, unnest(generate_series(1, greatest(len(tk) - 2, 0))) AS u(i)
    ),
    sel AS (
        SELECT doc_id, i, h,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS wmin
        FROM grams
    ),
    fp AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_selected,
               CAST(count(DISTINCT h) AS BIGINT) AS n_fingerprints,
               min(h) AS min_fingerprint
        FROM sel WHERE h = wmin
        GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(fp.n_selected, 0) AS BIGINT) AS n_selected,
           CAST(coalesce(fp.n_fingerprints, 0) AS BIGINT) AS n_fingerprints,
           fp.min_fingerprint
    FROM t LEFT JOIN fp ON fp.doc_id = t.doc_id
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken
    2003 — the MOSS primitive): hash every word 3-gram, slide a
    {WINNOW_W}-position window, and select a position iff its hash is
    the minimum of the window ending there — a deterministic, locally
    guaranteed sample of the k-gram stream whose density is bounded by
    the window width. Per doc: selected-position count, distinct
    fingerprint count, minimum fingerprint (the MinHash coordinate —
    text_fingerprints' min_shingle_md5 is this operator's w→∞ limit).
    Shape: one keyed explode + a doc-partitioned running-window min
    (sort within doc partitions only) + per-doc re-agg; everything
    shuffles on doc_id, so the work partitions with the corpus."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    idx = F.when(F.size(toks) >= 3, F.sequence(F.lit(1), F.size(toks) - 2)).otherwise(
        F.array().cast("array<int>")
    )
    from pyspark.sql import Window as W

    grams = d.select("doc_id", F.explode(idx).alias("i"), toks.alias("tk")).select(
        "doc_id",
        "i",
        F.md5(
            F.concat_ws(
                " ",
                F.element_at("tk", F.col("i")),
                F.element_at("tk", F.col("i") + 1),
                F.element_at("tk", F.col("i") + 2),
            )
        ).alias("h"),
    )
    w = (
        W.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(-(WINNOW_W - 1), W.currentRow)
    )
    sel = grams.withColumn("wmin", F.min("h").over(w)).filter(F.col("h") == F.col("wmin"))
    fp = sel.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.countDistinct("h").cast("bigint").alias("n_fingerprints"),
        F.min("h").alias("min_fingerprint"),
    )
    return d.join(fp, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_selected", F.lit(0)).cast("bigint").alias("n_selected"),
        F.coalesce("n_fingerprints", F.lit(0)).cast("bigint").alias("n_fingerprints"),
        "min_fingerprint",
    )
