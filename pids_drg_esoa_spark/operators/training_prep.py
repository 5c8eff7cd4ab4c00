"""Training-set preparation operators: context-window chunking,
mixture upsampling, and sharded shuffle ordering.

The last mile of a data pipeline — after dedup/curation — is turning
a document corpus into a training stream: split long documents into
model-context-sized chunks, replicate/downsample sources to the
designed mixture weights (fractional epochs), and assign every
example a reproducible shuffled position. All three are deterministic
here (md5-keyed randomness, like operators/curation.py's stratified
sampler) so reruns, resumes, and the oracle gate all agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import table

CHUNK_W = 32  # context window, tokens
CHUNK_S = 24  # stride (CHUNK_W - CHUNK_S tokens of overlap)


@register(
    "doc_chunk_sliding",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    c AS (
        SELECT doc_id, tk, i
        FROM t, unnest(generate_series(0, (len(tk) - 1) // {CHUNK_S})) AS u(i)
        WHERE len(tk) > 0
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(tk, i * {CHUNK_S} + 1, i * {CHUNK_S} + {CHUNK_W}))
                AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(tk, i * {CHUNK_S} + 1, i * {CHUNK_S} + {CHUNK_W}),
                           ' ') AS chunk_text
    FROM c
    """,
)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog binding of ``chunk_sliding`` at the standing demo
    window/stride (32/24)."""
    return chunk_sliding(table(spark, sf_dir, "documents"), CHUNK_W, CHUNK_S)


def chunk_sliding(
    docs: DataFrame,
    window: int = CHUNK_W,
    stride: int = CHUNK_S,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window context chunking: ``window``-token chunks at
    ``stride`` (window - stride tokens of overlap so no span is split
    across chunk boundaries without a witness). Chunk starts run 0,
    S, 2S, … up to the last start < n_tokens, so every token lands in
    ≥1 chunk and the tail chunk may be short. Pure narrow plan —
    explode of a per-row integer sequence + array slice; no shuffle,
    scales as the scan."""
    tk = F.split(text_col, " ")
    t = docs.select(F.col(id_col).alias("doc_id"), tk.alias("tk")).filter(F.size("tk") > 0)
    n_chunks_last = F.floor((F.size("tk") - 1) / stride).cast("int")
    c = t.select(
        "doc_id", "tk", F.explode(F.sequence(F.lit(0), n_chunks_last)).alias("i")
    )
    sl = F.slice("tk", F.col("i") * stride + 1, window)
    return c.select(
        "doc_id",
        F.col("i").cast("bigint").alias("chunk_idx"),
        F.size(sl).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(sl, " ").alias("chunk_text"),
    )


# Mixture design: (integer epochs, fractional-epoch keep threshold as
# a 2-hex-digit md5 prefix bound — '80' == 128/256 == exactly 0.5).
# Sources not listed train for exactly 1 epoch.
MIXTURE_WEIGHTS: dict[str, tuple[int, str]] = {
    "src0": (3, "00"),   # 3.0 epochs
    "src1": (1, "80"),   # 1.5 epochs
    "src2": (0, "40"),   # 0.25 epochs (downsample)
    "src3": (0, "00"),   # 0 epochs (drop)
}

_WEIGHTS_SQL = ", ".join(
    f"('{s}', {i}, '{h}')" for s, (i, h) in sorted(MIXTURE_WEIGHTS.items())
)


@register(
    "corpus_upsample_mixture",
    oracle=f"""
    WITH w (source, ipart, fhex) AS (VALUES {_WEIGHTS_SQL}),
    b AS (
        SELECT doc_id, d.source,
               coalesce(w.ipart, 1)
               + CASE WHEN substring(md5('up:' || CAST(doc_id AS VARCHAR)), 1, 2)
                           < coalesce(w.fhex, '00')
                      THEN 1 ELSE 0 END AS n
        FROM documents d LEFT JOIN w USING (source)
    )
    SELECT doc_id, source, CAST(u.i AS BIGINT) AS copy_idx
    FROM b, unnest(generate_series(1, n)) AS u(i)
    WHERE n >= 1
    """,
)
def corpus_upsample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog binding of ``upsample_mixture`` at the standing demo
    mixture weights."""
    return upsample_mixture(table(spark, sf_dir, "documents"), MIXTURE_WEIGHTS)


def upsample_mixture(
    docs: DataFrame,
    weights: dict[str, tuple[int, str]],
    seed: str = "up",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fractional-epoch mixture replication: each document is emitted
    floor(w) times plus one more with probability frac(w), decided by
    a deterministic md5 bucket of the doc id — the DoReMi-style
    mixture-weight materialization. ``weights`` maps source →
    (integer epochs, fractional-epoch keep threshold as a 2-hex-digit
    md5 prefix bound); unlisted sources train for exactly 1 epoch.
    Plan: broadcast join of the tiny weights dim, then an explode of
    a per-row 1..n sequence — no shuffle; output size is exactly the
    designed token budget. Reruns reproduce the same copies (md5, not
    rand()), so a resumed 100 TB materialization is idempotent per
    partition."""
    spark = docs.sparkSession
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(source_col).alias("source"))
    w = spark.createDataFrame(
        [(s, i, h) for s, (i, h) in sorted(weights.items())],
        "source string, ipart int, fhex string",
    )
    bucket = F.substring(
        F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string"))), 1, 2
    )
    n = F.coalesce("ipart", F.lit(1)) + F.when(bucket < F.coalesce("fhex", F.lit("00")), 1).otherwise(0)
    b = (
        d.join(F.broadcast(w), "source", "left")
        .select("doc_id", "source", n.alias("n"))
        .filter(F.col("n") >= 1)  # sequence(1, 0) would DESCEND in Spark
    )
    return b.select(
        "doc_id", "source", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i")
    ).select("doc_id", "source", F.col("i").cast("bigint").alias("copy_idx"))


@register(
    "corpus_shard_shuffle",
    oracle="""
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
                AS BIGINT) AS pos_in_shard
    FROM (
        SELECT doc_id,
               md5('shuffle1:' || CAST(doc_id AS VARCHAR)) AS h,
               substring(md5('shuffle1:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard
        FROM documents
    )
    """,
)
def corpus_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog binding of ``shard_shuffle`` at the standing demo
    epoch seed."""
    return shard_shuffle(table(spark, sf_dir, "documents"), seed="shuffle1")


def shard_shuffle(
    docs: DataFrame,
    seed: str = "shuffle1",
    shard_hex_digits: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training shuffle, sharded: every doc gets
    an md5 shuffle key; the first ``shard_hex_digits`` hex digits
    assign one of 16^digits shards and the position within the shard
    is the rank of the full key. This is how a distributed trainer
    consumes a shuffled 100 TB corpus — a GLOBAL row_number is a
    one-partition scale killer, but shard + within-shard order gives
    the same uniformly-shuffled read order with 2^k-way parallel
    sorts, each a partitioned window. Changing the seed string
    reshuffles every epoch reproducibly."""
    from pyspark.sql import Window as W

    h = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        h.alias("h"),
        F.substring(h, 1, shard_hex_digits).alias("shard"),
    )
    w = W.partitionBy("shard").orderBy("h", "doc_id")
    return base.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos_in_shard"),
    )


TOKEN_BUDGET = 100_000  # demo budget; a parameter of the library core


@register(
    "corpus_token_budget_sample",
    oracle=f"""
    WITH b AS (
        SELECT doc_id,
               md5('budget1:' || CAST(doc_id AS VARCHAR)) AS h,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    r AS (
        SELECT doc_id, h, n_tokens,
               CAST(sum(n_tokens) OVER (ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
        FROM b
    )
    SELECT doc_id, n_tokens, cum_tokens
    FROM r WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
)
def corpus_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog binding of ``token_budget_sample`` at the standing
    demo budget. The oracle is the NAIVE form (one global running-sum
    window); the Spark plan is the distributed two-pass prefix-sum —
    identical output, no single-partition stage."""
    return token_budget_sample(table(spark, sf_dir, "documents"), TOKEN_BUDGET)


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    seed: str = "budget1",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic token-budget corpus cut: order documents by an
    md5 shuffle key and keep the prefix whose cumulative token count
    fits ``budget_tokens`` — how a training run selects "the first
    N billion tokens of the (shuffled) corpus" reproducibly.

    The naive plan is a GLOBAL running-sum window — an
    Exchange SinglePartition that serializes 100 TB through one task.
    This is instead the textbook distributed prefix-sum, exact and
    fully parallel:

    1. shard by the first hex nibble of the key (the shard is a
       PREFIX of the sort key, so global (h, doc_id) order ==
       (shard, h, doc_id) order);
    2. within-shard running sums — 16 parallel partitioned windows;
    3. per-shard totals (16 rows) get cross-shard offsets via a
       broadcast triangular self-join (strictly-smaller shards'
       totals summed) — no single-partition exchange anywhere, the
       16-row dim is the only data that crosses shards;
    4. keep rows with offset + running ≤ budget.

    Output (doc_id, n_tokens, cum_tokens) where cum_tokens is the
    EXACT global prefix sum — byte-identical to the naive plan."""
    h = F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    b = docs.select(
        F.col(id_col).alias("doc_id"),
        h.alias("h"),
        F.size(F.split(text_col, " ")).cast("bigint").alias("n_tokens"),
    )
    return prefix_sum_budget_cut(b, budget_tokens)


def prefix_sum_budget_cut(b: DataFrame, budget_tokens: int) -> DataFrame:
    """The distributed two-pass prefix-sum cut over any
    (doc_id, h, n_tokens) relation — the token-unit-agnostic core
    shared by the whitespace and BPE budget operators."""
    from pyspark.sql import Window as W

    b = b.withColumn("shard", F.substring("h", 1, 1))
    w = W.partitionBy("shard").orderBy("h", "doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    within = b.withColumn("running", F.sum("n_tokens").over(w))
    # shard totals from the WINDOWED relation (the shard's last
    # running value), not from `b` directly: both consumers then share
    # the same shard-hash exchange subtree, which AQE reuses
    # (ReusedExchange) — the corpus is scanned and tokenized ONCE, not
    # once per branch
    totals = within.groupBy("shard").agg(F.max("running").alias("shard_total"))
    offsets = (
        totals.alias("t")
        .join(
            F.broadcast(totals.alias("p")),
            F.col("p.shard") < F.col("t.shard"),
            "left",
        )
        .groupBy(F.col("t.shard").alias("shard"))
        .agg(F.coalesce(F.sum("p.shard_total"), F.lit(0)).alias("offset"))
    )
    return (
        within.join(F.broadcast(offsets), "shard")
        .withColumn("cum_tokens", (F.col("offset") + F.col("running")).cast("bigint"))
        .filter(F.col("cum_tokens") <= budget_tokens)
        .select("doc_id", "n_tokens", "cum_tokens")
    )
