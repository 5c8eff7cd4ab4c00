"""Similarity search over embedding columns (array<float>).

Scoring is an integer dot product over vectors quantized to 1e-4
(floor) — on the unit-norm synthetic embeddings this ranks identically
to cosine, and integer arithmetic is bit-exact across engines and
across partition orders (a float dot's accumulation order is not).

- brute-force top-k: the correctness baseline; fact×queries
  broadcast nested-loop, fine when |queries| is small.
- IVF/LSH-bucketed top-k: sign-bit coarse quantization (8 planes →
  256 cells); probes only the query's cell. The 100 TB path: the
  bucket key is an equi-join key, so candidate generation shuffles
  O(n), never O(n²). Recall < 1 by design — documented tradeoff.
- near-dup pairs: label-blocked pair scan with a dot threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import table

QUANT = 10_000
N_QUERIES = 20
TOP_K = 5


def quantize(col) -> Column:
    """array<float> → array<bigint> at 1e-4 resolution (floor —
    engine-portable, unlike round)."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT).cast("long"))


def int_dot(a, b) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sign_bucket(col, n_planes: int = 8) -> Column:
    """Coarse cell id: sign bits of the first n dims ('1' if ≥ 0)."""
    return F.concat(
        *[F.when(F.element_at(col, i + 1) >= 0, "1").otherwise("0") for i in range(n_planes)]
    )


_SQL_DOT = (
    "CAST(list_sum(list_transform(generate_series(1, 64), "
    "i -> CAST(floor(a.e[i] * 10000) AS BIGINT) * CAST(floor(b.e[i] * 10000) AS BIGINT))) AS BIGINT)"
)


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, {_SQL_DOT.replace("a.e", "q.e")} AS dot_q
        FROM q, v b WHERE b.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, dot_q
    FROM (
        SELECT query_id, neighbor_id, dot_q,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k by quantized dot product (= cosine on these
    unit-norm vectors): broadcast the small query set against the
    full collection, window top-k with id tie-break."""
    v = table(spark, sf_dir, "embeddings").select("vec_id", quantize(F.col("embedding")).alias("qe"))
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_emb")
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            int_dot(F.col("q_emb"), F.col("qe")).alias("dot_q"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "dot_q")
    )


@register(
    "ann_ivf_bucketed_topk",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               {" || ".join(f"(CASE WHEN embedding[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(8))} AS cell
        FROM embeddings
    ),
    q AS (SELECT * FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, {_SQL_DOT.replace("a.e", "q.e")} AS dot_q
        FROM q JOIN v b ON q.cell = b.cell AND b.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rank, dot_q
    FROM (
        SELECT query_id, neighbor_id, dot_q,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dot_q DESC, neighbor_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
)
def ann_ivf_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed ANN: sign-bit coarse cells (8 planes → 256),
    probe only the query's cell, top-3 within it. Candidate
    generation becomes an equi-join on the cell key — the scalable
    shape; recall is traded for the O(n) shuffle."""
    e = table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        quantize(F.col("embedding")).alias("qe"),
        sign_bucket(F.col("embedding")).alias("cell"),
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("q_emb"), "cell"
    )
    scored = (
        v.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            int_dot(F.col("q_emb"), F.col("qe")).alias("dot_q"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "dot_q")
    )


@register(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label, {_SQL_DOT.replace("b.e", "b.e")} AS dot_q
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_SQL_DOT} >= 95000000
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicates: label-blocked pair scan,
    quantized dot ≥ 0.95·QUANT² (unit-norm ⇒ cosine ≥ ~0.95). The
    blocking key bounds the pair space exactly like LSH bands do for
    text."""
    e = table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", quantize(F.col("embedding")).alias("qe"))
    a = v.select(F.col("vec_id").alias("vec_a"), "label", F.col("qe").alias("ea"))
    b = v.select(F.col("vec_id").alias("vec_b"), "label", F.col("qe").alias("eb"))
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "label", int_dot(F.col("ea"), F.col("eb")).alias("dot_q"))
        .filter(F.col("dot_q") >= 95_000_000)
    )
