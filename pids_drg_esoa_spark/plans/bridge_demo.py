"""Candidate-generation bridge: the reference's Part 4 as ONE plan.

Reference shape (runners.py:1012-1094 J9, :792-1335 J10, :959-1010 W3,
:1337-1383 reason labels): build a token index over the catalog,
generate candidates per input row, apply typed compatibility
predicates, pick the best by an explicit rank tuple, and label the
failure reason with a fixed priority.

Re-expressed Spark-first on the synthetic schema:
- input rows   = lineitem (its part's name = the free-text description,
                 l_quantity = the requested dose)
- catalog      = part     (candidate space)
- J9 candidate gen = explode name tokens → equi-join token index,
  capped at 20 candidates per token by ascending partkey — the
  reference's LIMIT-per-lookup (W5) made deterministic; caps bound
  the fan-out at 100 TB exactly like its candidate-space reduction
  (docs/annex_f_atc_matching.md:45-52).
- J10 predicates = dose window (|size − qty| ≤ 5) and form equality
  (p_type class).
- W3 rank        = exact-name ⊳ shared-token count ⊳ dose distance ⊳
  partkey (every key explicit — SURVEY §7 tie-break parity).
- reason label   = matched ⊳ dose_mismatch ⊳ form_mismatch ⊳
  no_candidate (dose outranks form, mirroring runners.py:1337-1383).

The candidate index is lineitem-independent, so it is built once per
distinct catalog part and joined to the fact — the dedup-then-join-
back optimization the reference hand-rolls (A6).
"""

from __future__ import annotations

from decimal import Decimal as _Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..sources.tables import table
from .catalog import register

CAND_PER_TOKEN = 20
DOSE_TOL = 5

_ORACLE = f"""
WITH src_tok AS (
    SELECT p_partkey AS src_partkey, p_name AS src_name, p_type AS src_type,
           unnest(string_split(p_name, ' ')) AS tok
    FROM part
),
index_exploded AS (
    SELECT unnest(string_split(p_name, ' ')) AS tok,
           p_partkey AS cand_partkey, p_name AS cand_name,
           p_type AS cand_type, p_size AS cand_size
    FROM part
),
index_tok AS (
    SELECT tok, cand_partkey, cand_name, cand_type, cand_size
    FROM (
        SELECT *, row_number() OVER (PARTITION BY tok ORDER BY cand_partkey) AS rn
        FROM index_exploded
    ) WHERE rn <= {CAND_PER_TOKEN}
),
cand AS (
    SELECT s.src_partkey, s.src_name, s.src_type,
           i.cand_partkey, i.cand_name, i.cand_type, i.cand_size,
           count(*) AS n_shared
    FROM src_tok s JOIN index_tok i ON s.tok = i.tok
    GROUP BY ALL
),
scored AS (
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
           c.cand_partkey, c.cand_size, c.n_shared,
           (c.cand_name = c.src_name)                    AS is_exact,
           (abs(c.cand_size - l.l_quantity) <= {DOSE_TOL}) AS dose_ok,
           (c.cand_type = c.src_type)                    AS form_ok
    FROM lineitem l JOIN cand c ON l.l_partkey = c.src_partkey
),
ranked AS (
    SELECT *, row_number() OVER (
               PARTITION BY l_orderkey, l_linenumber
               ORDER BY is_exact DESC, n_shared DESC,
                        abs(cand_size - l_quantity) ASC, cand_partkey ASC) AS rn
    FROM scored WHERE dose_ok AND form_ok
),
flags AS (
    SELECT l_orderkey, l_linenumber,
           max(CASE WHEN dose_ok AND form_ok THEN 1 ELSE 0 END) AS has_valid,
           max(CASE WHEN form_ok THEN 1 ELSE 0 END)             AS has_form,
           count(*)                                             AS n_cand
    FROM scored GROUP BY l_orderkey, l_linenumber
)
SELECT l.l_orderkey, l.l_linenumber,
       r.cand_partkey AS best_partkey,
       CASE WHEN f.has_valid = 1 THEN 'matched'
            WHEN f.has_form = 1  THEN 'dose_mismatch'
            WHEN f.n_cand > 0    THEN 'form_mismatch'
            ELSE 'no_candidate' END AS reason
FROM lineitem l
LEFT JOIN flags f ON f.l_orderkey = l.l_orderkey AND f.l_linenumber = l.l_linenumber
LEFT JOIN ranked r ON r.l_orderkey = l.l_orderkey AND r.l_linenumber = l.l_linenumber
                  AND r.rn = 1
"""


@register("j9_j10_candidate_bridge", oracle=_ORACLE)
def j9_j10_candidate_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-4 bridge plan: token-index candidate generation (J9) →
    typed compatibility predicates (J10) → explicit rank tuple (W3) →
    priority reason labels. One shuffle to group candidates, one
    window, broadcast dims; the token index is fact-independent."""
    part = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")

    src_tok = part.select(
        F.col("p_partkey").alias("src_partkey"),
        F.col("p_name").alias("src_name"),
        F.col("p_type").alias("src_type"),
        F.explode(F.split("p_name", " ")).alias("tok"),
    )
    index_tok = (
        part.select(
            F.explode(F.split("p_name", " ")).alias("tok"),
            F.col("p_partkey").alias("cand_partkey"),
            F.col("p_name").alias("cand_name"),
            F.col("p_type").alias("cand_type"),
            F.col("p_size").alias("cand_size"),
        )
        .withColumn("rn", F.row_number().over(W.partitionBy("tok").orderBy("cand_partkey")))
        .filter(F.col("rn") <= CAND_PER_TOKEN)
        .drop("rn")
    )
    # Token keys are Zipfian (common words hit every doc): salt the
    # fact side of the token join so hot tokens spread over 8 tasks
    # instead of one straggler — the index side is capped at
    # CAND_PER_TOKEN rows per token, so 8× replication is bounded.
    cand = (
        salted_join(src_tok, index_tok, "tok", n_salts=8)
        .groupBy(
            "src_partkey", "src_name", "src_type",
            "cand_partkey", "cand_name", "cand_type", "cand_size",
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # No broadcast hint on cand: it scales with the CATALOG (|part| ×
    # avg candidates), not a fixed dim — at 100× sf a forced broadcast
    # OOMs. AQE picks broadcast at small sf on its own.
    scored = li.join(cand, li.l_partkey == cand.src_partkey).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "cand_partkey",
        "cand_size",
        "n_shared",
        (F.col("cand_name") == F.col("src_name")).alias("is_exact"),
        (F.abs(F.col("cand_size") - F.col("l_quantity")) <= DOSE_TOL).alias("dose_ok"),
        (F.col("cand_type") == F.col("src_type")).alias("form_ok"),
    )
    # ONE grouped pass over the high-fanout candidate relation — not a
    # window (full sort, measured 7× slower at sf0.1) and not two
    # grouped passes (the li⋈cand join would execute twice). rank-1 by
    # an ordering tuple ≡ max_by over the same tuple; the key is null
    # for invalid candidates, and max_by skips null ordering keys, so
    # best_partkey ranges over valid rows only.
    # Partial (map-side) aggregation crushes the fanout pre-shuffle.
    #
    # r13: the tuple was a STRUCT — immutable aggregation buffer, so
    # the whole pass planned as SortAggregate (full sort of the
    # li×cand fanout before partial AND final agg — the wrong shape at
    # 100 TB). Encoded instead as ONE injective decimal(38,0), digit
    # layout (high → low):
    #   d37..d34  is_exact        (0/1 — one digit used, headroom 3)
    #   d33..d19  n_shared        (count of shared-token pairs; ≤
    #                              tokens(src)·tokens(cand) ≪ 10¹⁵)
    #   d18       5 − |Δdose|     (valid ⇒ |Δdose| ≤ DOSE_TOL = 5, and
    #                              it is an exact small integer:
    #                              cand_size is int and l_quantity is
    #                              integral by the TPC-H dbgen contract
    #                              — 1..50, checked across all testdata
    #                              SFs; the bigint cast is exact)
    #   d17..d0   10¹⁸ − partkey  (positive: partkey ∈ [1, 10¹⁸))
    # Every component is monotone in the original tuple field and the
    # partkey slot is injective per group, so ties are impossible and
    # the max_by winner is bit-identical to the struct shape — both
    # queries re-verified hash-exact vs the DuckDB oracle. All buffer
    # slots mutable ⇒ HashAggregate, no sorts.
    valid = F.col("dose_ok") & F.col("form_ok")
    _d = lambda n: F.lit(_Decimal(n)).cast("decimal(38,0)")  # noqa: E731
    rank_key = F.when(
        valid,
        F.col("is_exact").cast("decimal(38,0)") * _d(10**34)
        + F.col("n_shared").cast("decimal(38,0)") * _d(10**19)
        + (
            _d(5)
            - F.abs(F.col("cand_size") - F.col("l_quantity")).cast("bigint").cast("decimal(38,0)")
        )
        * _d(10**18)
        + (_d(10**18) - F.col("cand_partkey").cast("decimal(38,0)")),
    )
    summary = scored.groupBy("l_orderkey", "l_linenumber").agg(
        F.max_by("cand_partkey", rank_key).alias("best_partkey"),
        F.max(valid.cast("int")).alias("has_valid"),
        F.max(F.col("form_ok").cast("int")).alias("has_form"),
        F.count(F.lit(1)).alias("n_cand"),
    )
    return (
        li.select("l_orderkey", "l_linenumber")
        .join(summary, ["l_orderkey", "l_linenumber"], "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            "best_partkey",
            F.when(F.col("has_valid") == 1, "matched")
            .when(F.col("has_form") == 1, "dose_mismatch")
            .when(F.col("n_cand") > 0, "form_mismatch")
            .otherwise("no_candidate")
            .alias("reason"),
        )
    )
