"""Core relational operators (SURVEY.md §2.1-§2.6), oracle-gated.

Each query is the idiomatic-Spark re-expression of a reference
operator family; docstrings cite the reference site it covers. All
plans are declarative DataFrame chains — predicate pushdown, column
pruning and join-strategy selection are Catalyst's job. Small dims
(region/nation/supplier, derived vocab tables) are broadcast
explicitly: at 100 TB fact scale those joins must never shuffle the
fact side.
"""

from __future__ import annotations

from decimal import Decimal as _Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import table
from .catalog import register


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (agg battery A1/A7).
# ---------------------------------------------------------------------------
@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate battery over a pushed-down scan — the coverage
    metrics pattern (reference runners.py:122-147). Map-side partial
    aggregation keeps the shuffle at |groups| rows, so the plan is
    scan-bound at any scale."""
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# §2.1 scans + §2.2 projections / filters
# ---------------------------------------------------------------------------
@register(
    "s1_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def s1_scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with filter + projection pushed to the source
    (reference CSV scans S1/S2, prepare.py:56,139). At 100 TB the scan
    reads 4 of 11 columns and row groups are pruned by the predicate."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") > 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    )


@register(
    "p1_derive_columns",
    oracle="""
    SELECT p_partkey,
           regexp_replace(lower(p_name), '[^a-z0-9]+', '_', 'g')  AS name_slug,
           lower(p_type)                                          AS type_norm,
           CASE WHEN p_size < 15 THEN 'small'
                WHEN p_size < 35 THEN 'medium'
                ELSE 'large' END                                  AS size_class,
           CAST(round(p_retailprice * 100) AS BIGINT)             AS price_cents
    FROM part
    """,
)
def p1_derive_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch column derivation — slug ids, normalization, CASE buckets
    (reference prepare.py:63-117 P1, text_utils.py:121-124 F4 slug_id,
    P8 CASE). Pure narrow transformations: no shuffle at any scale."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_replace(F.lower("p_name"), "[^a-z0-9]+", "_").alias("name_slug"),
        F.lower("p_type").alias("type_norm"),
        F.when(F.col("p_size") < 15, "small")
        .when(F.col("p_size") < 35, "medium")
        .otherwise("large")
        .alias("size_class"),
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
    )


@register(
    "p4_range_antifilter",
    oracle="""
    SELECT p_partkey, p_name, p_size
    FROM part
    WHERE p_size NOT BETWEEN 20 AND 40
      AND p_name IS NOT NULL AND p_name <> ''
    """,
)
def p4_range_antifilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range anti-filter + null/empty guards (reference
    prepare_labs.py:13-14,42-47 P4/P5 — the ITEM_NUMBER 1540-1896
    exclusion band)."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        ~F.col("p_size").between(20, 40) & F.col("p_name").isNotNull() & (F.col("p_name") != "")
    ).select("p_partkey", "p_name", "p_size")


@register(
    "p7_explode_tokens",
    oracle="""
    SELECT token, count(*) AS n_parts
    FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
    GROUP BY token
    """,
)
def p7_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode a delimited column into rows (reference prepare.py:122
    P7 — one row per allowed route), then frequency-count (A4)."""
    p = table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------
@register(
    "j1_left_join_fact_dim",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus, o.o_orderpriority,
           round(l.l_extendedprice * (1 - l.l_discount), 4) AS revenue
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_quantity >= 48
    """,
)
def j1_left_join_fact_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join merging enrichment back onto fact rows on a key
    (reference runners.py:79,100-104 J1, 202-230 J2). Shuffle join on
    the fact key; AQE picks broadcast when the filtered side is small.
    revenue rounds at 4dp: the product of two 2dp values is exact at
    4dp, so no round-half ties (Spark/DuckDB tie rules differ on
    doubles)."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 48)
    o = table(spark, sf_dir, "orders")
    return l.join(o, l.l_orderkey == o.o_orderkey, "left").select(
        "l_orderkey",
        "l_linenumber",
        "o_orderstatus",
        "o_orderpriority",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


@register(
    "j3_broadcast_dim_chain",
    oracle="""
    SELECT r.r_name AS region_name,
           count(*) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j3_broadcast_dim_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dim chain as broadcast hash joins — the Spark
    replacement for the reference's in-memory DuckDB lookup tables +
    indexes (tagger.py:161-205 J3, S5). Explicit broadcast(): the fact
    side never shuffles regardless of scale."""
    c, n, r = (table(spark, sf_dir, t) for t in ("customer", "nation", "region"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )


@register(
    "j4_semi_join",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice_r
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    """,
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join = the reference's batched IN-list lookup
    (lookup.py:254-277 J4) without the manual batching."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    return o.join(c, o.o_custkey == c.c_custkey, "left_semi").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice_r")
    )


@register(
    "j12_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def j12_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join = the reference's `~isin(existing)` add-if-missing
    pattern (build_unified_reference.py:176-257 J12/U2)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "j12_anti_join_planted",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_custkey IS NOT NULL
    )
    """,
)
def j12_anti_join_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-empty twin of ``j12_anti_join``: on the synthetic corpus
    every custkey has at least one order, so the plain anti set is
    data-inherently empty and its green oracle entry verifies column
    names only (0 = 0). Restricting the probe side to URGENT orders
    guarantees a populated anti set (203 rows at sf0.01, 18 at
    sf0.001 — measured) while keeping the identical left_anti plan
    shape, so the hash now gates the join semantics too."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "j5_prefix_theta_join",
    oracle="""
    WITH prefixes AS (
        SELECT DISTINCT substring(p_brand, 1, 7) AS brand_prefix FROM part
    )
    SELECT x.brand_prefix, count(*) AS n_parts, min(p.p_partkey) AS min_partkey
    FROM prefixes x JOIN part p ON p.p_brand LIKE x.brand_prefix || '%'
    GROUP BY x.brand_prefix
    """,
)
def j5_prefix_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix (LIKE 'tok%') theta-join against a small vocabulary —
    the reference's prefix/contains candidate lookup
    (lookup.py:117-161 J5). Non-equi predicate → broadcast
    nested-loop join, correct strategy because the vocab side is tiny;
    genuinely theta since 'Brand#1' also prefixes 'Brand#13'."""
    p = table(spark, sf_dir, "part")
    prefixes = p.select(F.substring("p_brand", 1, 7).alias("brand_prefix")).distinct()
    joined = F.broadcast(prefixes).join(p, F.col("p_brand").startswith(F.col("brand_prefix")))
    return joined.groupBy("brand_prefix").agg(
        F.count(F.lit(1)).alias("n_parts"), F.min("p_partkey").alias("min_partkey")
    )


@register(
    "j6_levenshtein_fuzzy_join",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS edit_dist
    FROM nation a JOIN nation b
      ON a.n_name < b.n_name AND levenshtein(a.n_name, b.n_name) <= 2
    """,
)
def j6_levenshtein_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity self-join with an edit-distance predicate — the
    Catalyst-expressible core of the reference's rapidfuzz fallback
    (lookup.py:164-220 J6; exact rapidfuzz ratio semantics live in
    functions.fuzzy). Broadcast nested-loop on a small dim; at scale
    the blocked MinHash-LSH operator (operators.dedup) is the path."""
    n = table(spark, sf_dir, "nation")
    a = n.select(F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(F.broadcast(b), (F.col("name_a") < F.col("name_b")) & (dist <= 2))
        .select("name_a", "name_b", dist.cast("bigint").alias("edit_dist"))
    )


@register(
    "j8_sorted_set_key",
    oracle="""
    SELECT array_to_string(list_sort(string_split(p_name, ' ')), '|') AS component_key,
           count(*)       AS n_parts,
           min(p_partkey) AS min_partkey,
           max(p_partkey) AS max_partkey
    FROM part
    GROUP BY component_key
    """,
)
def j8_sorted_set_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive combination key: sort components, pipe-join,
    group — the reference's mixture component_key
    (build_unified_reference.py:486-500, tagger.py:309-360 J8)."""
    p = table(spark, sf_dir, "part")
    key = F.array_join(F.array_sort(F.split("p_name", " ")), "|").alias("component_key")
    return p.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.min("p_partkey").alias("min_partkey"),
        F.max("p_partkey").alias("max_partkey"),
    )


@register(
    "j11_two_level_lookup_coalesce",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           coalesce(p.p_name, s.s_name, 'UNRESOLVED') AS resolved_name,
           CASE WHEN p.p_name IS NOT NULL THEN 'primary'
                WHEN s.s_name IS NOT NULL THEN 'fallback'
                ELSE 'unmatched' END AS match_source
    FROM lineitem l
    LEFT JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_size > 25
    LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def j11_two_level_lookup_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary lookup with fallback + coalesce precedence and a match
    provenance label — the labs master→Diagnostics cascade
    (match_labs.py:18-66 J11)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") > 25)
    s = table(spark, sf_dir, "supplier")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "left")
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.coalesce("p_name", "s_name", F.lit("UNRESOLVED")).alias("resolved_name"),
            F.when(F.col("p_name").isNotNull(), "primary")
            .when(F.col("s_name").isNotNull(), "fallback")
            .otherwise("unmatched")
            .alias("match_source"),
        )
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------
@register(
    "a1_table_stats",
    oracle="""
    SELECT count(*)                   AS n_rows,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey)  AS n_parts,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    """,
)
def a1_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT / COUNT DISTINCT / MIN / MAX table stats (reference
    tagger.py:170-203 A1)."""
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "a2_group_count_ordered",
    oracle="""
    SELECT p_brand, p_type, count(*) AS n
    FROM part
    GROUP BY p_brand, p_type
    """,
)
def a2_group_count_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key frequency table — brand→generic preference counting
    (tagger.py:243-249 A2, runners.py value_counts A4)."""
    p = table(spark, sf_dir, "part")
    return p.groupBy("p_brand", "p_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "a3_string_agg_distinct",
    oracle="""
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segments
    FROM customer
    GROUP BY c_nationkey
    """,
)
def a3_string_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipe-aggregated distinct values per key — the reference's
    synonym aggregation (build_unified_reference.py:296-306 A3,
    serialize_salt_list F7). Sorted for determinism."""
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias("segments")
    )


@register(
    "a5_dedup_deterministic",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber
    FROM (
        SELECT l_orderkey, l_partkey, l_linenumber,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber, l_partkey) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
)
def a5_dedup_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset dedup with an explicit survivor ordering — replaces the
    reference's order-dependent drop_duplicates(keep='first')
    (build_unified_reference.py:459 A5; SURVEY §7 'order-dependence')
    with a deterministic window rank-1."""
    l = table(spark, sf_dir, "lineitem")
    # survivor = min over the explicit (l_linenumber, l_partkey)
    # ordering. r13: a STRUCT min has an immutable aggregation buffer,
    # which knocks the whole aggregation off HashAggregate onto
    # SortAggregate — at scale that sorts the full lineitem relation
    # twice (before partial and final agg). Encoding the ordering as
    # ONE decimal(38,0) — ln·10¹⁹ + pk, a monotone bijection for
    # 0 ≤ pk < 10¹⁹ and ln ≥ 0 (both hold: TPC-H keys are positive
    # bigints) — keeps every buffer slot mutable, so the plan is a
    # HashAggregate with map-side partial aggregation and no sorts.
    # min_by ties are impossible (the encoding is injective), so the
    # survivor is bit-identical to the struct-min shape.
    _l = F.lit(_Decimal(10**19)).cast("decimal(20,0)")
    enc = F.col("l_linenumber").cast("decimal(19,0)") * _l + F.col(
        "l_partkey"
    ).cast("decimal(19,0)")
    return (
        l.groupBy("l_orderkey")
        .agg(
            F.min_by("l_partkey", enc).alias("l_partkey"),
            F.min("l_linenumber").alias("l_linenumber"),
        )
        .select("l_orderkey", "l_partkey", "l_linenumber")
    )


@register(
    "a8_topk_with_ties_broken",
    oracle="""
    SELECT p_type, count(*) AS n
    FROM part
    GROUP BY p_type
    ORDER BY n DESC, p_type ASC
    LIMIT 5
    """,
)
def a8_topk_with_ties_broken(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k frequency with explicit tie-break (verification script's
    Counter top-k, verify_esoa_matching.py:34-48 A8 / W5 LIMIT)."""
    p = table(spark, sf_dir, "part")
    return (
        p.groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("p_type"))
        .limit(5)
    )


@register(
    "a_rollup_coverage",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a_rollup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with subtotal labels — beyond the reference (SURVEY
    §2.4: 'no grouping sets/cube/rollup anywhere'), required engine
    surface for coverage-style reporting at scale."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@register(
    "a_pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS status_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS status_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def a_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide histogram) — reference builds these by hand for
    run_summary.md reason tables (runners.py:126,263 A4)."""
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).cast("bigint").alias("status_o"),
        F.coalesce(F.col("F"), F.lit(0)).cast("bigint").alias("status_f"),
        F.coalesce(F.col("P"), F.lit(0)).cast("bigint").alias("status_p"),
    )


# ---------------------------------------------------------------------------
# §2.5 windows / sorts / top-k
# ---------------------------------------------------------------------------
@register(
    "w1_rank1_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS best_price
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def w1_rank1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-candidate selection: rank-1 per group over an explicit
    multi-key ordering — the reference's select_best_candidate tuple
    sort (scoring.py:203-387 W1), made deterministic with a final
    unique key exactly as SURVEY §7 requires."""
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("best_price"))
    )


@register(
    "w5_topn_per_key",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM (
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
        FROM lineitem
    ) WHERE rn <= 3
    """,
)
def w5_topn_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key LIMIT n (reference's per-lookup LIMIT, lookup.py:129-159
    W5), expressed as a grouped sort_array+slice rather than a window:
    a window must SORT every shuffle partition by (key, price), while
    the hash aggregate sorts each ≤7-row group in isolation — ~20%
    faster at sf0.1, identical rows, and the shape keeps map-side
    partial batching at scale. Ordering struct = (−price, linenumber)
    so ascending array_sort yields price DESC, linenumber ASC — the
    same total order the window form used (prices > 0, so the
    negation is exact)."""
    l = table(spark, sf_dir, "lineitem")
    s = F.struct(
        (-F.col("l_extendedprice")).alias("np"), F.col("l_linenumber").alias("ln")
    )
    top = F.slice(F.array_sort(F.collect_list(s)), 1, 3)
    return (
        l.groupBy("l_orderkey")
        .agg(top.alias("t"))
        .select("l_orderkey", F.explode("t").alias("e"))
        .select(
            "l_orderkey",
            F.col("e.ln").alias("l_linenumber"),
            F.round(-F.col("e.np"), 2).alias("price"),
        )
    )


@register(
    "w_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber,
                        l_partkey, l_quantity, l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
    FROM lineitem
    """,
)
def w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per partition over a total ordering — cumulative
    window surface (no reference analog; engine completeness).
    (orderkey, linenumber) is not unique here, so the ordering extends
    to the quantity-bearing columns: any rows still tied are identical
    in every ordering column, which makes the prefix-sum multiset
    engine-independent."""
    l = table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy(
            "l_shipdate", "l_orderkey", "l_linenumber",
            "l_partkey", "l_quantity", "l_extendedprice",
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    )


# ---------------------------------------------------------------------------
# §2.6 set operations
# ---------------------------------------------------------------------------
@register(
    "u1_union_dedupe",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def u1_union_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION + dedupe (reference concat+drop_duplicates U1,
    build_unified_reference.py:186-241)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "u2_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def u2_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — nations with customers but no suppliers (reference
    ~isin U2)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "u2_except_planted",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
    """,
)
def u2_except_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-empty twin of ``u2_except``: every customer nation has a
    supplier on the synthetic corpus, so the plain EXCEPT is
    data-inherently empty (0 = 0 proves schema only). Thinning the
    subtrahend to high-balance suppliers leaves nations without one
    (18 rows at sf0.01, 25 at sf0.001 — measured), gating the actual
    set-difference semantics with the same ``subtract`` plan."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


@register(
    "u3_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — overlap of two key sets (reference diagnostics
    overlap U3, verify_esoa_matching.py:99-123)."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "a6_dedup_compute_joinback",
    oracle="""
    WITH distinct_types AS (
        SELECT DISTINCT p_type FROM part
    ),
    computed AS (
        SELECT p_type, md5(lower(p_type)) AS type_fingerprint FROM distinct_types
    )
    SELECT p.p_partkey, p.p_type, c.type_fingerprint
    FROM part p JOIN computed c ON p.p_type = c.p_type
    """,
)
def a6_dedup_compute_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 dedup-then-join-back: run the expensive derivation once per
    DISTINCT value, join results back to all rows — the reference's
    tag-unique-texts optimization (tagger.py:436-448,
    runners.py:192-230) as an explicit plan shape. At 100 TB this is
    the difference between |rows| and |distinct| UDF invocations."""
    p = table(spark, sf_dir, "part")
    computed = (
        p.select("p_type").distinct()
        .withColumn("type_fingerprint", F.md5(F.lower("p_type")))
    )
    return p.join(F.broadcast(computed), "p_type").select(
        "p_partkey", "p_type", "type_fingerprint"
    )


@register(
    "j7_brand_swap_lookup",
    oracle="""
    WITH brand_map AS (
        SELECT DISTINCT p_brand AS brand, first_value(p_type) OVER (
            PARTITION BY p_brand ORDER BY p_partkey) AS canonical
        FROM part
    )
    SELECT p.p_partkey,
           p.p_brand,
           coalesce(m.canonical, p.p_brand) AS resolved
    FROM part p LEFT JOIN brand_map m ON p.p_brand = m.brand
    """,
)
def j7_brand_swap_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 dict-index swap join: token → canonical replacement via a
    broadcast map with passthrough for misses (the brand→generic swap,
    lookup.py:34-49, tagger.py:624-631). The map itself is derived
    deterministically (first-wins by partkey)."""
    p = table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy("p_partkey")
    brand_map = (
        p.withColumn("canonical", F.first("p_type").over(w))
        .select(F.col("p_brand").alias("brand"), "canonical")
        .distinct()
    )
    return p.join(F.broadcast(brand_map), p.p_brand == F.col("brand"), "left").select(
        "p_partkey",
        "p_brand",
        F.coalesce("canonical", "p_brand").alias("resolved"),
    )


@register(
    "f8_parenthetical_planted",
    oracle="""
    SELECT doc_id, source AS first_paren, CAST(1 AS BIGINT) AS n_parens
    FROM documents
    """,
)
def f8_parenthetical_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 parenthetical extraction (text_utils.py:143-165) under the
    planted-round-trip oracle: wrap the source column in parens inside
    the text, extract it back with the real extractor."""
    from ..functions.text import parenthetical_phrases

    d = table(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id", "source", F.concat("text", F.lit(" ("), "source", F.lit(")")).alias("t")
    )
    phrases = parenthetical_phrases(F.col("t"))
    return planted.select(
        "doc_id",
        F.element_at(phrases, 1).alias("first_paren"),
        F.size(phrases).cast("bigint").alias("n_parens"),
    )
