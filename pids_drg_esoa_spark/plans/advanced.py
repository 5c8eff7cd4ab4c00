"""Advanced relational surface: statistical aggregates, subqueries,
grouping sets, richer windows, unpivot, cross join, max_by.

Beyond the reference's inventory (SURVEY §2.4 notes it has no
grouping sets / stats aggregates) — engine-completeness a user of a
100 TB analytics engine expects. Some plans use the SQL API via temp
views (Catalyst produces identical plans either way; this also
exercises spark.sql end-to-end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import register_views, table
from .catalog import register


@register(
    "a_stats_battery",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS price_stddev,
           round(var_samp(l_quantity), 4)         AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a_stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate battery (stddev/var/corr/covar) — one
    hash-agg pass with numerically-stable partial merges."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
    )


@register(
    "a9_max_by_unique_key",
    oracle="""
    SELECT c_nationkey,
           max_by(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 1000000000000 + c_custkey)
               AS richest_customer,
           round(max(c_acctbal), 2) AS max_balance
    FROM customer
    GROUP BY c_nationkey
    """,
)
def a9_max_by_unique_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 max-by (reference pipeline.py:262-273 latest-file selection)
    with a composite unique ordering key so ties cannot make the
    answer engine-dependent. The custkey stride is 1e12, not 1e6:
    TPC-H custkey = 150000*SF, so a 1e6 stride collides past SF~7
    (a tied-balance pair could out-rank a higher balance); 1e12 holds
    to SF ~6.6M while round(acctbal*100)*1e12 stays under 2^63."""
    c = table(spark, sf_dir, "customer")
    key = (
        F.round(F.col("c_acctbal") * 100).cast("bigint") * 1_000_000_000_000
        + F.col("c_custkey")
    )
    # r13 (guide §5): max_by with a STRING value keeps an immutable
    # string in the aggregation buffer, which knocks the whole agg off
    # HashAggregate onto SortAggregate — the full customer relation was
    # sorted (per partition, partial AND final) before aggregating.
    # The key is already unique (custkey digits), so aggregate max(key)
    # (all-mutable buffer → HashAggregate with map-side partials),
    # recover the winning custkey from the key's low digits — pmod,
    # not %, because round(acctbal*100) goes negative for TPC-H's
    # negative balances while the custkey digits stay in [0, 1e12) —
    # and broadcast the |nations|-row result back onto customer to
    # fetch the name. Costs a second pushed-down scan of two customer
    # columns; removes the full-relation sort. max_by(name, unique
    # key) ≡ name of the max-key row, and custkey is customer's
    # primary key, so the join-back is exact.
    best = c.groupBy("c_nationkey").agg(
        F.max(key).alias("best_key"),
        F.round(F.max("c_acctbal"), 2).alias("max_balance"),
    ).withColumn("best_custkey", F.pmod(F.col("best_key"), F.lit(1_000_000_000_000)))
    names = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        F.broadcast(best)
        .join(names, best.best_custkey == names.c_custkey)
        .select(
            "c_nationkey",
            F.col("c_name").alias("richest_customer"),
            "max_balance",
        )
    )


@register(
    "g_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def g_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with grouping() disambiguation of real vs
    subtotal NULLs."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '<all>') AS returnflag,
               coalesce(l_linestatus, '<all>') AS linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
               count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "sq_exists_correlated",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
)
def sq_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery (decorrelated by Catalyst to a
    semi-join)."""
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderkey, o_orderstatus
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        """
    )


@register(
    "sq_scalar_subquery",
    oracle="""
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > 1.5 * (SELECT avg(c_acctbal) FROM customer)
    """,
)
def sq_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (global aggregate reused per
    row — one extra job, broadcast as a literal)."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer
        WHERE c_acctbal > 1.5 * (SELECT avg(c_acctbal) FROM customer)
        """
    )


@register(
    "j_cross_join_enumerate",
    oracle="""
    SELECT r.r_name, s.status, CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
    LEFT JOIN (
        SELECT r2.r_name AS rname, o.o_orderstatus AS status, count(*) AS n
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        GROUP BY 1, 2
    ) o ON o.rname = r.r_name AND o.status = s.status
    """,
)
def j_cross_join_enumerate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join to enumerate the full (region × status) grid, left-
    filled with observed counts — the dense-report shape (zero rows
    preserved)."""
    r, s_, o, c, n = (table(spark, sf_dir, t) for t in ("region", "orders", "orders", "customer", "nation"))
    statuses = s_.select(F.col("o_orderstatus").alias("status")).distinct()
    grid = r.crossJoin(statuses)
    counts = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r.select(F.col("r_regionkey").alias("rk"), F.col("r_name").alias("rname")),
              F.col("n_regionkey") == F.col("rk"))
        .groupBy("rname", F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        grid.join(counts, (grid.r_name == counts.rname) & (grid.status == counts.status), "left")
        .select(
            "r_name",
            grid.status.alias("status"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_orders"),
        )
    )


@register(
    "w_distribution_battery",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(4) OVER w AS BIGINT)       AS balance_quartile,
           round(percent_rank() OVER w, 6)        AS pct_rank,
           round(cume_dist() OVER w, 6)           AS cume,
           CAST(rank() OVER w AS BIGINT)          AS rnk,
           CAST(dense_rank() OVER w AS BIGINT)    AS drnk
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def w_distribution_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window battery: ntile / percent_rank / cume_dist /
    rank / dense_rank over a total ordering."""
    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("bigint").alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@register(
    "w_first_last_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           first_value(l_partkey) OVER w AS first_part,
           last_value(l_partkey)  OVER w AS last_part,
           CAST(count(*) OVER w AS BIGINT) AS n_lines
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w_first_last_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last_value with an explicit full frame (the default frame
    would silently truncate last_value at CURRENT ROW). (l_orderkey,
    l_linenumber) is NOT unique in this data — the ordering carries
    enough keys that tied rows agree on the output columns."""
    l = table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_partkey").over(w).alias("first_part"),
        F.last("l_partkey").over(w).alias("last_part"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_lines"),
    )


@register(
    "p_unpivot_stack",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, status, CAST(n AS BIGINT) AS n FROM (
        SELECT o_orderpriority, 'open' AS status, n_open AS n FROM wide
        UNION ALL SELECT o_orderpriority, 'filled', n_filled FROM wide
        UNION ALL SELECT o_orderpriority, 'partial', n_partial FROM wide
    )
    """,
)
def p_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (stack) of a wide aggregate back to long form."""
    o = table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_filled"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("n_partial"),
    )
    return wide.selectExpr(
        "o_orderpriority",
        "stack(3, 'open', n_open, 'filled', n_filled, 'partial', n_partial) as (status, n)",
    ).select("o_orderpriority", "status", F.col("n").cast("bigint").alias("n"))


@register(
    "j_json_agg_per_type",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def j_json_agg_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation: JSON field extracted (JVM-side)
    then aggregated per type — schema-on-read over a props column."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).cast("bigint").alias("k_total"),
        F.max(k).cast("bigint").alias("k_max"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "arr_posexplode_positions",
    oracle="""
    WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)
    SELECT pos, token, count(*) AS n
    FROM (
        SELECT CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
        FROM t, unnest(generate_series(1, len(toks))) AS u(i)
    )
    GROUP BY pos, token
    """,
)
def arr_posexplode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token with its position (0-based) — positional
    vocabulary statistics."""
    p = table(spark, sf_dir, "part")
    return (
        p.select(F.posexplode(F.split("p_name", " ")).alias("pos", "token"))
        .groupBy(F.col("pos").cast("bigint").alias("pos"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
