"""Temporal operators: as-of join, range join, sessionization, funnel.

The reference has zero temporal logic (SURVEY §2.9) — these are the
engine-completeness operators a claims/event pipeline needs at scale.
Spark lacks native as-of/range joins; both are expressed as an
equi-join on the entity key with a residual range predicate plus a
window argmax — the strategy that survives 100 TB because the shuffle
is on the equi key, and skewed keys split under AQE.

``events.ts`` is int64 nanoseconds on the Spark side (see
sources.tables) — all time arithmetic here is exact integer ns,
matched in the oracles via ``epoch_ns(ts)``.
"""

from __future__ import annotations

from decimal import Decimal as _Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import table
from .catalog import register

NS_PER_S = 1_000_000_000


@register(
    "t_asof_join_latest_order",
    oracle="""
    SELECT event_id, user_id, event_type, o_orderkey AS asof_orderkey
    FROM (
        SELECT e.event_id, e.user_id, e.event_type, o.o_orderkey,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e JOIN orders o
          ON e.user_id = o.o_custkey
         AND epoch_us(o.o_orderdate) * 1000 <= epoch_ns(e.ts)  -- naive==tz-free
    ) WHERE rn = 1
    """,
)
def t_asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest order at-or-before each event, per user.
    Equi-join on the user key with a residual time predicate, then
    window rank-1 with a deterministic final key. Equivalent to
    DuckDB's ASOF JOIN (tie-broken); scales because the shuffle is on
    user_id, not time."""
    e = table(spark, sf_dir, "events")
    o = table(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ at date granularity; datediff(date)
    # is timezone-free in both engines (unix_micros would shift with
    # the session tz, which the driver does not pin).
    order_ns = (
        F.datediff(o.o_orderdate.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
        * (86400 * NS_PER_S)
    )
    joined = e.join(o, (e.user_id == o.o_custkey) & (order_ns <= e.ts), "inner")
    # rank-1 as a grouped max_by, NOT a window: the per-user fanout is
    # |orders(user)| per event (~1000× at sf0.1), and a window must
    # sort that whole relation, while max_by gets map-side partial
    # aggregation that crushes it before the exchange (SCALE.md
    # measured lesson: groupBy beats window 7× on high-fanout rank-1).
    # r13: the former struct ordering key forced SortAggregate (struct
    # buffers are immutable → no HashAggregate), which sorted the full
    # event×order fanout before the partial agg. The ordering is now
    # ONE decimal(38,0) — day(o_orderdate)·10¹⁹ + o_orderkey, a
    # monotone bijection of (o_orderdate, o_orderkey) for
    # 0 ≤ o_orderkey < 10¹⁹ (orderkeys are non-negative bigints; the
    # 10¹⁹ stride exceeds any bigint). The day number reuses the same
    # timezone-free datediff arithmetic the join predicate above is
    # built on — o_orderdate is date-granular, which that predicate
    # (and the oracle) already rely on. Every buffer slot is mutable,
    # the plan is a HashAggregate, and max_by ties are impossible
    # (injective encoding), so the winner is bit-identical.
    _stride = F.lit(_Decimal(10**19)).cast("decimal(20,0)")
    ord_enc = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("decimal(19,0)")
        * _stride
        + F.col("o_orderkey").cast("decimal(19,0)")
    )
    return (
        joined.groupBy("event_id", "user_id", "event_type")
        .agg(F.max_by("o_orderkey", ord_enc).alias("asof_orderkey"))
        .select("event_id", "user_id", "event_type", "asof_orderkey")
    )


@register(
    "t_range_join_ship_window",
    oracle="""
    SELECT o.o_orderkey,
           CAST(count(l.l_linenumber) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY) AS BIGINT) AS n_late
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey
    """,
)
def t_range_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval predicate over a joined time window: per order, line
    count and how many shipped beyond orderdate+30d. The equi key
    carries the join; the range is a residual predicate folded into a
    conditional aggregate — no O(n·m) interval join materializes."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    j = o.join(l, o.o_orderkey == l.l_orderkey, "left")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    return j.groupBy("o_orderkey").agg(
        F.count("l_linenumber").cast("bigint").alias("n_lines"),
        F.sum(F.when(late, 1).otherwise(0)).cast("bigint").alias("n_late"),
    )


@register(
    "t_sessionize",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, event_id,
               sum(is_new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def t_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session (lag + running
    sum of session-start flags, then per-session rollup). The batch
    form of session_window; streaming variant in streaming/windowed."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ns = F.col("ts") - F.lag("ts").over(w)
    flagged = e.withColumn(
        "is_new_session",
        F.when(gap_ns.isNull() | (gap_ns > 1800 * NS_PER_S), 1).otherwise(0),
    )
    wcum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = flagged.withColumn(
        "session_id", F.sum("is_new_session").over(wcum).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )


@register(
    "t_lag_delta",
    oracle="""
    SELECT user_id, event_id,
           round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6)
               AS value_delta
    FROM events
    """,
)
def t_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead delta per entity over a total ordering (ns-exact)."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
    )


@register(
    "t_time_bucket_rollup",
    oracle="""
    SELECT CAST(floor(epoch_ns(ts) / 21600000000000) * 21600 AS BIGINT) AS bucket_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def t_time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6-hour time-bucket rollup (hypertable-rollup shape).
    Bucket key is epoch-seconds so the group key is engine-portable;
    the streaming twin uses window(ts, '6 hours')."""
    e = table(spark, sf_dir, "events")
    bucket = (F.floor(F.col("ts") / (21600 * NS_PER_S)) * 21600).cast("bigint")
    return e.groupBy(
        bucket.alias("bucket_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))


@register(
    "t_funnel_match",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_converted
    FROM (
        SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'view')     AS first_view,
               min(ts) FILTER (WHERE event_type = 'click')    AS first_click,
               min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
        FROM events GROUP BY user_id
    )
    WHERE first_view IS NOT NULL AND first_click > first_view
      AND first_purchase > first_click
    """,
)
def t_funnel_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence (funnel) match: users whose first view →
    first click → first purchase occur in order. One shuffle on
    user_id; conditional min instead of three self-joins."""
    e = table(spark, sf_dir, "events")
    agg = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    )
    return agg.filter(
        F.col("first_view").isNotNull()
        & (F.col("first_click") > F.col("first_view"))
        & (F.col("first_purchase") > F.col("first_click"))
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_converted"))


INCIDENT_NS = 600 * NS_PER_S  # each error opens a 10-minute window
BIN_NS = 300 * NS_PER_S       # 5-minute join bins


@register(
    "t_interval_join_binned",
    oracle=f"""
    WITH ev AS (SELECT event_id, user_id, event_type, epoch_ns(ts) AS tns FROM events),
    inc AS (
        SELECT event_id AS incident_id, tns AS start_ns,
               tns + {INCIDENT_NS} AS end_ns
        FROM ev WHERE event_type = 'error'
    )
    SELECT i.incident_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(count(*) FILTER (WHERE e.event_type = 'error') AS BIGINT) AS n_errors
    FROM inc i JOIN ev e ON e.tns >= i.start_ns AND e.tns < i.end_ns
    GROUP BY i.incident_id
    """,
)
def t_interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join WITHOUT an equi key, made shuffle-joinable by
    time binning: every error event opens a 10-minute incident
    window; count the events (and distinct users / errors) falling in
    each window. A naive plan is a BroadcastNestedLoopJoin over the
    pure range predicate — O(n·m) and the classic 100 TB killer.
    Binning restores an equi key: each interval explodes into the
    5-minute bins it overlaps (≤ ceil(10/5)+1 = 3 rows), each event
    maps to exactly ONE bin, and the join runs as a hash join on
    bin_id with the range check as a residual. Because the event's
    bin is unique, no (event, incident) pair can match twice — no
    dedup pass. Shuffle is O(events + 3·intervals), partitioned by
    time bin; skewed bins (incident storms) split under AQE. The
    binned-range-join strategy Databricks ships as a hint, expressed
    in open DataFrame ops."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("ts").alias("tns")
    )
    inc = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("tns").alias("start_ns"),
        (F.col("tns") + F.lit(INCIDENT_NS)).alias("end_ns"),
    )
    # intervals → every overlapped bin; events → their single bin
    inc_b = inc.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col("start_ns") / BIN_NS),
                F.floor((F.col("end_ns") - 1) / BIN_NS),
            )
        ).alias("bin_id"),
    )
    ev_b = ev.withColumn("bin_id", F.floor(F.col("tns") / BIN_NS))
    joined = ev_b.join(inc_b, "bin_id").filter(
        (F.col("tns") >= F.col("start_ns")) & (F.col("tns") < F.col("end_ns"))
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
    )
