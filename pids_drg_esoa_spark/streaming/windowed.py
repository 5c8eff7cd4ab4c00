"""Structured Streaming surface.

The reference is batch-only (SURVEY §2.9); its closest analog is the
incremental `esoa_pt_*` part-file concat. Here the same events flow
runs as a real streaming query: parquet file source → event-time
bucket aggregation → memory sink. ``stream_tumbling_event_counts`` is
executed by the actual streaming engine yet oracle-checked against
batch SQL (one availableNow pass ⇒ deterministic totals).

Watermark + window + append-mode (late-data semantics) are covered in
tests/test_streaming.py — they need a TimestampType column, and the
driver's oracle hash is happier with integral bucket keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.catalog import register

NS_PER_S = 1_000_000_000

def _events_stream_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """events schema as the streaming source must declare it — the ts
    physical type depends on the driver's writer (int64 NANOS rounds
    1-3, timestamp[us] from round 4), so probe the batch footer once
    (driver-side metadata read, no data scan) and declare what's
    actually on disk. Downstream always sees int64 nanoseconds."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    ts_type = next(f.dataType for f in batch.schema.fields if f.name == "ts")
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The file source wants a directory; glob-filter to the events
    # table inside the shared sf dir.
    schema = _events_stream_schema(spark, sf_dir)
    src = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    ts_type = next(f.dataType for f in schema.fields if f.name == "ts")
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
        # session tz is UTC → the cast preserves the stored instant
        src = src.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
    return src


@register(
    "stream_tumbling_event_counts",
    oracle="""
    SELECT CAST(floor(epoch_ns(ts) / 21600000000000) * 21600 AS BIGINT) AS bucket_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6h event-time buckets computed BY THE STREAMING ENGINE
    (file source → complete-mode agg → memory sink), then returned as
    a DataFrame. Matches the batch oracle exactly because one
    availableNow pass sees all input."""
    src = read_events_stream(spark, sf_dir)
    bucket = (F.floor(F.col("ts") / (21600 * NS_PER_S)) * 21600).cast("bigint")
    agg = src.groupBy(bucket.alias("bucket_start"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    )
    name = "stream_tumbling_event_counts_sink"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "stream_static_enrich_counts",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment, e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(e.value), 4) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_enrich_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the events STREAM joins a static
    customer dim (broadcast — the static side is planned per
    micro-batch, so a broadcast dim costs no stream-side shuffle) and
    aggregates per (segment, event_type). The canonical 100 TB
    pattern for enriching an event firehose with reference data; the
    oracle is the equivalent batch join since one availableNow pass
    sees all input."""
    src = read_events_stream(spark, sf_dir)
    cust = (
        spark.read.option("pathGlobFilter", "customer.parquet")
        .parquet(sf_dir)
        .select("c_custkey", "c_mktsegment")
    )
    agg = (
        src.join(F.broadcast(cust), src.user_id == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )
    name = "stream_static_enrich_counts_sink"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "stream_stateful_sessionize",
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
def stream_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState,
    GroupState per user): 30-min-gap sessionization executed by the
    streaming engine, hash-matched against the batch SQL oracle —
    the reference has no streaming at all (SURVEY §2.9); this is the
    applyInPandasWithState surface the 100 TB event path needs.
    One availableNow batch ⇒ deterministic session numbering."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("session_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("session_id", T.LongType()),
            T.StructField("last_ns", T.LongType()),
        ]
    )
    GAP_NS = 1800 * NS_PER_S

    def sessionize(key, pdfs, state: GroupState):
        session_id, last_ns = state.get if state.exists else (0, None)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        counts: dict[int, int] = {}
        for ns in rows["ts"]:
            ns = int(ns)
            if last_ns is None or ns - last_ns > GAP_NS:
                session_id += 1
            counts[session_id] = counts.get(session_id, 0) + 1
            last_ns = ns
        state.update((session_id, last_ns))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(counts),
                "session_id": list(counts),
                "n_events": list(counts.values()),
            }
        )

    src = read_events_stream(spark, sf_dir)
    agg = src.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = "stream_stateful_sessionize_sink"
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # Same single-batch contract as stream_dedup_events: the update-
    # mode memory sink APPENDS rows per trigger, so a session crossing
    # a micro-batch boundary would emit duplicate (user_id, session_id)
    # rows with partial counts. Fail loudly rather than diverge from
    # the batch sessionization oracle.
    def _n_rows(p) -> int:
        v = p.get("numInputRows", 0) if isinstance(p, dict) else getattr(p, "numInputRows", 0)
        return int(v or 0)

    data_batches = sum(1 for p in q.recentProgress if p is not None and _n_rows(p) > 0)
    if data_batches > 1:
        raise RuntimeError(
            f"stream_stateful_sessionize processed {data_batches} data micro-batches; "
            "the memory-sink comparison requires a single batch — write to an "
            "upserting sink (foreachBatch merge) for multi-batch sources"
        )
    return spark.table(name)


@register(
    "stream_dedup_events",
    oracle="""
    SELECT DISTINCT user_id, event_type,
           CAST(floor(epoch_ns(ts) / 86400000000000) * 86400 AS BIGINT) AS day_start
    FROM events
    """,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    dedup_exact_groups: engine-executed ``dropDuplicates`` on
    (user_id, event_type, event-time day), with the event-time column
    in the key set under a watermark so the dedup STATE is evicted as
    the watermark passes — bounded state at 100 TB, where an
    unwatermarked dropDuplicates would accumulate every key ever
    seen. Append mode emits each first-seen key once; one availableNow
    pass ⇒ set-equal to the batch DISTINCT oracle."""
    src = read_events_stream(spark, sf_dir)
    day_start = (F.floor(F.col("ts") / (86400 * NS_PER_S)) * 86400).cast("bigint")
    evt = src.withColumn("day_start", day_start).withColumn(
        "day_ts", F.timestamp_seconds(F.col("day_start"))
    )
    dedup = (
        evt.withWatermark("day_ts", "2 days")
        .dropDuplicates(["user_id", "event_type", "day_ts"])
        .select("user_id", "event_type", "day_start")
    )
    name = "stream_dedup_events_sink"
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # Set-equality with the batch DISTINCT oracle holds only if the
    # availableNow pass was a single data micro-batch: across batches
    # the 2-day watermark advances and dropDuplicates would silently
    # DROP first-seen keys whose event-time day is already older than
    # the watermark. Fail loudly rather than diverge silently if the
    # source ever spans multiple files / sets maxFilesPerTrigger.
    def _n_rows(p) -> int:
        v = p.get("numInputRows", 0) if isinstance(p, dict) else getattr(p, "numInputRows", 0)
        return int(v or 0)

    data_batches = sum(1 for p in q.recentProgress if p is not None and _n_rows(p) > 0)
    if data_batches > 1:
        raise RuntimeError(
            f"stream_dedup_events processed {data_batches} data micro-batches; "
            "the batch-DISTINCT equivalence requires a single batch — use "
            "dropDuplicatesWithinWatermark semantics for multi-batch sources"
        )
    return spark.table(name)
