"""Table loaders for the synthetic star schema (TESTDATA.md).

Parquet carries its own schema, so loads are schema-on-read; the
explicit StructTypes here document the contract and are used by the
CSV interop readers (readers.py) with FAILFAST semantics, mirroring
the reference's assert-required-columns-on-load behavior
(reference: pipelines/drugs/scripts/prepare.py:57-59).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table. Parquet scan → Catalyst gets pushdown
    and column pruning for free on every downstream plan.

    ``events.ts`` is normalized to **int64 nanoseconds** whatever the
    writer emitted: the round-1..3 driver wrote TIMESTAMP(NANOS) (read
    via nanosAsLong — Spark's vectorized reader rejects nanos), the
    round-4 driver writes timestamp[us] (read as TimestampType, then
    ×1000). Every temporal plan does exact ns arithmetic against the
    oracle's ``epoch_ns(ts)``; both storage types compare exactly
    (micros data has zero sub-microsecond residue). ``ts_micros()``
    derives a real TimestampType column where one is needed
    (streaming)."""
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = next(f.dataType for f in df.schema.fields if f.name == "ts")
        if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
            # session tz is UTC (session.py), so the NTZ→LTZ cast is a
            # no-op on the stored instant
            df = df.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000)
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def ts_micros(col: str = "ts"):
    """events.ts (int64 ns) → TimestampType, microsecond-truncated."""
    from pyspark.sql import functions as F

    # integer division: ts ~1.7e18 ns exceeds 2^53, so double /1000
    # rounds to a multiple of ~256 ns before the cast and can land on
    # the wrong microsecond — `div` stays exact in long arithmetic
    return F.timestamp_micros(F.expr(f"{col} div 1000"))


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register temp views so plans can be written in Spark SQL."""
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
