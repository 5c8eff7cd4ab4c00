"""SparkSession factory.

Defaults are tuned for the local[N] harness but every knob is the one
you would also set on a real cluster: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), Arrow on (pandas_udf fast
path), shuffle partitions sized to parallelism instead of the 200
default, UTC session timezone so timestamp semantics match the DuckDB
oracle and are cluster-stable.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "pids-drg-esoa-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    ui: bool = False,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # saveAsTable target for bucketed dim tables (S5-at-scale);
        # tmp by default so the repo tree never collects a warehouse
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(tempfile.gettempdir(), "spark-graft-warehouse"),
            ),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Long-lived sessions (test suites, notebooks, services) leak
        # broadcast vars and shuffle state until a full GC lets the
        # ContextCleaner reap them; with a large heap that GC comes too
        # late and the JVM storms instead. Force a periodic GC so
        # cleanup is continuous — same knob you'd set on a shared
        # cluster driver.
        .config("spark.cleaner.periodicGC.interval", "3min")
        .config("spark.ui.enabled", "true" if ui else "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
