"""functions/exprcache: per-SparkContext memoization of Column trees
and content-fingerprinted broadcasts (r11 — the tagger's driver-side
fixed-cost shave). The cache keys must be exact: a broadcast hit is
equality-by-content, never hash-only."""

from __future__ import annotations

from pyspark.sql import functions as F

from pids_drg_esoa_spark.functions.exprcache import (
    cached_broadcast,
    cached_column,
)
from pids_drg_esoa_spark.functions.tokens import (
    normalize_generic_combination_native,
)


def test_cached_column_same_object_and_correct(spark):
    c1 = cached_column("t_upper", "x", lambda: F.upper(F.col("x")))
    c2 = cached_column("t_upper", "x", lambda: F.upper(F.col("x")))
    assert c1 is c2
    # distinct (name, col) keys build fresh
    c3 = cached_column("t_upper", "y", lambda: F.upper(F.col("y")))
    assert c3 is not c1
    df = spark.createDataFrame([("ab",)], ["x"])
    assert df.select(c1.alias("u")).first()["u"] == "AB"


def test_combo_native_str_path_cached_and_equal_to_column_path(spark):
    ca = normalize_generic_combination_native("raw_text")
    cb = normalize_generic_combination_native("raw_text")
    assert ca is cb  # memoized
    df = spark.createDataFrame(
        [("PARACETAMOL 500MG TAB",), ("AMOXICILLIN + CLAVULANIC ACID 625 MG TABLET",)],
        ["raw_text"],
    )
    got_cached = [r[0] for r in df.select(ca.alias("c")).collect()]
    fresh = normalize_generic_combination_native(F.col("raw_text"))
    got_fresh = [r[0] for r in df.select(fresh.alias("c")).collect()]
    assert got_cached == got_fresh


def test_cached_broadcast_content_keyed(spark):
    sc = spark.sparkContext
    b1 = cached_broadcast(sc, "t_map", {"a": 1, "b": 2})
    b2 = cached_broadcast(sc, "t_map", {"b": 2, "a": 1})  # same content
    assert b1 is b2
    b3 = cached_broadcast(sc, "t_map", {"a": 1, "b": 3})  # different content
    assert b3 is not b1
    b4 = cached_broadcast(sc, "t_other", {"a": 1, "b": 2})  # different name
    assert b4 is not b1
    assert b1.value == {"a": 1, "b": 2} and b3.value["b"] == 3


def test_cached_broadcast_nested_containers(spark):
    sc = spark.sparkContext
    v = {"k": ["x", "y"], "s": {"m": (1, 2)}}
    b1 = cached_broadcast(sc, "t_nested", v)
    b2 = cached_broadcast(sc, "t_nested", {"s": {"m": (1, 2)}, "k": ["x", "y"]})
    assert b1 is b2
