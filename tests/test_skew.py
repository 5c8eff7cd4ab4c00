"""Salted join / two-phase agg: semantics must equal the plain forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from pids_drg_esoa_spark.operators.skew import salted_join, two_phase_agg


def test_salted_join_equals_plain_join(spark):
    # hot key: 'PARACETAMOL' dominates the fact side
    fact = spark.createDataFrame(
        [("PARACETAMOL", i) for i in range(500)] + [("AMLODIPINE", 1), ("MISSING", 2)],
        "generic string, v int",
    )
    dim = spark.createDataFrame(
        [("PARACETAMOL", "N02BE01"), ("AMLODIPINE", "C08CA01")],
        "generic string, atc string",
    )
    plain = fact.join(dim, "generic", "inner").groupBy("generic").count().collect()
    salted = salted_join(fact, dim, "generic", n_salts=4).groupBy("generic").count().collect()
    assert {(r.generic, r["count"]) for r in plain} == {(r.generic, r["count"]) for r in salted}

    left = salted_join(fact, dim, "generic", n_salts=4, how="left")
    assert left.filter(F.col("generic") == "MISSING").collect()[0].atc is None


def test_two_phase_agg_equals_plain(spark):
    df = spark.createDataFrame(
        [("k1", 1.0)] * 300 + [("k2", 2.0)] * 5, "k string, v double"
    )
    plain = {
        (r.k, r.total, r.n)
        for r in df.groupBy("k").agg(F.sum("v").alias("total"), F.count("*").alias("n")).collect()
    }
    two = {
        (r.k, r.total, r.n)
        for r in two_phase_agg(
            df, "k", {"total": F.sum("v"), "n": F.count(F.lit(1))}, n_salts=4
        ).collect()
    }
    assert plain == two


def test_salted_join_rejects_right_outer(spark):
    """Replicating the dim side cannot preserve right/full semantics
    (unmatched replicas would fabricate rows) — reject loudly."""
    import pytest

    from pids_drg_esoa_spark.operators.skew import salted_join

    f = spark.createDataFrame([(1, "a")], "k int, v string")
    d = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    for how in ("right", "right_outer", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="cannot preserve"):
            salted_join(f, d, "k", how=how)
    # fact-preserving joins still work
    assert salted_join(f, d, "k", how="left").count() == 1
