"""Corpus-curation operators: connected components, PII redaction,
deterministic stratified sampling (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pids_drg_esoa_spark.operators.curation import (
    connected_components,
    redact_pii,
    stratified_sample,
)


def test_connected_components_chain_and_islands(spark):
    # Two components: a 4-node chain {1,2,3,4} (diameter 3 — needs
    # real propagation rounds) and a pair {10,11}; 99 is isolated
    # (no edge → absent from the result, caller coalesces).
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {r["doc"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_merges_transitively(spark):
    # Star + bridge: min label must cross the bridge both ways.
    pairs = spark.createDataFrame(
        [(5, 7), (7, 9), (9, 2), (2, 8)], ["doc_a", "doc_b"]
    )
    got = {r["doc"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert set(got.values()) == {2}


def test_connected_components_random_graph_vs_union_find(spark):
    import random

    rng = random.Random(99)
    edges = {(rng.randrange(80), rng.randrange(80)) for _ in range(120)}
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(80))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for e in edges for n in e}
    want = {n: find(n) for n in nodes}

    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r["doc"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == want


def test_redact_pii_counts_and_replacement(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b@x.io and c@y.org call 555-1234 ip 10.0.0.1 done")],
        ["id", "text"],
    )
    row = redact_pii(df, "text").collect()[0]
    assert (row["n_emails"], row["n_phones"], row["n_ips"]) == (2, 1, 1)
    assert row["redacted"] == "mail <EMAIL> and <EMAIL> call <PHONE> ip <IP> done"


def test_redact_pii_mixed_case_email(spark):
    df = spark.createDataFrame([(1, "write John.Doe@Example.COM today")], ["id", "text"])
    row = redact_pii(df, "text").collect()[0]
    assert row["n_emails"] == 1
    assert row["redacted"] == "write <EMAIL> today"


def test_connected_components_raises_on_round_exhaustion(spark):
    import pytest as _pytest

    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["doc_a", "doc_b"])
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=1)


def test_redact_pii_no_matches_is_identity(spark):
    df = spark.createDataFrame([(1, "nothing sensitive here")], ["id", "text"])
    row = redact_pii(df, "text").collect()[0]
    assert row["redacted"] == "nothing sensitive here"
    assert row["n_emails"] == row["n_phones"] == row["n_ips"] == 0


def test_quality_filter_rules(spark, sf_dir):
    from pids_drg_esoa_spark.plans.catalog import all_specs

    spec = all_specs()["text_quality_filter"]
    rows = {r["doc_id"]: r for r in spec.fn(spark, sf_dir).collect()}
    # Synthetic docs are all lowercase word soup: every rule passes.
    assert rows and all(r["keep"] for r in rows.values())
    for r in rows.values():
        assert 2 * r["n_words"] <= r["sum_word_chars"] <= 12 * r["n_words"]


def test_pack_sequences_contiguous_within_source(spark, sf_dir):
    from pids_drg_esoa_spark.plans.catalog import all_specs

    spec = all_specs()["doc_pack_sequences"]
    out = spec.fn(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["source"], r["doc_id"])):
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        cum = 0
        for r in rows:  # offsets replay the running total exactly
            assert r["bin_id"] == cum // 512
            assert r["bin_offset"] == cum % 512
            cum += r["n_tokens"]


def test_stratified_sample_deterministic_and_stratified(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    thr = {"en": "29", "de": "80"}
    a = sorted(r["doc_id"] for r in stratified_sample(df, "doc_id", "lang", thr).collect())
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(df.repartition(7), "doc_id", "lang", thr).collect()
    )
    assert a == b  # partition-independent
    kept = stratified_sample(df, "doc_id", "lang", thr).groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in kept}
    # en keeps ~41/256 of 200, de ~128/256 of 200 — loose sanity bands.
    assert 10 <= counts.get("en", 0) <= 60
    assert 70 <= counts.get("de", 0) <= 130
    # unknown stratum falls through to keep-all ('zz' threshold).
    other = spark.createDataFrame([(1, "xx"), (2, "xx")], ["doc_id", "lang"])
    assert stratified_sample(other, "doc_id", "lang", thr).count() == 2


def test_simhash_pairs_complete_vs_bruteforce(spark, sf_dir):
    """The multi-index banding (agree on >=1 of 4 blocks) must find
    EVERY hamming<=3 pair — pigeonhole-complete, unlike the earlier
    leave-one-block-out variant that missed cross-block diffs. Pin by
    brute-force all-pairs comparison at sf0.001."""
    from pyspark.sql import functions as F

    from pids_drg_esoa_spark.operators.dedup import (
        dedup_simhash_hamming_pairs,
        simhash_fingerprints,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = simhash_fingerprints(d, "text", "doc_id")
    a = fp.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = fp.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    hamming = sum(
        F.when(F.substring("sa", i + 1, 1) != F.substring("sb", i + 1, 1), 1).otherwise(0)
        for i in range(32)
    )
    brute = {
        (r.doc_a, r.doc_b): r.h
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("h", hamming)
        .filter(F.col("h") <= 3)
        .collect()
    }
    # values too (r13): the operator now computes hamming as
    # bit_count(conv(bits,2,10) XOR ...) — this per-char brute count
    # pins the bit-parallel path value-for-value, not just set-wise
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup_simhash_hamming_pairs(spark, sf_dir).collect()
    }
    assert got == brute
    assert brute, "corpus should contain at least one hamming<=3 pair"
