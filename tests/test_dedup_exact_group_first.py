"""Exact-group-first near-dup collapse (r11): the optimized pipeline
(collapse identical texts to representatives before shingling/banding,
expand afterwards) must equal the flat pipeline row-for-row — on a
natural corpus, on a planted degenerate identical cluster, and on the
edge classes (sub-3-token texts, identical-short-text groups) where
the two paths could plausibly diverge.

Exactness argument under test: signatures, band keys, and Jaccard are
pure functions of text, so identical texts always pair with each
other (Jaccard 1) and with exactly the same external docs as their
representative. Shingle-incapable texts (< 3 tokens) pair in NEITHER
path and must stay singletons — the collapse gate must match the
shingle gate exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pids_drg_esoa_spark.operators.curation import (
    assign_clusters,
    connected_components,
    dedup_cluster_assign,
)
from pids_drg_esoa_spark.operators.dedup import (
    _DUP_CLUSTER_TEXT,
    distinct_text_reps,
    minhash_verified_pairs,
)
from pids_drg_esoa_spark.sources.tables import table


def _pairs(df):
    return sorted(tuple(r) for r in df.collect())


def _run_both(docs):
    opt, c1 = minhash_verified_pairs(docs)
    flat, c2 = minhash_verified_pairs(docs, collapse_exact=False)
    a, b = _pairs(opt), _pairs(flat)
    for r in c1 + c2:
        r.unpersist()
    return a, b


def test_collapsed_equals_flat_natural_corpus(spark, sf_dir):
    a, b = _run_both(table(spark, sf_dir, "documents"))
    assert a == b


def test_collapsed_equals_flat_planted_cluster(spark, sf_dir):
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.lit(_DUP_CLUSTER_TEXT))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    a, b = _run_both(d)
    assert a == b
    # the planted 20% cluster must show up as a within-group clique
    n_planted = d.filter(F.col("doc_id") % 5 == 0).count()
    clique = n_planted * (n_planted - 1) // 2
    assert len(a) >= clique


def test_short_and_identical_short_texts_stay_singletons(spark):
    # identical 2-token texts produce NO shingles → no pairs in the
    # flat path; the collapse gate must not merge them either
    rows = [
        (1, "hi there"),
        (2, "hi there"),
        (3, "alpha beta gamma delta epsilon"),
        (4, "alpha beta gamma delta epsilon"),
        (5, "totally different words entirely here now"),
        (6, ""),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    a, b = _run_both(d)
    assert a == b
    docs_in_pairs = {x for p in a for x in p[:2]}
    assert 1 not in docs_in_pairs and 2 not in docs_in_pairs and 6 not in docs_in_pairs
    assert (3, 4) in {p[:2] for p in a}


def test_cluster_assign_matches_flat_components(spark, sf_dir):
    """dedup_cluster_assign (rep-level components + linear expansion)
    must equal components over the FLAT doc-level pair relation."""
    d = table(spark, sf_dir, "documents")
    got = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in dedup_cluster_assign(spark, sf_dir).collect()
    }
    flat, caches = minhash_verified_pairs(d, collapse_exact=False)
    comp = connected_components(flat.select("doc_a", "doc_b"))
    for r in caches:
        r.unpersist()
    want = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in assign_clusters(d, "doc_id", comp).collect()
    }
    assert got == want


def test_distinct_text_reps_gate_matches_shingle_gate(spark):
    rows = [(1, "a b"), (2, "a b c"), (3, "a b c"), (4, "x"), (5, "a b c d")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    member, rep_docs = distinct_text_reps(d, "text", "doc_id")
    m = {(r["doc"], r["rep"]) for r in member.collect()}
    assert m == {(2, 2), (3, 2), (5, 5)}
    assert {r["doc"] for r in rep_docs.collect()} == {2, 5}
