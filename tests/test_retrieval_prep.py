"""Semantic + plan-shape tests for the retrieval and training-prep
operators (operators/retrieval.py, operators/training_prep.py).

Oracle hash-parity is the catalog gate (test_oracle_parity /
driver_sim); these tests pin the SEMANTIC contracts the hash can't
explain — chunk coverage/overlap, mixture copy-count bounds, shard
balance — and the plan shapes SCALE.md claims.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pids_drg_esoa_spark.operators.retrieval import (
    QUERY_TERMS,
    TOP_K,
    corpus_bm25_search,
    corpus_tfidf_top_terms,
)
from pids_drg_esoa_spark.operators.training_prep import (
    CHUNK_S,
    CHUNK_W,
    MIXTURE_WEIGHTS,
    corpus_shard_shuffle,
    corpus_upsample_mixture,
    doc_chunk_sliding,
)
from pids_drg_esoa_spark.sources.tables import table


def test_chunks_cover_every_token_with_stride_overlap(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    chunks = doc_chunk_sliding(spark, sf_dir)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("tok_sum"),
        F.max("n_chunk_tokens").alias("max_len"),
    )
    rows = docs.join(per_doc, "doc_id").collect()
    assert rows
    for r in rows:
        want = math.floor((r.n - 1) / CHUNK_S) + 1
        assert r.n_chunks == want, (r.doc_id, r.n, r.n_chunks)
        assert r.max_len <= CHUNK_W
        # every token in >=1 chunk; overlap = W-S per interior boundary
        covered = sum(
            min(CHUNK_W, r.n - i * CHUNK_S) for i in range(want)
        )
        assert r.tok_sum == covered

    # reassembling non-overlapped prefixes reproduces the document
    d0 = (
        chunks.filter(F.col("doc_id") == rows[0].doc_id)
        .orderBy("chunk_idx")
        .collect()
    )
    toks = []
    for c in d0:
        toks.extend(c.chunk_text.split(" ")[: CHUNK_S if c.chunk_idx < len(d0) - 1 else CHUNK_W])
    original = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == rows[0].doc_id)
        .head()
        .text
    )
    assert " ".join(toks) == original


def test_upsample_copy_counts_match_weights(spark, sf_dir):
    out = corpus_upsample_mixture(spark, sf_dir)
    per_doc = out.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n"), F.max("copy_idx").alias("mx")
    )
    rows = per_doc.collect()
    assert rows
    for r in rows:
        ipart, fhex = MIXTURE_WEIGHTS.get(r.source, (1, "00"))
        assert ipart <= r.n <= ipart + 1, (r.source, r.n)
        assert r.mx == r.n  # copy_idx is dense 1..n
    # dropped sources never appear
    dropped = {s for s, (i, h) in MIXTURE_WEIGHTS.items() if i == 0 and h == "00"}
    present = {r.source for r in rows}
    assert dropped.isdisjoint(present)
    # fractional sources land NEAR the designed rate (md5 is uniform)
    n_docs = table(spark, sf_dir, "documents").filter(F.col("source") == "src2").count()
    kept = sum(1 for r in rows if r.source == "src2")
    if n_docs >= 20:
        assert 0.05 <= kept / n_docs <= 0.55  # target 0.25


def test_shard_shuffle_is_a_permutation_in_16_shards(spark, sf_dir):
    out = corpus_shard_shuffle(spark, sf_dir)
    n_docs = table(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    shards = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos_in_shard").alias("mx")
    )
    rows = shards.collect()
    assert all(r.mx == r.n for r in rows)  # dense positions per shard
    assert len(rows) <= 16
    assert all(r.shard in "0123456789abcdef" for r in rows)


def test_bm25_ranks_term_dense_docs_first(spark, sf_dir):
    out = corpus_bm25_search(spark, sf_dir).collect()
    assert 0 < len(out) <= TOP_K
    scores = [r.bm25_micros for r in out]
    assert scores == sorted(scores, reverse=True)
    # the top doc really is query-term-dense: recompute its tf by hand
    top = out[0]
    text = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == top.doc_id)
        .head()
        .text
    )
    assert sum(text.split(" ").count(t) for t in QUERY_TERMS) > 0


def test_tfidf_top_terms_shape(spark, sf_dir):
    out = corpus_tfidf_top_terms(spark, sf_dir)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("rank").alias("dr")
    )
    rows = per_doc.collect()
    assert rows and all(1 <= r.n <= 3 and r.dr == r.n for r in rows)
    # scores are non-increasing with rank within a doc
    bad = (
        out.alias("a")
        .join(out.alias("b"), (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.rank") + 1 == F.col("b.rank")))
        .filter(F.col("b.tfidf_micros") > F.col("a.tfidf_micros"))
        .count()
    )
    assert bad == 0


def test_retrieval_prep_plan_shapes(spark):
    """Chunking + upsample are shuffle-free narrow plans; BM25's dim
    joins are all broadcast (the only shuffle is the per-doc score
    agg); shard shuffle hash-partitions by shard, never a global
    sort."""
    import os

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

    for fn in (doc_chunk_sliding, corpus_upsample_mixture):
        df = fn(spark, sf)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        # upsample broadcasts the tiny weights dim (BroadcastExchange
        # is dim movement, not a data shuffle); no repartitioning of
        # the corpus side is allowed
        for shuffle in ("Exchange hashpartitioning", "rangepartitioning", "Exchange SinglePartition"):
            assert shuffle not in plan, f"{fn.__name__}: {shuffle}\n{plan[:1500]}"

    df = corpus_bm25_search(spark, sf)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    df = corpus_shard_shuffle(spark, sf)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange hashpartitioning(shard" in plan
    assert "Exchange SinglePartition" not in plan
