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


# ---------------------------------------------------------------------------
# Round 6: parameterized library cores + vocabulary-broadcast gating
# ---------------------------------------------------------------------------


def test_bm25_parameterized_matches_generated_oracle(spark, sf_dir):
    """bm25_search with NON-default (terms, k, k1, b) must hash-match
    the oracle generated from the same parameters — proving the
    bit-exactness contract holds for any user parameters, not just
    the catalog's standing constants."""
    from oracle_compare import compare, duckdb_connection

    from pids_drg_esoa_spark.operators.retrieval import _bm25_oracle_sql, bm25_search

    terms, top_k, k1, b = ("data", "stream", "the", "merge"), 10, 0.9, 0.4
    docs = table(spark, sf_dir, "documents")
    sdf = bm25_search(docs, terms, top_k, k1, b)
    con = duckdb_connection(sf_dir)
    res = compare("bm25_custom", sdf, con, _bm25_oracle_sql(terms, top_k, k1, b))
    assert res.ok and res.exact, res.detail


def test_vocab_broadcast_gate_drops_hint_above_threshold(spark, sf_dir):
    """Above VOCAB_BROADCAST_MAX_DOCS (or with unknown size) the
    vocabulary join must NOT carry a forced broadcast hint — the
    static (initial) plan degrades to sort-merge and only AQE may
    promote it at runtime from the measured dim size. Results are
    identical either way."""
    from pids_drg_esoa_spark.operators.retrieval import tfidf_top_terms
    from pids_drg_esoa_spark.operators.textstats import rare_token_stats

    docs = table(spark, sf_dir, "documents")
    # On tiny test data Catalyst's COST-BASED choice is broadcast too;
    # to observe the HINT in isolation, turn the size-based promotion
    # off — then only a forced hint can produce a broadcast join.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for fn in (rare_token_stats, tfidf_top_terms):
            hinted = fn(docs, n_docs=100)          # far below the gate
            unhinted = fn(docs, n_docs=10_000_000)  # far above the gate
            unknown = fn(docs)                      # size unknown -> no hint

            for df, label in ((unhinted, "above-gate"), (unknown, "unknown-size")):
                df.collect()
                plan = df._jdf.queryExecution().executedPlan().toString()
                assert "BroadcastHashJoin" not in plan, (
                    f"{fn.__name__} [{label}]: forced broadcast survived the gate\n"
                    f"{plan[:1500]}"
                )
                assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, (
                    f"{fn.__name__} [{label}]: vocab join missing\n{plan[:1500]}"
                )

            hinted.collect()
            hplan = hinted._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in hplan, (
                f"{fn.__name__}: small-corpus hint lost"
            )

            rows = lambda df: sorted(map(tuple, df.collect()))
            assert rows(hinted) == rows(unhinted) == rows(unknown), (
                f"{fn.__name__}: gate changed results"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_training_prep_cores_parameterized(spark, sf_dir):
    """chunk_sliding / upsample_mixture / shard_shuffle accept user
    parameters: custom window/stride still covers every token, custom
    weights produce the designed copy counts, a different epoch seed
    permutes shard order while keeping the corpus identical."""
    from pids_drg_esoa_spark.operators.training_prep import (
        chunk_sliding,
        shard_shuffle,
        upsample_mixture,
    )

    docs = table(spark, sf_dir, "documents")

    ch = chunk_sliding(docs, window=5, stride=3)
    per_doc = ch.groupBy("doc_id").agg(
        F.max("chunk_idx").alias("last"), F.sum("n_chunk_tokens").alias("tok_sum")
    )
    nd = docs.select("doc_id", F.size(F.split("text", " ")).alias("n"))
    j = per_doc.join(nd, "doc_id").collect()
    for r in j:
        # last chunk start 3*last < n; full cover: starts reach past n-5
        assert 3 * r["last"] < r["n"] and 3 * (r["last"] + 1) >= r["n"] - 4

    w = {"src0": (2, "00"), "src1": (0, "00")}  # 2 epochs / dropped
    up = upsample_mixture(docs, w, seed="epoch2")
    cnt = {r["source"]: r["c"] for r in up.groupBy("source").agg(F.count("*").alias("c")).collect()}
    n_src = {r["source"]: r["c"] for r in docs.groupBy("source").agg(F.count("*").alias("c")).collect()}
    assert cnt.get("src0", 0) == 2 * n_src.get("src0", 0)
    assert "src1" not in cnt
    for s, n in n_src.items():  # unlisted sources: exactly 1 epoch
        if s not in w:
            assert cnt[s] == n

    s1 = shard_shuffle(docs, seed="e1")
    s2 = shard_shuffle(docs, seed="e2")
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    ids2 = sorted(r["doc_id"] for r in s2.collect())
    assert ids1 == ids2  # same corpus either epoch
    ord1 = {r["doc_id"]: (r["shard"], r["pos_in_shard"]) for r in s1.collect()}
    ord2 = {r["doc_id"]: (r["shard"], r["pos_in_shard"]) for r in s2.collect()}
    assert ord1 != ord2  # but a different permutation


def test_token_budget_sample_distributed_prefix_sum(spark, sf_dir):
    """token_budget_sample: the running sum must come from 16
    shard-partitioned windows + a broadcast offset dim — never a
    global (single-partition) window — and must equal the naive
    global prefix sum exactly."""
    from pyspark.sql import Window as W

    from pids_drg_esoa_spark.operators.training_prep import token_budget_sample

    docs = table(spark, sf_dir, "documents")
    df = token_budget_sample(docs, 10_000)
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan[:1500]
    assert "Exchange hashpartitioning(shard" in plan

    # naive single-window reference computation
    h = F.md5(F.concat(F.lit("budget1:"), F.col("doc_id").cast("string")))
    naive = (
        docs.select("doc_id", h.alias("h"), F.size(F.split("text", " ")).cast("bigint").alias("n"))
        .withColumn(
            "cum",
            F.sum("n").over(
                W.orderBy("h", "doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .filter(F.col("cum") <= 10_000)
        .select("doc_id", F.col("n").alias("n_tokens"), F.col("cum").alias("cum_tokens"))
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, naive.collect()))
