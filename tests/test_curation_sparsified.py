"""Star-sparsified components (r12): the bounded-memory components
path (per-bucket star edges + escalation,
operators/curation.components_from_banded) must produce EXACTLY the
connected components of the full verified-pair graph — on the natural
corpus, on a trailing-tag NEAR-dup mega-clique corpus (the input class
that OOMed the r11 flat edge list at 100×), and on a crafted
adversarial bucket where the star edges fail but a non-rep pair
verifies (forcing the escalation tier). The budget gate must refuse
loudly rather than go quadratic silently.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pids_drg_esoa_spark.operators.curation import (
    cluster_assign_docs,
    components_from_banded,
)
from pids_drg_esoa_spark.sources.tables import table


def _assign(docs, n_docs, **kw):
    out, persisted = cluster_assign_docs(docs, "text", "doc_id", n_docs, **kw)
    rows = {
        (r["doc_id"], r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in out.collect()
    }
    for p in persisted:
        p.unpersist()
    return rows


def test_sparsified_equals_flat_natural_corpus(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    n = d.count()
    assert _assign(d, n, sparsified=True) == _assign(d, n, sparsified=False)


def _trailing_tag_corpus(spark, sf_dir, copies=5, base_n=200):
    """Each base text replicated with a distinct trailing tag — every
    base text becomes a NEAR-dup (non-identical) clique, the exact
    shape exact-group collapse cannot touch."""
    d = table(spark, sf_dir, "documents").limit(base_n)
    parts = [
        d.select(
            (F.col("doc_id") * 10 + i).alias("doc_id"),
            F.concat("text", F.lit(f" trailtag{i}")).alias("text"),
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def test_sparsified_equals_flat_trailing_tag_cliques(spark, sf_dir):
    d = _trailing_tag_corpus(spark, sf_dir)
    n = d.count()
    a = _assign(d, n, sparsified=True)
    b = _assign(d, n, sparsified=False)
    assert a == b
    # the corpus really does contain non-singleton near-dup clusters
    assert any(size >= 2 for (_, _, size, _) in a)
    # the two verifier shapes (array-intersect vs exploded join) make
    # identical decisions — same clusters either way
    assert _assign(d, n, sparsified=True, verify="join") == a


def _crafted(spark):
    """One bucket {1,2,3}; shingles such that the star edges
    (1,2),(1,3) FAIL Jaccard ≥ 2/3 while the non-rep pair (2,3)
    PASSES — only the escalation tier can find it."""
    banded = spark.createDataFrame(
        [(1, 0, "k"), (2, 0, "k"), (3, 0, "k")], ["doc", "band_idx", "band_key"]
    )
    sh_rows = (
        [(1, s) for s in ["a", "x", "y", "z"]]
        + [(2, s) for s in ["a", "b", "c", "d"]]
        + [(3, s) for s in ["a", "b", "c", "d", "e"]]
    )
    sh = spark.createDataFrame(sh_rows, ["doc", "sh"])
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    return banded, sh, sizes


def test_escalation_finds_non_rep_pair(spark):
    # small_bucket=1 disables the round-0 all-pairs tier so the
    # crafted bucket exercises star → repair → ESCALATION
    banded, sh, sizes = _crafted(spark)
    labels = {
        (r["doc"], r["cluster_id"])
        for r in components_from_banded(banded, sh, sizes, small_bucket=1).collect()
    }
    # J(1,2)=1/7, J(1,3)=1/8 → star fails; J(2,3)=4/5 ≥ 2/3 → the
    # escalation tier must connect {2,3}; doc 1 stays edgeless
    assert labels == {(2, 2), (3, 2)}


def test_small_bucket_tier_resolves_in_round_zero(spark):
    # with the default threshold the same bucket is small enough that
    # its full pair set is tested upfront — same labels either way
    banded, sh, sizes = _crafted(spark)
    labels = {
        (r["doc"], r["cluster_id"])
        for r in components_from_banded(banded, sh, sizes).collect()
    }
    assert labels == {(2, 2), (3, 2)}


def test_sparsified_releases_caches_on_raise(spark, monkeypatch):
    """The loud budget/non-convergence paths must not leak the
    persisted shingle/signature/banded relations (r12 review: the
    caller's finally only sees caches that were RETURNED)."""
    import pids_drg_esoa_spark.operators.curation as cur

    spark.catalog.clearCache()
    d = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i}") for i in range(30)],
        ["doc_id", "text"],
    )

    def boom(*a, **k):
        raise RuntimeError("escalation budget (simulated)")

    monkeypatch.setattr(cur, "components_from_banded", boom)
    cm = spark._jsparkSession.sharedState().cacheManager()
    with pytest.raises(RuntimeError, match="simulated"):
        cur.sparsified_verified_components(d, "text", "doc_id")
    assert cm.isEmpty()


def test_capped_tier_converges_over_budget(spark):
    """r13: an over-budget corpus WITH real near-dup structure no
    longer hits the hard refusal — the degree-capped sampled round
    finds the (2,3) edge, the merge shrinks the cross-label bound back
    under budget, and the final full escalation proves exactness. Same
    labels as the unbudgeted run."""
    banded, sh, sizes = _crafted(spark)
    labels = {
        (r["doc"], r["cluster_id"])
        for r in components_from_banded(
            banded, sh, sizes, escalation_budget=2, small_bucket=1
        ).collect()
    }
    assert labels == {(2, 2), (3, 2)}


def _no_verify_bucket(spark, n=6):
    """One bucket of n docs with pairwise-DISJOINT shingle sets: no
    pair verifies, so the cross-label bound never shrinks — the shape
    where exactness genuinely cannot be proven within a small budget
    (the capped round tests fresh pairs and merges nothing)."""
    banded = spark.createDataFrame(
        [(i, 0, "k") for i in range(1, n + 1)], ["doc", "band_idx", "band_key"]
    )
    sh = spark.createDataFrame(
        [(i, f"s{i}_{j}") for i in range(1, n + 1) for j in range(4)],
        ["doc", "sh"],
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    return banded, sh, sizes


def test_escalation_budget_refuses_loudly_after_capped_stall(spark):
    banded, sh, sizes = _no_verify_bucket(spark)
    with pytest.raises(RuntimeError, match="merged nothing"):
        components_from_banded(
            banded, sh, sizes, escalation_budget=10, small_bucket=1
        )


def test_escalation_budget_degrade_mode_is_loud(spark):
    """on_budget_exceeded='degrade': the zero-progress corpus returns
    (possibly under-merged) labels instead of raising, with a
    RuntimeWarning and an exactness_degraded marker carrying the
    unproven bound — loud in the return contract, not silent."""
    import warnings

    banded, sh, sizes = _no_verify_bucket(spark)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        labels = components_from_banded(
            banded, sh, sizes, escalation_budget=10, small_bucket=1,
            on_budget_exceeded="degrade",
        )
    assert any("under-merged" in str(x.message) for x in w)
    deg = labels.exactness_degraded
    assert deg["untested_cross_label_bound"] > deg["escalation_budget"] == 10
    # nothing verifies in this corpus, so the degraded labels are in
    # fact exact here: no doc acquired an edge
    assert labels.count() == 0


def test_on_budget_exceeded_validated(spark):
    banded, sh, sizes = _crafted(spark)
    with pytest.raises(ValueError, match="on_budget_exceeded"):
        components_from_banded(
            banded, sh, sizes, small_bucket=1, on_budget_exceeded="typo"
        )


def test_auto_verifier_switches_to_join_on_wide_docs(spark):
    """r13: verify='auto' gates the arrays shape on measured max
    per-doc shingle count. With a tiny threshold the same corpus must
    route through the exploded-join verifier and produce identical
    clusters; decision parity between the shapes is already pinned by
    test_sparsified_equals_flat_trailing_tag_cliques."""
    from pids_drg_esoa_spark.operators.curation import (
        sparsified_verified_components,
    )

    d = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon tag{i}") for i in range(8)],
        ["doc_id", "text"],
    )

    def run(**kw):
        labels, caches = sparsified_verified_components(d, "text", "doc_id", **kw)
        rows = {(r["doc"], r["cluster_id"]) for r in labels.collect()}
        for c in caches:
            c.unpersist()
        return rows

    base = run(verify="arrays")
    # every doc has 4 shingles > threshold 2 → auto must pick 'join'
    assert run(verify="auto", arrays_max_shingles=2) == base
    assert run(verify="auto") == base  # default threshold → 'arrays'
    assert run(verify="join") == base


def _emb_assign_flat(e):
    from pids_drg_esoa_spark.operators.curation import (
        assign_clusters,
        connected_components,
    )
    from pids_drg_esoa_spark.operators.similarity import near_dup_pairs_exact

    pairs = near_dup_pairs_exact(e).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    comp = connected_components(pairs)
    return {
        (r["vec_id"], r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in assign_clusters(e, "vec_id", comp).collect()
    }


def _emb_assign_sparse(e):
    from pids_drg_esoa_spark.operators.curation import (
        assign_clusters,
        embedding_components_sparse,
    )

    labels, caches = embedding_components_sparse(e)
    rows = {
        (r["vec_id"], r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in assign_clusters(e, "vec_id", labels).collect()
    }
    for c in caches:
        c.unpersist()
    return rows


def test_embedding_sparse_equals_flat_planted(spark, sf_dir):
    from pids_drg_esoa_spark.operators.similarity import _near_dup_planted

    e = _near_dup_planted(spark, sf_dir)
    assert _emb_assign_sparse(e) == _emb_assign_flat(e)


def test_embedding_sparse_equals_flat_mega_cluster(spark, sf_dir):
    """One label carrying a large clone cluster — the embedding twin
    of the trailing-tag mega-clique: the star tier must connect it
    with |B|−1 verified edges, matching the flat pair graph."""
    from pids_drg_esoa_spark.sources.tables import table

    base = table(spark, sf_dir, "embeddings").limit(40)
    clones = (
        base.limit(3)
        .crossJoin(spark.range(25).select(F.col("id").alias("c")))
        .select(
            (F.col("vec_id") + 1000 + F.col("c") * 100).alias("vec_id"),
            "embedding",
            F.lit(7).alias("label"),
        )
    )
    e = base.select("vec_id", "embedding", F.lit(7).alias("label")).unionByName(clones)
    a = _emb_assign_sparse(e)
    assert a == _emb_assign_flat(e)
    # the clone clusters really merged (3 clusters of 26 members each)
    sizes = sorted(s for (_, _, s, canon) in a if canon)
    assert sizes[-3:] == [26, 26, 26]


def test_sparsified_handles_mixed_exact_and_near_dups(spark):
    """Identical-text groups (exact collapse), near-dup tag variants
    (star tier), and unrelated singletons in one corpus."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = (
        [(i, base) for i in range(10, 14)]  # identical group
        + [(i, f"{base} tag{i}") for i in range(20, 25)]  # near-dup clique
        + [(30, "completely different words that share nothing at all here")]
        + [(31, "hi")]  # sub-3-token singleton
    )
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    n = d.count()
    a = _assign(d, n, sparsified=True)
    b = _assign(d, n, sparsified=False)
    assert a == b
    by_doc = {doc: cid for (doc, cid, _, _) in a}
    # identical group + its near-dup tag variants all reach cluster 10
    # (tag texts share ≥2/3 Jaccard with the base 10-token text)
    assert {by_doc[i] for i in range(10, 14)} == {10}
    assert by_doc[30] == 30 and by_doc[31] == 31


def test_split_half_cliques_force_escalation_with_real_banding(spark):
    """r13: the repair-forcing corpus class from the scale sweep, at
    unit scale with REAL MinHash banding (not a crafted bucket): A
    copies keep the text, B copies perturb the first third of the
    words — within-half Jaccard verifies, cross-half fails but still
    band-collides — so mixed buckets hold two labels after the star
    round and only the escalation tier can prove convergence. Pins
    (a) sparsified == flat and (b) the escalation tier actually fired
    (the corpus exercises the machinery, not just the output)."""
    import random

    rng = random.Random(7)
    words = [f"w{i}" for i in range(200)]
    rows = []
    for b in range(12):
        base = [rng.choice(words) for _ in range(24)]
        for c in range(36):  # > _SMALL_BUCKET so round 0 cannot resolve
            toks = list(base)
            if c >= 18:  # B half: perturb the first third
                toks[:8] = [w + "_q" for w in toks[:8]]
            rows.append((b * 1000 + c, " ".join(toks + [f"xtag{c}"])))
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    n = d.count()
    stats: dict = {}
    a = _assign(d, n, sparsified=True, stats_out=stats)
    assert a == _assign(d, n, sparsified=False)
    assert stats["escalations"] >= 1
    assert stats["escalation_pairs_tested"] > 0
    assert stats["converged_via"] in (
        "all_cross_label_pairs_tested", "escalation_exhausted",
        "no_multi_label_buckets",
    )
    # the halves really did stay separate clusters somewhere
    n_clusters = len({cid for (_, cid, _, _) in a})
    assert n_clusters >= 24  # ≥2 clusters per base text


def _persistent_ids(spark):
    return set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())


def test_connected_components_releases_round_checkpoints(spark):
    """r13 (r12 ADVICE): each propagation round's localCheckpoint must
    be freed as it is superseded, and the internal doubled-edge leaf at
    return — only the single leaf backing the returned labels survives
    the call; release_checkpoints(labels) returns the session to its
    pre-call block set."""
    from pids_drg_esoa_spark.operators.curation import (
        connected_components,
        release_checkpoints,
    )

    # a 6-deep path forces several propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)] + [(10, 11)], ["doc_a", "doc_b"]
    )
    before = _persistent_ids(spark)
    labels = connected_components(pairs)
    got = {(r["doc"], r["cluster_id"]) for r in labels.collect()}
    assert got == {(i, 1) for i in range(1, 8)} | {(10, 10), (11, 10)}
    leaked = _persistent_ids(spark) - before
    assert len(leaked) <= 1, f"superseded round checkpoints leaked: {leaked}"
    assert release_checkpoints(labels) >= 1
    assert _persistent_ids(spark) - before == set()


def test_components_from_banded_releases_checkpoints_on_escalation_path(spark):
    """Same contract through the full star → escalation machinery: the
    crafted escalation-forcing bucket converges with every transient
    leaf (bucket_min, star, active, untested ledger, edge unions, each
    round's components) freed — at most the returned labels' own leaf
    outlives the call."""
    from pids_drg_esoa_spark.operators.curation import release_checkpoints

    banded, sh, sizes = _crafted(spark)
    before = _persistent_ids(spark)
    labels = components_from_banded(banded, sh, sizes, small_bucket=1)
    got = {(r["doc"], r["cluster_id"]) for r in labels.collect()}
    assert got == {(2, 2), (3, 2)}
    leaked = _persistent_ids(spark) - before
    assert len(leaked) <= 1, f"transient components checkpoints leaked: {leaked}"
    release_checkpoints(labels)
    assert _persistent_ids(spark) - before == set()
