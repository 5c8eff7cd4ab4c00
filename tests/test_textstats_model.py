"""Model-based differentials for the round-5 text operators: one
randomized corpus (fixed seed), Spark operator output compared cell
by cell against an independent pure-Python model. Catches off-by-one
window/gram construction that a hash-exact oracle written with the
same arithmetic could mirror."""

from __future__ import annotations

import random
from collections import Counter

import pytest

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(42)
    docs = []
    for i in range(60):
        n = rng.randint(0, 30)
        toks = [rng.choice(WORDS) for _ in range(n)]
        if i % 5 == 0 and n >= 4:  # force repeated grams
            toks = toks[:4] * 3
        docs.append((i, " ".join(toks)))
    return docs


def _write_docs(spark, tmp_path, docs):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_repetition_signals_match_python_model(spark, tmp_path, corpus):
    from pids_drg_esoa_spark.operators.textstats import text_repetition_signals

    sf = _write_docs(spark, tmp_path, corpus)
    got = {r.doc_id: r for r in text_repetition_signals(spark, sf).collect()}
    for doc_id, text in corpus:
        toks = text.split(" ")
        g2 = Counter(
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        ) if len(toks) >= 2 else Counter()
        g3 = Counter(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ) if len(toks) >= 3 else Counter()
        n2, n3 = sum(g2.values()), sum(g3.values())
        r = got[doc_id]
        assert r.n_2grams == n2
        if n2:
            assert r.top_2gram_frac_micros == max(g2.values()) * 1_000_000 // n2
            dup2 = sum(c for c in g2.values() if c >= 2)
            assert r.dup_2gram_frac_micros == dup2 * 1_000_000 // n2
        else:
            assert r.top_2gram_frac_micros == 0
        if n3:
            assert r.top_3gram_frac_micros == max(g3.values()) * 1_000_000 // n3


def test_span_dedup_matches_python_model(spark, tmp_path, corpus):
    from pids_drg_esoa_spark.operators.dedup import SPAN_W, _BOILERPLATE, dedup_span_exact

    sf = _write_docs(spark, tmp_path, corpus)
    # mirror the operator's planting
    planted = {
        i: (t + " " + _BOILERPLATE if i % 7 == 0 else t) for i, t in corpus
    }
    occ: Counter = Counter()
    windows: dict[int, list[str]] = {}
    for i, t in planted.items():
        toks = t.split(" ")
        ws = [
            " ".join(toks[j : j + SPAN_W]) for j in range(len(toks) - SPAN_W + 1)
        ] if len(toks) >= SPAN_W else []
        windows[i] = ws
        occ.update(ws)
    got = {r.doc_id: r for r in dedup_span_exact(spark, sf).collect()}
    for i in planted:
        ws = windows[i]
        r = got[i]
        assert r.n_windows == len(ws)
        dup = sum(1 for w in ws if occ[w] >= 2)
        assert r.n_dup_windows == dup
        if ws:
            assert r.dup_span_frac_micros == dup * 1_000_000 // len(ws)
