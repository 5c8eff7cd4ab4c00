"""BPE tokenizer (operators/bpe.py) vs an INDEPENDENT pure-Python
Sennrich implementation: the Spark side works on sentinel-wrapped
strings with chained replace; this twin works on token LISTS with an
explicit left-to-right merge scan — agreement pins the semantics, not
the representation. Plus budget/packing consistency."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pids_drg_esoa_spark.operators.bpe import (
    NUM_MERGES,
    bpe_encode,
    bpe_train,
    word_counts,
)

# ---------------------------------------------------------------- twin


def _py_norm_words(text: str) -> list[str]:
    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if w]


def _py_apply(toks: list[str], left: str, right: str) -> list[str]:
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _py_train(word_freqs: dict[str, int], num_merges: int):
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            t = vocab[w]
            for a, b in zip(t, t[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), cnt = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x01" + kv[0][1])
        )[0]
        merges.append((rank, left, right, cnt))
        vocab = {w: _py_apply(t, left, right) for w, t in vocab.items()}
    return merges


def _py_encode_counts(text: str, merges) -> int:
    n = 0
    for w in _py_norm_words(text):
        t = list(w)
        for _, left, right, _ in merges:
            t = _py_apply(t, left, right)
        n += len(t)
    return n


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def trained(docs):
    return bpe_train(docs, NUM_MERGES)


def test_train_matches_pure_python(docs, trained):
    wf = {r["word"]: r["freq"] for r in word_counts(docs).collect()}
    assert _py_train(wf, NUM_MERGES) == trained
    assert len(trained) == NUM_MERGES  # capacity never ran out


def test_encode_matches_pure_python(docs, trained):
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_encode(docs, trained).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    assert set(got) == set(texts)
    for did, text in texts.items():
        assert got[did] == _py_encode_counts(text, trained), did


def test_bpe_text_token_count_consistent(docs, trained):
    """The rendered tokenization agrees with the count column: tokens
    = '|'-pieces within space-separated words."""
    for r in bpe_encode(docs, trained).collect():
        n = sum(len(w.split("|")) for w in r["bpe_text"].split(" ") if w)
        assert n == r["n_bpe_tokens"]


def test_budget_bpe_exact_prefix_and_packing_parity(spark, docs, trained):
    """prefix_sum_budget_cut over BPE counts == the naive driver-side
    prefix scan (budget semantics), and per-source packing bins over
    BPE counts computed via the Spark window == a pure-Python
    groupwise pack — the packing parity check."""
    from pyspark.sql import Window as W

    from pids_drg_esoa_spark.operators.training_prep import prefix_sum_budget_cut

    enc = bpe_encode(docs, trained).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )
    h = F.md5(F.concat(F.lit("budget1:"), F.col("doc_id").cast("string")))
    b = enc.select("doc_id", h.alias("h"), "n_tokens")
    got = {
        r["doc_id"]: (r["n_tokens"], r["cum_tokens"])
        for r in prefix_sum_budget_cut(b, 30_000).collect()
    }
    rows = sorted(b.collect(), key=lambda r: (r["h"], r["doc_id"]))
    cum, expect = 0, {}
    for r in rows:
        cum += r["n_tokens"]
        if cum <= 30_000:
            expect[r["doc_id"]] = (r["n_tokens"], cum)
    assert got == expect and 0 < len(expect) < len(rows)

    # packing parity: bin_id/bin_offset per source from BPE counts
    src = docs.select("doc_id", "source").join(enc, "doc_id")
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    packed = src.select(
        "doc_id",
        "source",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start"),
    ).select(
        "doc_id",
        F.floor(F.col("start") / 512).cast("bigint").alias("bin_id"),
        (F.col("start") % 512).cast("bigint").alias("bin_offset"),
    )
    got_p = {r["doc_id"]: (r["bin_id"], r["bin_offset"]) for r in packed.collect()}
    by_src: dict[str, list] = {}
    for r in sorted(src.collect(), key=lambda r: r["doc_id"]):
        by_src.setdefault(r["source"], []).append(r)
    expect_p = {}
    for rows_s in by_src.values():
        start = 0
        for r in rows_s:
            expect_p[r["doc_id"]] = (start // 512, start % 512)
            start += r["n_tokens"]
    assert got_p == expect_p


def test_scalable_encoder_parity(spark, docs, trained):
    """The production rank-dict pandas_udf encoder produces EXACTLY
    the replace-chain encoder's output — including empty and
    punctuation-only documents."""
    from pids_drg_esoa_spark.operators.bpe import bpe_encode_scalable

    extra = spark.createDataFrame(
        [(9001, ""), (9002, "!!! ---"), (9003, "KEY agg ROW key")],
        "doc_id bigint, text string",
    )
    corpus = docs.select("doc_id", "text").unionByName(extra)
    a = {r["doc_id"]: (r["n_bpe_tokens"], r["bpe_text"])
         for r in bpe_encode(corpus, trained).collect()}
    b = {r["doc_id"]: (r["n_bpe_tokens"], r["bpe_text"])
         for r in bpe_encode_scalable(corpus, trained).collect()}
    assert a == b
    assert a[9001] == (0, "") and a[9002] == (0, "")


def test_scalable_trainer_parity_64_merges(docs):
    """The delta-maintained driver trainer must be byte-identical to
    the one-job-per-merge distributed trainer, well past the demo
    merge count (64 covers multi-char symbol pairs, lazy-heap
    invalidation, and decrement-only pairs)."""
    from pids_drg_esoa_spark.operators.bpe import bpe_train_scalable

    naive = bpe_train(docs, 64)
    fast = bpe_train_scalable(docs, 64)
    assert fast == naive
    assert len(fast) == 64


def test_scalable_trainer_2k_merges(docs):
    """Production merge counts are ONE distributed pass + driver work:
    2K merges must complete (vocab may exhaust first on the small SF —
    then every merge down to pair_count 1 was emitted) and stay
    prefix-consistent with a shorter run."""
    from pids_drg_esoa_spark.operators.bpe import bpe_train_scalable

    m2k = bpe_train_scalable(docs, 2048)
    m64 = bpe_train_scalable(docs, 64)
    assert m2k[:64] == m64
    assert len(m2k) > 64
    ranks = [r for r, *_ in m2k]
    assert ranks == list(range(1, len(m2k) + 1))
    assert all(c >= 1 for *_ , c in m2k)


def test_scalable_trainer_max_words_cutoff(spark, docs):
    """The ``max_words`` frequency-cutoff path (r9, VERDICT #3): keep
    the top-N words by (freq DESC, word ASC) and train on that
    sub-vocabulary. Pin two properties:

    1. EXACTNESS on the kept set: the cutoff run is byte-identical to
       training on a corpus containing exactly those top-N words (the
       cutoff is a corpus restriction, nothing more).
    2. Measured drift vs the full-vocab table: top-N by frequency is
       the standard web-scale practice, but its merge-table divergence
       is characterized here, not assumed — the dominant early merges
       (driven by high-frequency words) must agree; the tail may
       reorder as dropped words stop contributing pair counts.
    """
    from pids_drg_esoa_spark.operators.bpe import bpe_train_scalable

    wf = {r["word"]: int(r["freq"]) for r in word_counts(docs).collect()}
    n_keep = max(4, 9 * len(wf) // 10)
    assert len(wf) > n_keep  # the cutoff actually bites

    cut = bpe_train_scalable(docs, 64, max_words=n_keep)

    # property 1: identical to training on exactly the kept words
    kept = sorted(sorted(wf.items(), key=lambda x: (-x[1], x[0]))[:n_keep])
    kept_docs = spark.createDataFrame(
        [(" ".join([w] * f),) for w, f in kept], "text string"
    )
    direct = bpe_train_scalable(kept_docs, 64)
    assert cut == direct

    # property 2: drift characterization vs the full table
    full = bpe_train_scalable(docs, 64)
    full_pairs = {(l, r) for _, l, r, _ in full}
    cut_pairs = {(l, r) for _, l, r, _ in cut}
    overlap = len(full_pairs & cut_pairs) / max(len(full_pairs), 1)
    # Measured on the sf corpora (V=31 at sf0.001): a 90% keep gives
    # overlap ≈0.91; 50% keep degrades to ≈0.53 and 25% to 0.25 —
    # i.e. drift scales with how hard the cutoff bites the pair mass,
    # NOT a free lunch (the SCALE.md table records the curve). Pin a
    # loose floor for the gentle cutoff so the test asserts "similar",
    # not the corpus-specific number.
    assert overlap >= 0.7, f"cutoff drift too large: overlap={overlap:.2f}"
