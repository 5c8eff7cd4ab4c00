"""Frame-sampling operator edge cases (operators/multimodal.py):
stride/cap semantics, short and empty payloads, and the 1→N in-batch
explosion staying inside one mapInPandas pass."""

from __future__ import annotations

import hashlib

from pids_drg_esoa_spark.operators.multimodal import (
    FRAME_CHARS,
    FRAME_STRIDE,
    MAX_FRAMES,
    sample_frames,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = sample_frames(df, "text", "doc_id")
    return sorted((r["doc_id"], r["frame_idx"], r["frame_md5"]) for r in out.collect())


def test_short_and_empty_payloads_emit_no_partial_frames(spark):
    got = _run(spark, [(1, ""), (2, "x" * (FRAME_CHARS - 1)), (3, "y" * FRAME_CHARS)])
    # only doc 3 has one COMPLETE frame; partials never emit
    assert got == [(3, 0, hashlib.md5(("y" * FRAME_CHARS).encode()).hexdigest())]


def test_stride_and_cap(spark):
    # 40 frames → sampled at 0,4,...,28 (8 frames, cap hit)
    text = "".join(chr(ord("a") + (i % 26)) * FRAME_CHARS for i in range(40))
    # build per-frame payload where frame i is one repeated letter
    frames = [text[i * FRAME_CHARS:(i + 1) * FRAME_CHARS] for i in range(40)]
    got = _run(spark, [(7, text)])
    assert [g[1] for g in got] == [0, 4, 8, 12, 16, 20, 24, 28]
    assert len(got) == MAX_FRAMES
    for _, idx, digest in got:
        assert digest == hashlib.md5(frames[idx].encode()).hexdigest()
    assert FRAME_STRIDE == 4  # oracle text hard-codes the stride