"""Fixed-seed smoke runs of the two heaviest live-reference fuzz
harnesses (r10 judge item #8): the full campaigns run per-round at
large n with fresh seeds; these pinned small-n runs ride the DEFAULT
pytest run so a refactor between rounds cannot silently regress the
tagger twins or the Part-4 ranking twins.

Subprocess execution on purpose: each harness builds its own
SparkSession (different cpu/partition settings than the test
fixture's) and runs the reference via subprocesses of its own —
isolation keeps the session-scoped test fixture untouched.

Deselect with `-m "not fuzz_smoke"` when iterating on unrelated code.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, *args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=900,
    )


@pytest.mark.fuzz_smoke
def test_corpus_fuzz_smoke_pinned_seed():
    # 200 composed texts, pinned seed — reference runs 3 ways
    # (PYTHONHASHSEED 0/42, reversed cache) per PARITY classes 3/4/6
    p = _run("fuzz_tagger_corpus_vs_reference.py", "200", "777")
    tail = "\n".join(p.stdout.splitlines()[-5:])
    assert p.returncode == 0, f"corpus fuzz regressed:\n{tail}\n{p.stderr[-2000:]}"
    assert "TOTAL mismatching cells: 0" in p.stdout, tail


@pytest.mark.fuzz_smoke
def test_part4_ranking_fuzz_smoke_pinned_seed():
    p = _run("fuzz_part4_ranking_vs_reference.py", "1000", "888")
    tail = "\n".join(p.stdout.splitlines()[-5:])
    assert p.returncode == 0, f"part4 fuzz regressed:\n{tail}\n{p.stderr[-2000:]}"
    assert "0 mismatches" in p.stdout, tail
