"""Fuzz the F1-F5 text primitives against the LIVE reference
(round 7) — the most-consumed functions in the engine: every
tokenizer, strip, key, and dose parse flows through
``normalize_text`` first, so a single-character divergence here
fans out everywhere. Compared:

- ``text_utils.normalize_text``    vs ``normalize_text_py``   (F1)
- ``text_utils.normalize_compact`` vs ``normalize_compact``   (F2)
- ``text_utils.slug_id``           vs ``slug_id_py``          (F4)
- ``text_utils.clean_atc``         vs ``clean_atc_py``        (F3)
- ``text_utils.strip_after_as`` / ``detect_as_boundary``
  vs the F6 boundary logic (via extract_base_and_salts, already
  fuzzed in fuzz_salts — here the raw boundary function pair).

Grammar: drug-description shapes with accents/unicode (é, ñ, µ),
unit-typo rewrites the reference folds (milligram→mg,
polymixin→polymyxin, hydrochlorde→hydrochloride), mixed case,
punctuation runs, parentheticals, doses, tabs/NBSP whitespace,
'as'-salt tails, ATC-code-ish strings with stray spaces/case/junk.

Usage: python scripts/fuzz_text_vs_reference.py [n] [seed]
Exit 0 iff zero mismatches across all five pairs.
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.functions.text import (  # noqa: E402
    clean_atc_py,
    normalize_text_py,
    slug_id_py,
)
from pids_drg_esoa_spark.functions.tokens import _f6_salt_tail  # noqa: E402

WORDS = [
    "Paracetamol", "AMOXICILLIN", "céfuroxime", "ibuprofén", "SODIUM",
    "chloride", "milligram", "polymixin", "hydrochlorde", "Vitamin",
    "B-Complex", "co-amoxiclav", "d5 water", "ringer's", "ñino",
    "µg", "SULFATE", "as", "AND/OR", "per", "USP", "(as besilate)",
    "10 x 500", "0.9%", "500MG", "mg/5ml", "SOLUTION", "tab.",
    "[brand]", "{x}", "détails", "naïve", "²", "™",
]
SEPS = [" ", "  ", "\t", ", ", " - ", "/", " + ", " "]


def gen_text(rng: random.Random) -> str:
    if rng.random() < 0.04:
        return ""
    n = rng.randrange(1, 8)
    parts = [rng.choice(WORDS) for _ in range(n)]
    s = ""
    for i, p in enumerate(parts):
        s += p
        if i < n - 1:
            s += rng.choice(SEPS)
    if rng.random() < 0.2:
        s = " " + s + "  "
    if rng.random() < 0.15:
        s = s.upper()
    return s


def gen_atc(rng: random.Random) -> str | None:
    r = rng.random()
    if r < 0.06:
        return None
    if r < 0.12:
        return ""
    body = "".join(
        rng.choice("abcdefghijklmnABCDEFGHIJ0123456789") for _ in range(rng.randrange(3, 9))
    )
    if rng.random() < 0.3:
        body = " " + body + "  "
    if rng.random() < 0.2:
        body = body[:3] + " " + body[3:]
    if rng.random() < 0.15:
        body += rng.choice([".", ";", "-x"])
    return body


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = random.Random(seed)

    sys.path.insert(0, "/root/reference")
    from pipelines.drugs.scripts import text_utils as tu

    bad = {"normalize": 0, "compact": 0, "slug": 0, "atc": 0, "boundary": 0}
    for i in range(n):
        s = gen_text(rng)
        r1, o1 = tu.normalize_text(s), normalize_text_py(s)
        if r1 != o1:
            bad["normalize"] += 1
            print(f"NORMALIZE MISMATCH {s!r}: ref {r1!r} our {o1!r}")
        # engine normalize_compact is a Column; its Python form is
        # re-derived the same way the reference derives it
        import re as _re

        o2 = _re.sub(r"[ \-]", "", normalize_text_py(s))
        r2 = tu.normalize_compact(s)
        if r2 != o2:
            bad["compact"] += 1
            print(f"COMPACT MISMATCH {s!r}: ref {r2!r} our {o2!r}")
        r3, o3 = tu.slug_id(s), slug_id_py(s)
        if r3 != o3:
            bad["slug"] += 1
            print(f"SLUG MISMATCH {s!r}: ref {r3!r} our {o3!r}")
        a = gen_atc(rng)
        r4, o4 = tu.clean_atc(a), clean_atc_py(a)
        if r4 != o4:
            bad["atc"] += 1
            print(f"ATC MISMATCH {a!r}: ref {r4!r} our {o4!r}")
        # 'as'-boundary on the normalized token stream
        toks = normalize_text_py(s).split()
        for idx, tok in enumerate(toks):
            if tok != "as":
                continue
            rb = tu._looks_like_salt_tail(toks, idx + 1)
            ob = _f6_salt_tail(toks, idx + 1)
            if rb != ob:
                bad["boundary"] += 1
                print(f"BOUNDARY MISMATCH {toks!r}@{idx}: ref {rb} our {ob}")

    total = sum(bad.values())
    print(
        f"{n} fuzzed texts (seed {seed}): "
        + ", ".join(f"{k}={v}" for k, v in bad.items())
        + f" — {total} total mismatches"
    )
    return 0 if total == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
