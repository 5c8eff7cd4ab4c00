"""Fuzz the F33 admission gate (``generics_match``) against the LIVE
reference (round 6). The gate decides which candidates survive into
W1 selection and DERIVES match_priority from its reason string
(scoring.py:303-310), so a reason-string divergence silently reorders
winners. Both sides run with their own synonym chain — the
reference's ``lookup.apply_synonym`` (incl. the plural→singular first
-word retry) vs this repo's ``apply_synonym_py`` — over the SAME
synonym dict, so the fuzz also differentials F29.

Grammar covers: comma subtypes ("VITAMIN, FAT-SOLUBLE"), '+' and
'AND' combinations (incl. comma-inside-combo, which must NOT split),
synonym and plural variants, substring fragments (prefix/suffix
chunks), salt-suffixed names, junk/empty inputs, and multi-element
input sets.

Usage: python scripts/fuzz_generics_match_vs_reference.py [n] [seed]
Exit 0 iff zero (matches, reason) tuple mismatches.
"""

from __future__ import annotations

import os
import random
import sys
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.functions.matching import (  # noqa: E402
    generics_match_py,
    parse_generic_with_subtype_py,
)
from pids_drg_esoa_spark.functions.tokens import apply_synonym_py  # noqa: E402
from pids_drg_esoa_spark.functions.vocab_full import (  # noqa: E402
    SPELLING_SYNONYMS_FULL,
)
from scripts.diff_reference import install_rapidfuzz_shim  # noqa: E402

BASES = [
    "PARACETAMOL", "AMOXICILLIN", "CEFTRIAXONE", "SALBUTAMOL",
    "VITAMIN INTRAVENOUS", "AMINO ACIDS", "AMINO ACID",
    "ASCORBIC ACID", "VITAMINS", "MULTIVITAMINS", "IRON",
    "SODIUM ASCORBATE", "CLAVULANIC ACID", "CO-AMOXICLAV",
    "SALBUTAMOL SULFATE", "AMLODIPINE BESILATE", "VIT",
]
SUBTYPES = ["FAT-SOLUBLE", "CRYSTALLINE STANDARD", "WATER-SOLUBLE", "B COMPLEX"]


def gen_name(rng: random.Random, allow_combo: bool = True) -> str:
    r = rng.random()
    if allow_combo and r < 0.25:
        k = rng.choice([2, 2, 3])
        sep = rng.choice([" + ", " AND "])
        parts = [gen_name(rng, allow_combo=False) for _ in range(k)]
        return sep.join(parts)
    base = rng.choice(BASES)
    if rng.random() < 0.25:
        base = f"{base}, {rng.choice(SUBTYPES)}"
    if rng.random() < 0.15:  # substring fragment
        cut = rng.randrange(3, max(4, len(base)))
        base = base[:cut].strip() if rng.random() < 0.5 else base[-cut:].strip()
    if rng.random() < 0.15:
        base = base.lower()
    return base


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = random.Random(seed)

    install_rapidfuzz_shim()
    sys.path.insert(0, "/root/reference")
    from pipelines.drugs.scripts.lookup import apply_synonym as ref_apply
    from pipelines.drugs.scripts.scoring import (
        generics_match as ref_match,
        parse_generic_with_subtype as ref_parse,
    )

    # Same synonym dict on both sides: a slice of the real vocabulary
    # plus synthetic entries that exercise the plural→singular retry.
    syn = dict(list(SPELLING_SYNONYMS_FULL.items())[:400])
    syn.update({"VIT": "VITAMIN", "VITAMINS": "VITAMIN",
                "CO-AMOXICLAV": "AMOXICILLIN + CLAVULANIC ACID"})
    ref_syn_fn = lambda g: ref_apply(g, syn)  # noqa: E731
    our_syn_fn = partial(apply_synonym_py, synonyms=syn)

    bad = bad_parse = 0
    for i in range(n):
        cand = gen_name(rng)
        n_inputs = rng.choice([1, 1, 1, 2, 3])
        inputs = {gen_name(rng, allow_combo=rng.random() < 0.1)
                  for _ in range(n_inputs)}
        if rng.random() < 0.03:
            inputs = set()
        if rng.random() < 0.03:
            cand = ""
        r = ref_match(inputs, cand, ref_syn_fn)
        o = generics_match_py(inputs, cand, our_syn_fn)
        if tuple(r) != tuple(o):
            bad += 1
            print(f"MISMATCH inputs={sorted(inputs)!r} cand={cand!r}\n  ref {r}\n  our {o}")
        pr, po = ref_parse(cand.upper()), parse_generic_with_subtype_py(cand.upper())
        if tuple(pr) != tuple(po):
            bad_parse += 1
            print(f"PARSE MISMATCH {cand!r}: ref {pr} our {po}")

    print(f"{n} fuzzed (inputs, candidate) cases: {bad} gate mismatches, "
          f"{bad_parse} subtype-parse mismatches")
    return 0 if bad == 0 and bad_parse == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
