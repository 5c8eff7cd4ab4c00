"""Fuzz the tokenize→normalize→categorize twin against the LIVE
reference (round 6): generate thousands of drug-description-shaped
texts from a grammar of doses, forms (full words AND abbreviations),
routes, salts, parentheticals, multiwords, punctuation and junk, run
BOTH the reference chain (tokenizer.extract_generic_tokens →
categorize_tokens) and this repo's twin
(split_with_parentheses_py → detect_compound_salts_py →
normalize_tokens_py → categorize_tokens_py) and compare the
dose/form/route category dicts — the columns Part 4's gates consume.

The dense-annex differential caught the form-stopword asymmetry this
chain twins (SCALE.md round 6); this fuzzer is the breadth check that
there is no second asymmetry hiding in the vocabulary.

Usage: python scripts/fuzz_tokens_vs_reference.py [n_cases] [seed]
Exit 0 iff zero mismatching category dicts.
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.functions.tokens import (  # noqa: E402
    categorize_tokens_py,
    detect_compound_salts_py,
    normalize_tokens_py,
    split_with_parentheses_py,
)
from scripts.diff_reference import install_rapidfuzz_shim  # noqa: E402

GENERICS = [
    "PARACETAMOL", "AMOXICILLIN", "ALBUMYCIN", "CEFTRIAXONE", "SALBUTAMOL",
    "METFORMIN", "LOSARTAN", "VITAMIN", "B12", "IRON", "ZINC", "CALCIUM",
    "SODIUM", "CHLORIDE", "ASCORBIC", "ACID", "DEXTROSE",
]
DOSES = ["500MG", "1 G", "2.5 mg", "250 MG/5 ML", "0.9%", "5 %", "1000 IU",
         "10 MCG", "50", "500/125 MG", "1,000 MG", "2G"]
FORMS = ["TABLET", "TAB", "TABS", "CAPSULE", "CAP", "CAPS", "VIAL", "VL",
         "AMPULE", "AMP", "SUSPENSION", "SUSP", "NEBULE", "NEB", "SYRUP",
         "SYR", "OINTMENT", "SOLUTION", "SOL", "DROPS", "GTTS", "INJ",
         "POWDER", "PWDR", "MDI", "SACHET", "SUPP", "FC", "EC", "SR", "XR"]
ROUTES = ["ORAL", "PO", "IV", "IM", "SC", "INHALATION", "TOPICAL", "PR",
          "SL", "OPHTHALMIC", "PER OREM"]
EXTRAS = ["( as SODIUM SALT)", "(OP)", "(100'S)", "**", "+", "IN", "WITH",
          "FOR", "10 X", "( as HCl )", "[BRAND]", "NON-PNF", ";", ","]


def gen_text(rng: random.Random) -> str:
    parts = [rng.choice(GENERICS)]
    if rng.random() < 0.3:
        parts.append(rng.choice(GENERICS))
    for pool, p in ((DOSES, 0.9), (FORMS, 0.8), (ROUTES, 0.3), (EXTRAS, 0.4)):
        if rng.random() < p:
            parts.append(rng.choice(pool))
    if rng.random() < 0.2:
        rng.shuffle(parts)
    text = " ".join(parts)
    if rng.random() < 0.2:
        text = text.lower()
    elif rng.random() < 0.1:
        text = text.title()
    return text


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = random.Random(seed)

    install_rapidfuzz_shim()
    sys.path.insert(0, "/root/reference")
    from pipelines.drugs.scripts.tokenizer import (
        categorize_tokens as ref_categorize,
        extract_generic_tokens as ref_extract,
    )

    multiword = frozenset({"CLAVULANIC ACID", "ASCORBIC ACID", "SODIUM CHLORIDE"})
    bad = 0
    for i in range(n):
        t = gen_text(rng)
        ref_toks, _ = ref_extract(t, set(multiword))
        ref_cats = ref_categorize(ref_toks)
        ours = categorize_tokens_py(
            normalize_tokens_py(
                detect_compound_salts_py(split_with_parentheses_py(t)),
                multiword_generics=multiword,
                original_text=t,
            )
        )
        for cat in ("dose", "form", "route"):
            r = {k.upper(): v for k, v in ref_cats.get(cat, {}).items()}
            o = {k.upper(): v for k, v in ours.get(cat, {}).items()}
            if r != o:
                bad += 1
                print(f"MISMATCH [{cat}] {t!r}\n  ref {r}\n  our {o}")
                break
    print(f"{n} fuzzed texts, {bad} category mismatches")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
