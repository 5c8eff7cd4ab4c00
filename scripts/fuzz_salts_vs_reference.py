"""Fuzz the two salt-strip functions (F6/F22) against the LIVE
reference (round 7).

Round-7 repair context: the engine previously carried ONE composite
strip that equalled NEITHER reference function — latent because (a)
the differential corpus carried single-salt tails only, and (b) the
reference's own Part 1 (prepare.py, where
``text_utils.extract_base_and_salts`` runs) sits outside the
Parts-2-4 differential, which feeds BOTH sides engine-built unified
tables. Probing found it; the twins are now verbatim and this harness
keeps them that way:

- ``text_utils.extract_base_and_salts``  vs  ``extract_base_and_salts_py``
  (the Part-1 PNF molecule splitter: 'as'-boundary detection, special
  cations, '+'-connectors, measurement/ignore filtering, truncate and
  all-salt fallbacks);
- ``tokenizer.strip_salt_suffix``  vs  ``strip_salt_suffix_pair_py``
  (the tagger/lookup single-suffix strip: pure-compound guard,
  longest-first single suffix, dangling-'AS', 'X AS Y');
- ``text_utils.serialize_salt_list``  vs  ``serialize_salt_list_py``;
- ``lookup.build_combination_keys``  vs  ``build_combination_keys_ref_py``
  (F30 — consumes the strip internally, so this also differentials
  the repaired primitive through its heaviest consumer).

Grammar: generic names × 0-3 salt tails, special-cation compounds,
'as X' / '( as X)' shapes, '+'/'/'-combos, doses and units, form
words, stopwords, alnum codes (b12), lowercase/mixed case, empties.

Usage: python scripts/fuzz_salts_vs_reference.py [n] [seed]
Exit 0 iff zero mismatches on all three functions.
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.functions.text import serialize_salt_list_py  # noqa: E402
from pids_drg_esoa_spark.functions.tokens import (  # noqa: E402
    extract_base_and_salts_py,
    strip_salt_suffix_pair_py,
)

BASES = [
    "PARACETAMOL", "AMLODIPINE", "METFORMIN", "SALBUTAMOL", "FERROUS",
    "SODIUM", "POTASSIUM", "CALCIUM", "ZINC", "MAGNESIUM", "IRON",
    "AMOXICILLIN", "CLAVULANATE", "ALENDRONATE", "ISOSORBIDE",
    "ESOMEPRAZOLE", "VITAMIN", "B12", "CO-AMOXICLAV", "INSULIN",
]
SALTS = [
    "SULFATE", "SULPHATE", "CHLORIDE", "HYDROCHLORIDE", "BESILATE",
    "TRIHYDRATE", "MONOHYDRATE", "DIHYDRATE", "HEPTAHYDRATE", "SODIUM",
    "POTASSIUM", "CALCIUM", "ACETATE", "CITRATE", "PHOSPHATE",
    "DINITRATE", "TARTRATE", "MALEATE", "SUCCINATE", "SALT", "SALTS",
]
JUNK = ["500MG", "0.9%", "5 MG", "TABLET", "SOLUTION", "FOR", "WITH",
        "ML", "10ML", "USP", "PER", "RATIO", "(OP)", "**"]


def gen_name(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.04:
        return ""
    parts: list[str] = [rng.choice(BASES)]
    if rng.random() < 0.3:  # multi-word base
        parts.append(rng.choice(BASES))
    n_salts = rng.choice([0, 1, 1, 2, 3])
    style = rng.random()
    salts = [rng.choice(SALTS) for _ in range(n_salts)]
    if style < 0.5:  # trailing salts
        parts.extend(salts)
    elif style < 0.7 and salts:  # 'as X' tail
        parts.append("as" if rng.random() < 0.5 else "AS")
        parts.extend(salts)
    elif style < 0.85 and salts:  # parenthetical
        parts.append("( as " + " ".join(salts) + ")")
    else:
        parts.extend(salts)
    if rng.random() < 0.35:
        parts.insert(rng.randrange(len(parts) + 1), rng.choice(JUNK))
    if rng.random() < 0.25:  # combination
        parts.append(rng.choice(["+", "/", "AND"]))
        parts.append(rng.choice(BASES))
        if rng.random() < 0.4:
            parts.append(rng.choice(SALTS))
    s = " ".join(parts)
    if rng.random() < 0.25:
        s = s.lower()
    elif rng.random() < 0.15:
        s = s.title()
    return s


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = random.Random(seed)

    sys.path.insert(0, "/root/reference")
    from pipelines.drugs.scripts.lookup import build_combination_keys as ref30
    from pipelines.drugs.scripts.text_utils import (
        extract_base_and_salts as ref6,
        serialize_salt_list as ref_ser,
    )
    from pipelines.drugs.scripts.tokenizer import strip_salt_suffix as ref22

    from pids_drg_esoa_spark.functions.matching import (
        build_combination_keys_ref_py as our30,
    )

    bad6 = bad22 = bad_ser = bad30 = 0
    for i in range(n):
        name = gen_name(rng)
        r6, o6 = ref6(name), extract_base_and_salts_py(name)
        if (r6[0], list(r6[1])) != (o6[0], list(o6[1])):
            bad6 += 1
            print(f"F6 MISMATCH {name!r}: ref {r6} our {o6}")
        if name:  # reference F22 assumes str with .upper()
            r22, o22 = ref22(name), strip_salt_suffix_pair_py(name)
            if tuple(r22) != tuple(o22):
                bad22 += 1
                print(f"F22 MISMATCH {name!r}: ref {r22} our {o22}")
        salts = [rng.choice(SALTS + ["", "  x  "]) for _ in range(rng.randrange(0, 5))]
        if rng.random() < 0.3:
            salts = [s.lower() for s in salts]
        rs, os_ = ref_ser(salts), serialize_salt_list_py(salts)
        if rs != os_:
            bad_ser += 1
            print(f"SERIALIZE MISMATCH {salts!r}: ref {rs!r} our {os_!r}")
        toks = [gen_name(rng) for _ in range(rng.randrange(0, 4))]
        if rng.random() < 0.3:
            toks.append(rng.choice(["+", "MG", "500MG", "(BRAND)", "A+B", ""]))
        r30, o30 = sorted(ref30(toks)), sorted(our30(toks))
        if r30 != o30:
            bad30 += 1
            print(f"F30 MISMATCH {toks!r}:\n  ref {r30}\n  our {o30}")

    total = bad6 + bad22 + bad_ser + bad30
    print(
        f"{n} fuzzed names (seed {seed}): F6={bad6}, F22={bad22}, "
        f"serialize={bad_ser}, combo_keys={bad30} — {total} total mismatches"
    )
    return 0 if total == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
