"""Fuzz the vaccine canon (F31) against the LIVE reference (round 7).

F31 was the one big domain family with goldens + the corpus-density
differential but no committed fuzz harness — the differential only
exercises it at the corpus's vaccine density. This drives all four
reference functions (unified_constants.py:1382-1707) against the
engine's twins (functions/vaccines.py) on composed texts:

- ``normalize_vaccine_name``  — canonical + details (valency, types,
  serogroups, recombinant/attenuated/inactivated, pediatric/adult);
- ``normalize_vaccine_components`` — the deliberately substring-y
  keyword scan (FLU-inside-FLUCONAZOLE parity included);
- ``match_vaccine_text`` — word-bounded acronym scan incl. the short
  acronyms ('MR', 'DT', 'D') that false-positive on drug texts
  (reference behavior, reproduced verbatim);
- ``get_vaccine_acronym`` — reverse component→acronym lookup, over
  random component subsets (incl. unsorted/lowercase inputs).

Grammar: canonical patterns, acronyms (hyphenated PENTA/HEXA family
included), component keywords, misspellings (char drop/dup), valency
and (TYPE/SEROGROUP ...) markers, recombinant/live-attenuated/
inactivated/pediatric/adult markers, '+'/'AND' joins, doses, plain
drug texts, lowercase variants, empty strings.

Usage: python scripts/fuzz_vaccines_vs_reference.py [n] [seed]
Exit 0 iff zero mismatches across all four functions.
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.functions.vaccines import (  # noqa: E402
    VACCINE_ACRONYM_TO_COMPONENTS,
    VACCINE_CANONICAL,
    VACCINE_COMPONENT_KEYWORDS,
    get_vaccine_acronym_py,
    match_vaccine_text_py,
    normalize_vaccine_components_py,
    normalize_vaccine_name_py,
)

FILLERS = [
    "0.5 ML", "1 DOSE", "PRE-FILLED SYRINGE", "SINGLE DOSE VIAL",
    "10-VALENT", "23 VALENT", "13-VALENT", "(TYPES 6, 11, 16, 18)",
    "(TYPE A)", "SEROGROUP A, C, W, Y", "GROUP B", "RECOMBINANT",
    "LIVE ATTENUATED", "INACTIVATED", "PEDIATRIC", "JUNIOR", "ADULT",
    "FOR INJECTION", "IM", "SUSPENSION",
]
DRUGS = [
    "FLUCONAZOLE 150MG CAPSULE", "PARACETAMOL 500 MG TABLET",
    "35 MG MR TABLET", "METOPROLOL 50MG", "DILTIAZEM CD 120MG",
    "VITAMIN D 1000 IU", "TETANUS IMMUNOGLOBULIN 250 IU",
]
MARKERS = ["VACCINE", "TOXOID", "VACCINE", ""]  # sometimes absent


def _mutate(rng: random.Random, s: str) -> str:
    if len(s) < 4 or rng.random() < 0.5:
        return s
    i = rng.randrange(1, len(s) - 1)
    return s[:i] + s[i + 1 :] if rng.random() < 0.5 else s[:i] + s[i] + s[i:]


def gen_text(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.05:
        return ""
    if r < 0.15:  # plain drug text — the false-positive surface
        return rng.choice(DRUGS)
    pieces: list[str] = []
    kind = rng.random()
    if kind < 0.35:  # canonical-pattern based
        pats = VACCINE_CANONICAL[rng.choice(list(VACCINE_CANONICAL))]
        pieces.append(_mutate(rng, rng.choice(pats)))
    elif kind < 0.60:  # acronym based (word-bounded scan target)
        pieces.append(rng.choice(list(VACCINE_ACRONYM_TO_COMPONENTS)))
    else:  # component-keyword based, possibly joined
        k = rng.choice([1, 1, 2, 3])
        sep = rng.choice([" + ", " AND ", ", "])
        pieces.append(
            sep.join(
                _mutate(rng, rng.choice(list(VACCINE_COMPONENT_KEYWORDS)))
                for _ in range(k)
            )
        )
    if rng.random() < 0.6:
        pieces.append(rng.choice(MARKERS))
    if rng.random() < 0.5:
        pieces.append(rng.choice(FILLERS))
    if rng.random() < 0.25:
        pieces.insert(0, rng.choice(FILLERS))
    text = " ".join(p for p in pieces if p)
    if rng.random() < 0.2:
        text = text.lower()
    return text


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = random.Random(seed)

    sys.path.insert(0, "/root/reference")
    from pipelines.drugs.scripts import unified_constants as uc

    comps_pool = sorted({c for v in VACCINE_ACRONYM_TO_COMPONENTS.values() for c in v})
    bad = {"name": 0, "components": 0, "match": 0, "acronym": 0}
    for i in range(n):
        text = gen_text(rng)
        rn, on = uc.normalize_vaccine_name(text), normalize_vaccine_name_py(text)
        if tuple(rn) != tuple(on):
            bad["name"] += 1
            print(f"NAME MISMATCH {text!r}: ref {rn} our {on}")
        rc, oc = uc.normalize_vaccine_components(text), normalize_vaccine_components_py(text)
        if list(rc) != list(oc):
            bad["components"] += 1
            print(f"COMPONENTS MISMATCH {text!r}: ref {rc} our {oc}")
        rm, om = uc.match_vaccine_text(text), match_vaccine_text_py(text)
        if (rm[0], list(rm[1]) if rm[1] else rm[1]) != (
            om[0], list(om[1]) if om[1] else om[1]
        ):
            bad["match"] += 1
            print(f"MATCH MISMATCH {text!r}: ref {rm} our {om}")
        # reverse lookup over random component subsets
        subset = rng.sample(comps_pool, rng.randrange(1, 5))
        if rng.random() < 0.3:
            subset = [c.lower() for c in subset]
        ra, oa = uc.get_vaccine_acronym(subset), get_vaccine_acronym_py(subset)
        if ra != oa:
            bad["acronym"] += 1
            print(f"ACRONYM MISMATCH {subset!r}: ref {ra} our {oa}")

    total = sum(bad.values())
    print(
        f"{n} fuzzed texts (seed {seed}): "
        + ", ".join(f"{k}={v}" for k, v in bad.items())
        + f" — {total} total mismatches"
    )
    return 0 if total == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
