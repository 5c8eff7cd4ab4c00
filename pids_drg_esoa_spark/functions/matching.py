"""Generic-name matching predicates (F32/F33, reference scoring.py).

- ``parse_generic_with_subtype_py`` (F32, scoring.py:89-105): comma
  separates a base name from its subtype ('AMINO ACIDS, CRYSTALLINE
  STANDARD'); combinations (' + ', ' AND ') never split on comma.
- ``generics_match_py`` (F33, scoring.py:108-200): the reference's
  candidate-admission predicate with its exact reason labels —
  exact / exact_with_subtype / substring / combo_match /
  combo_partial / combo_no_match / no_match / missing_generic. The
  reason maps to W1 match_priority {exact*: 0, combo_match: 1,
  substring: 2, combo_partial: 3, else 4} (scoring.py:303-310).

Differential-tested against the reference implementation in
tests/test_matching.py (same inputs, same (matches, reason) tuples).
"""

from __future__ import annotations

import re
from collections.abc import Callable


def parse_generic_with_subtype_py(generic: str) -> tuple[str, str | None]:
    if "," in generic and " + " not in generic and " AND " not in generic:
        base, _, subtype = generic.partition(",")
        return base.strip(), subtype.strip()
    return generic, None


MATCH_PRIORITY: dict[str, int] = {
    "exact": 0,
    "exact_with_subtype": 0,
    "combo_match": 1,
    "substring": 2,
    "combo_partial": 3,
}

_COMBO_SPLIT_RE = re.compile(r"\s*\+\s*|\s+AND\s+")


def generics_match_py(
    input_generics: set[str],
    candidate_generic: str,
    apply_synonyms: Callable[[str], str] = lambda g: g.upper(),
) -> tuple[bool, str]:
    if not input_generics or not candidate_generic:
        return False, "missing_generic"

    cand_upper = candidate_generic.upper()
    cand_normalized = apply_synonyms(cand_upper)
    cand_base, cand_subtype = parse_generic_with_subtype_py(cand_upper)
    cand_base_normalized = apply_synonyms(cand_base)

    if " + " in cand_upper or " AND " in cand_upper:
        cand_parts = {p.strip() for p in _COMBO_SPLIT_RE.split(cand_upper) if p.strip()}
        cand_parts_normalized = {apply_synonyms(p) for p in cand_parts}
        input_normalized = {apply_synonyms(g) for g in input_generics}
        if input_normalized & cand_parts_normalized:
            return True, "combo_match"
        for inp in input_normalized:
            for cp in cand_parts_normalized:
                if inp in cp or cp in inp:
                    return True, "combo_partial"
        return False, "combo_no_match"

    for inp in input_generics:
        inp_normalized = apply_synonyms(inp)
        inp_base, inp_subtype = parse_generic_with_subtype_py(inp)
        inp_base_normalized = apply_synonyms(inp_base)

        base_matches = (
            inp_base_normalized == cand_base_normalized
            or inp_base_normalized == cand_base
            or inp_base_normalized in cand_base_normalized
            or cand_base_normalized in inp_base_normalized
            or inp_base in cand_base
            or cand_base in inp_base
        )
        if not base_matches:
            continue

        if inp_subtype:
            if not cand_subtype:
                continue  # input demands a subtype the candidate lacks
            if (
                inp_subtype.upper() in cand_subtype.upper()
                or cand_subtype.upper() in inp_subtype.upper()
            ):
                return True, "exact_with_subtype"
            continue

        if inp_normalized == cand_normalized or inp_normalized == cand_upper:
            return True, "exact"
        return True, "substring"

    return False, "no_match"
