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

WIRED into plans/tagger.py (round 4): the doc-enrich crossing computes
``stripped_generics_py`` per distinct text, the post-fuzzy input set
comes from ``normalized_input_set_py``, and every non-mixture
candidate passes the ``generics_match_py`` admission gate with
match_priority derived from the reason map; gate behavior is pinned by
tests/test_tagger.py::test_f33_* and the ``tagger_f33_gate_planted``
catalog oracle. Selection-side helpers:

- ``stripped_generics_py`` (tagger.py:624-630, 705-722): brand-swap →
  pure-salt/multiword-generic guard → salt-strip → defensive junk
  filter, per component (multiword generics such as ISOSORBIDE
  DINITRATE pass through unstripped, mirroring _strip_salt
  tagger.py:303-307).
- ``build_multiword_generics_py`` (tagger.py:273-290): the protection
  set — dim names with spaces + MULTIWORD_GENERICS + plural variants.
- ``build_combination_keys_ref_py`` (lookup.py:309-405): the
  reference-shaped UPPERCASE combo-key builder the selection path
  uses (distinct from the repo's lowercase unified-join F30 builder).
- ``input_generics_normalized_py`` (tagger.py:884-913): the per-doc
  input set generics_match validates against — fuzzy corrections win
  over synonym application; combo-key variants join the set only when
  synonym application actually rewrites them (ETHYL ALCOHOL→ETHANOL).
- ``mixture_component_key_py`` (tagger.py:309-340 _lookup_mixture):
  synonym-normalized, substring-deduped (longest first), sorted
  '|'-join — the fallback mixture lookup key.
- ``iv_vehicle_skip_py`` (scoring.py:249-266): for IV solutions, a
  candidate matching the vehicle but not the active ingredient is
  inadmissible.

Known deterministic divergences from the reference (documented, not
bugs): (a) ``generics_match`` iterates a Python ``set`` whose order
is hash-randomized per process — the repo passes a SORTED list so the
returned reason is stable; (b) fuzzy corrections map per stripped
generic (the component whose lookup actually fuzzy-matched) where the
reference assigns each fuzzy match to the first not-yet-corrected
stripped generic in input order (tagger.py:888-896) — identical
except on multi-component inputs with multiple fuzzy hits;
(c) ``build_combination_keys_ref_py`` returns sorted keys where the
reference returns hash-ordered ``list(set)`` — membership-equivalent.
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


# ---------------------------------------------------------------------------
# Selection-side helpers: build the per-doc input set the reference
# validates candidates against, and the admission gates around it.
# ---------------------------------------------------------------------------

# Reference tagger.py:712-719 defensive filter on stripped generics.
_SG_JUNK = frozenset(
    {"FC", "EC", "SR", "XR", "ER", "DR", "NON-PNF", "NONPNF", "MG", "ML",
     "TABLET", "CAPSULE", "SOLUTION"}
)
# Reference tagger.py:906,912 normalization junk.
_NORM_JUNK = frozenset({"+", "MG/5"})
# Reference tagger.py:314-316 _lookup_mixture junk.
_MIX_JUNK = frozenset({"+", "MG", "ML", "MCG", "G", "L", ""})
# Reference lookup.py:317 build_combination_keys junk.
_CK_JUNK = frozenset({"+", "MG/5", "MG", "G", "MCG", "ML", "L", "PCT"})
# Reference lookup.py:353 extra compound-suffix strip inside the
# combo-key builder (beyond the standard salt run).
_CK_COMPOUND_SUFFIXES = (
    "HYDROXIDE", "CHLORIDE", "SULFATE", "SULPHATE",
    "CARBONATE", "PHOSPHATE", "ACETATE", "CITRATE",
)
_CK_EMBEDDED_PLUS_RE = re.compile(r"\s*\+\s*")


def build_multiword_generics_py(dim_generic_names=()) -> frozenset[str]:
    """The tagger's multiword-generics protection set (reference
    tagger.py:273-290): every dim generic name containing a space,
    plus the MULTIWORD_GENERICS constants, plus a plural-first-word
    variant of each ('AMINO ACIDS CRYSTALLINE' style). Members pass
    through salt-stripping unchanged (_strip_salt, tagger.py:303-307)."""
    from .constants import MULTIWORD_GENERICS

    mw: set[str] = {str(n).upper() for n in dim_generic_names if " " in str(n)}
    mw.update(m.upper() for m in MULTIWORD_GENERICS)
    plurals: set[str] = set()
    for m in mw:
        words = m.split()
        if words and not words[0].endswith("S"):
            plurals.add(" ".join([words[0] + "S"] + words[1:]))
    return frozenset(mw | plurals)


def build_combination_keys_ref_py(generic_tokens: list[str]) -> list[str]:
    """Reference-shaped combo-key builder (lookup.py:309-405), distinct
    from the repo's lowercase unified-join variant (F30,
    tokens.build_combination_keys_py): UPPERCASE keys; digit- and
    paren-bearing tokens dropped; embedded '+' split; standard salt
    strip plus an extra HYDROXIDE/CHLORIDE/… suffix class; [] unless
    ≥2 clean parts survive. 'ALUMINUM HYDROXIDE','MAGNESIUM HYDROXIDE'
    → keys containing 'ALUMINUM + MAGNESIUM'. Returned sorted (the
    reference returns ``list(set)`` — hash order; callers use the keys
    for set-membership only, so order never matters)."""
    from .tokens import strip_salt_suffix_py

    clean: list[str] = []
    for g in generic_tokens or []:
        if not g:
            continue
        g_upper = g.upper()
        if g_upper in _CK_JUNK:
            continue
        if any(c.isdigit() for c in g):
            continue
        if "(" in g or ")" in g:
            continue
        g_clean = g_upper.rstrip("+").strip()
        if not g_clean:
            continue
        if "+" in g_clean:
            for part in _CK_EMBEDDED_PLUS_RE.split(g_clean):
                part = part.strip()
                if part and part not in _CK_JUNK:
                    clean.append(part)
        else:
            clean.append(g_clean)
    if len(clean) < 2:
        return []

    base_parts: list[str] = []
    for part in clean:
        stripped = strip_salt_suffix_py(part.upper()).upper()
        for suffix in _CK_COMPOUND_SUFFIXES:
            if stripped.endswith(" " + suffix):
                stripped = stripped[: -len(suffix) - 1].strip()
                break
        if stripped:
            base_parts.append(stripped)
    unique_parts = list(dict.fromkeys(base_parts))
    if len(unique_parts) < 2:
        return []

    keys: set[str] = set()
    sorted_parts = sorted(unique_parts)
    keys.add(" + ".join(sorted_parts))
    keys.add(" + ".join(unique_parts))
    keys.add(" + ".join(unique_parts[::-1]))
    keys.add(" AND ".join(sorted_parts))
    keys.add(" AND ".join(sorted_parts[::-1]))
    if len(sorted_parts) > 2:
        keys.add(", ".join(sorted_parts[:-1]) + " AND " + sorted_parts[-1])
    keys.add(" ".join(unique_parts))
    keys.add(" ".join(unique_parts[::-1]))
    return sorted(keys)


def _strip_component(
    comp: str,
    brand_map: dict[str, str],
    multiword_generics: frozenset[str],
) -> str:
    """One component through the reference's swap→guard→strip chain:
    brand→generic swap (tagger.py:624-630), then pure-salt and
    multiword-generic protection, then salt strip (_strip_salt,
    tagger.py:303-307). Returns the UPPERCASE base ('' if empty)."""
    from .constants import PURE_SALT_COMPOUNDS
    from .tokens import strip_salt_suffix_py

    up = comp.upper().strip()
    sw = brand_map.get(up, up)
    if sw.lower() in PURE_SALT_COMPOUNDS or sw.upper() in multiword_generics:
        return sw.upper().strip()
    return strip_salt_suffix_py(sw).strip().upper()


def stripped_generics_py(
    components: list[str],
    brand_map: dict[str, str],
    multiword_generics: frozenset[str] | None = None,
) -> list[str]:
    """Per-component: brand→generic swap (tagger.py:624-630), pure-salt
    + multiword-generic guard + salt strip (tagger.py:303-307 — known
    multiword generics like ISOSORBIDE DINITRATE pass through
    unstripped), defensive junk filter (tagger.py:712-719). Returns
    UPPERCASE stripped generics in input order (order matters:
    [0]=active, [1]=vehicle for IV solutions)."""
    if multiword_generics is None:
        multiword_generics = _default_multiword()
    out: list[str] = []
    for comp in components or []:
        if not comp:
            continue
        base = _strip_component(comp, brand_map, multiword_generics)
        if base and len(base) > 1 and base not in _SG_JUNK:
            out.append(base)
    return out


_DEFAULT_MULTIWORD: frozenset[str] | None = None


def _default_multiword() -> frozenset[str]:
    global _DEFAULT_MULTIWORD
    if _DEFAULT_MULTIWORD is None:
        _DEFAULT_MULTIWORD = build_multiword_generics_py()
    return _DEFAULT_MULTIWORD


def fuzzy_corrections_ref_py(
    stripped: list[str],
    ordered_keys: list[str],
    key_hits: dict[str, list[tuple[str, bool]]],
) -> dict[str, str]:
    """The reference's fuzzy_corrections construction (tagger.py:
    886-896), shape-for-shape: iterate the candidate hits in the
    COLLECTION order (combination keys first — tagger.py:728-763 —
    then each stripped token), dedupe by matched generic name keeping
    the first occurrence (the unique_matches dedupe, tagger.py:
    774-780; an earlier NON-fuzzy hit of the same name suppresses a
    later fuzzy one), and assign each surviving FUZZY-matched name to
    the FIRST stripped generic that has no correction yet. The
    assignment is BLIND-POSITIONAL — the reference does not know which
    component a fuzzy hit corrected, so a fuzzy hit for the SECOND
    component lands on the first slot (r9 probe: that is exactly how
    'ALBUPRIL + ALBOLOL' admits the combo generic — the fuzzy-matched
    combination NAME takes slot 0 and enters the input set whole).

    ``key_hits`` maps lowercase probe key → [(matched_name,
    is_fuzzy)]; ``ordered_keys`` is the collection order (combo keys,
    then stripped tokens). Within one key the hit order is immaterial:
    the engine's cascade keeps a single tier per key, so a key's hits
    are either all fuzzy (top-1) or all non-fuzzy."""
    corrections: dict[str, str] = {}
    seen: set[str] = set()
    for k in ordered_keys:
        for name, is_fuzzy in key_hits.get(k.lower(), ()):
            nu = name.upper()
            if nu in seen:
                continue
            seen.add(nu)
            if not is_fuzzy:
                continue
            for sg in stripped:
                if sg.upper() not in corrections:
                    corrections[sg.upper()] = nu
                    break
    return corrections


def normalized_input_set_py(
    stripped: list[str],
    corrections: dict[str, str] | None,
    syn_map: dict[str, str],
) -> tuple[list[str], int, str | None, str | None]:
    """The second half of the per-doc input construction
    (tagger.py:884-913), taking ALREADY-stripped generics — the Spark
    plan computes ``stripped_generics_py`` once per distinct text in
    the doc-enrich Arrow crossing and feeds this after the fuzzy tier
    resolves. ``corrections`` is the UPPER-keyed positional map built
    by ``fuzzy_corrections_ref_py`` (r9: previously a key-accurate
    lowercase map, which silently diverged from the reference's
    blind-positional assignment on multi-component texts). Returns
    (sorted normalized set, num_input, active, vehicle)."""
    from .tokens import apply_synonym_py

    norm: set[str] = set()
    for sg in stripped:
        corrected = (corrections or {}).get(sg.upper())
        n = corrected if corrected else apply_synonym_py(sg, syn_map)
        if n and n not in _NORM_JUNK:
            norm.add(n)
    # combo-key synonyms (tagger.py:909-913): reference-shaped
    # UPPERCASE keys, so only genuine synonym rewrites (e.g. ETHYL
    # ALCOHOL → ETHANOL) join the set — a key whose synonym
    # application is the identity stays out.
    for ck in build_combination_keys_ref_py(stripped):
        s = apply_synonym_py(ck, syn_map)
        if s != ck and s not in _NORM_JUNK:
            norm.add(s)
    active = stripped[0] if len(stripped) > 1 else None
    vehicle = stripped[1] if len(stripped) > 1 else None
    return sorted(norm), len(norm), active, vehicle


def input_generics_normalized_py(
    components: list[str],
    fuzzy_map: dict[str, str] | None,
    syn_map: dict[str, str],
    brand_map: dict[str, str],
    multiword_generics: frozenset[str] | None = None,
) -> tuple[list[str], int, str | None, str | None, str | None]:
    """The per-doc inputs to candidate selection (tagger.py:884-920):

    returns (sorted normalized input set, num_input, active, vehicle,
    mixture_component_key). ``fuzzy_map`` maps the probe key
    (lowercase) to the fuzzy-matched dim name; corrections are applied
    through the reference's BLIND-POSITIONAL assignment
    (``fuzzy_corrections_ref_py``) — a corrected name enters the set
    verbatim (NOT synonym-normalized, reference tagger.py:900-905)."""
    sgs = stripped_generics_py(components, brand_map, multiword_generics)
    key_hits = {
        k.lower(): [(v, True)] for k, v in (fuzzy_map or {}).items()
    }
    corrections = fuzzy_corrections_ref_py(
        sgs, [s.lower() for s in sgs], key_hits
    )
    norm, n, active, vehicle = normalized_input_set_py(sgs, corrections, syn_map)
    return norm, n, active, vehicle, mixture_component_key_py(sgs, syn_map)


def mixture_component_key_py(
    stripped_generics: list[str],
    syn_map: dict[str, str],
) -> str | None:
    """_lookup_mixture's component key (tagger.py:309-340): junk-filter,
    synonym-normalize to lowercase, drop substrings (longest first),
    sorted '|'-join; None unless ≥2 survivors."""
    from .tokens import apply_synonym_py

    gens = [
        g for g in stripped_generics
        if g.upper() not in _MIX_JUNK and not g.startswith("+")
    ]
    if len(gens) < 2:
        return None
    normalized = [apply_synonym_py(g.upper(), syn_map).lower() for g in gens]
    unique: list[str] = []
    for n in sorted(normalized, key=len, reverse=True):
        if not any(n in existing for existing in unique):
            unique.append(n)
    if len(unique) < 2:
        return None
    return "|".join(sorted(unique))


def iv_vehicle_skip_py(
    candidate_generic: str,
    active: str | None,
    vehicle: str | None,
    syn_map: dict[str, str],
) -> bool:
    """IV-solution vehicle skip (scoring.py:249-266): drop a candidate
    that matches the vehicle (second component) but not the active
    ingredient (first component)."""
    from .tokens import apply_synonym_py

    if not active or not vehicle:
        return False
    cand = candidate_generic.upper()
    active_n = apply_synonym_py(active.upper(), syn_map)
    vehicle_n = apply_synonym_py(vehicle.upper(), syn_map)
    cand_n = apply_synonym_py(cand, syn_map)
    is_vehicle = vehicle_n in cand or cand in vehicle_n or vehicle_n == cand_n
    is_active = active_n in cand or cand in active_n or active_n == cand_n
    return is_vehicle and not is_active
