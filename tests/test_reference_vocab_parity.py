"""Vocabulary-table parity guard: every data table ported from the
reference is diffed DIRECTLY against the live reference's tables —
including iteration ORDER where a consumer scans first-match (the
round-7 FORM_TO_ROUTES_P4 lesson: the table was value-identical but
alphabetized, and the partial-key fallback takes the first substring
hit, so order was silently load-bearing). Runs in seconds, no Spark;
skipped when /root/reference is absent (the engine is standalone —
this guard exists for environments that carry the reference)."""

from __future__ import annotations

import os
import sys

import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not present"
)


@pytest.fixture(scope="module")
def uc():
    sys.path.insert(0, REF)
    from pipelines.drugs.scripts import unified_constants as uc_mod

    return uc_mod


@pytest.fixture(scope="module")
def tu():
    sys.path.insert(0, REF)
    from pipelines.drugs.scripts import text_utils as tu_mod

    return tu_mod


def _lset(x):
    return {str(v).lower() for v in x}


def test_salt_vocab_sets(uc):
    from pids_drg_esoa_spark.functions import constants as c

    assert _lset(c.SALT_TOKENS) == _lset(uc.SALT_TOKENS)
    assert _lset(c.PURE_SALT_COMPOUNDS) == _lset(uc.PURE_SALT_COMPOUNDS)
    assert _lset(c.SALT_CATIONS) == _lset(uc.SALT_CATIONS)


def test_f6_derived_sets(tu):
    from pids_drg_esoa_spark.functions import tokens as t

    assert t._F6_MEASUREMENT == frozenset(tu.MEASUREMENT_TOKENS)
    assert t._F6_IGNORE == frozenset(tu.BASE_GENERIC_IGNORE)
    assert t._F6_SPECIAL == frozenset(tu.SPECIAL_SALT_TOKENS)
    assert t._F6_SALT_WORDS == frozenset(tu.SALT_TOKEN_WORDS)
    assert t._F6_TAIL_BREAK == {s.lower() for s in tu.SALT_TAIL_BREAK_TOKENS}


def test_part4_form_route_tables_values_and_order(uc):
    """ORDER is part of the contract: part4_forms_compatible_py's
    partial-key fallback takes the FIRST substring-matching key."""
    from pids_drg_esoa_spark.functions.part4_tables import (
        FORM_EQUIVALENTS_P4,
        FORM_TO_ROUTES_P4,
    )

    assert list(FORM_TO_ROUTES_P4) == list(uc.FORM_TO_ROUTES)
    for k in uc.FORM_TO_ROUTES:
        assert tuple(FORM_TO_ROUTES_P4[k]) == tuple(uc.FORM_TO_ROUTES[k]), k
    assert {k: set(v) for k, v in FORM_EQUIVALENTS_P4.items()} == {
        k: set(v) for k, v in uc.FORM_EQUIVALENTS.items()
    }


def test_vaccine_tables_values_and_order(uc):
    """Canonical-pattern scan is first-match over dict order."""
    from pids_drg_esoa_spark.functions import vaccines as V

    assert list(V.VACCINE_CANONICAL) == list(uc.VACCINE_CANONICAL)
    for k in uc.VACCINE_CANONICAL:
        assert tuple(V.VACCINE_CANONICAL[k]) == tuple(uc.VACCINE_CANONICAL[k]["patterns"]), k
    assert list(V.VACCINE_ACRONYM_TO_COMPONENTS) == list(uc.VACCINE_ACRONYM_TO_COMPONENTS)
    for k in uc.VACCINE_ACRONYM_TO_COMPONENTS:
        assert tuple(V.VACCINE_ACRONYM_TO_COMPONENTS[k]) == tuple(
            uc.VACCINE_ACRONYM_TO_COMPONENTS[k]
        ), k
    assert list(V.VACCINE_COMPONENT_KEYWORDS) == list(uc.VACCINE_COMPONENT_KEYWORDS)
    assert dict(V.VACCINE_COMPONENT_KEYWORDS) == dict(uc.VACCINE_COMPONENT_KEYWORDS)


def test_canonical_seed_tables(uc):
    from pids_drg_esoa_spark.functions.vocab_full import (
        CANONICAL_ATC_MAPPINGS_FULL,
        CANONICAL_GENERICS_FULL,
        STOPWORDS_FULL,
    )

    ref_g = {
        (r.get("drugbank_id"), str(r["generic_name"]).upper())
        for r in uc.CANONICAL_GENERICS
    }
    eng_g = {(i, str(n).upper()) for i, n in CANONICAL_GENERICS_FULL}
    assert eng_g == ref_g
    ref_a = {
        (r.get("drugbank_id"), str(r["generic_name"]).upper(), r["atc_code"])
        for r in uc.CANONICAL_ATC_MAPPINGS
    }
    eng_a = {(i, str(n).upper(), c) for i, n, c in CANONICAL_ATC_MAPPINGS_FULL}
    assert eng_a == ref_a
    assert {s.lower() for s in STOPWORDS_FULL} == {s.lower() for s in uc.STOPWORDS}


def test_route_label_expansion_table():
    """ROUTE_LABEL_EXPANSION must equal map_route_token's table
    key-for-key (keys lowercased; the reference has NO entries beyond
    these 19 — invented keys like 'im:' would accept labels the
    reference maps to [])."""
    sys.path.insert(0, REF)
    from pipelines.drugs.scripts.routes_forms import map_route_token

    from pids_drg_esoa_spark.functions.constants import ROUTE_LABEL_EXPANSION

    ref_labels = [
        "Oral:", "Oral/Tube feed:", "Inj.:", "IV:", "IV/SC:", "SC:",
        "Subdermal:", "Inhalation:", "Topical:", "Patch:", "Ophthalmic:",
        "Intraocular:", "Otic:", "Nasal:", "Rectal:", "Vaginal:",
        "Sublingual:", "Oral antiseptic:", "Oral/Inj.:",
    ]
    assert set(ROUTE_LABEL_EXPANSION) == {lb.lower() for lb in ref_labels}
    for lb in ref_labels:
        assert tuple(ROUTE_LABEL_EXPANSION[lb.lower()]) == tuple(map_route_token(lb)), lb
    # unknown labels: the reference returns [] — nothing maps them
    assert map_route_token("Buccal:") == [] and "buccal:" not in ROUTE_LABEL_EXPANSION


def test_forms_are_equivalent_exhaustive(uc):
    """forms_are_equivalent_py == the reference scoring module's
    version (its local def, the one scoring actually calls) over the
    FULL cross product of known forms plus missing/alias shapes."""
    sys.path.insert(0, REF)
    from pipelines.drugs.scripts.scoring import forms_are_equivalent as ref_fn

    from pids_drg_esoa_spark.functions.routes_forms import forms_are_equivalent_py

    forms = list(uc.FORM_TO_ROUTES) + ["", "TAB", "ZZFORM", "CAPLET"]
    for a in forms:
        for b in forms:
            assert forms_are_equivalent_py(a, b) == bool(ref_fn(a, b)), (a, b)


def test_atc_combination_patterns_verbatim(uc):
    """F28: the engine's pattern tuple must equal the reference's
    ATC_COMBINATION_PATTERNS (order irrelevant — the consumer is
    any-startswith — but pinned as a sequence anyway), and the Python
    twin must equal scoring.py's LOCAL is_combination_atc, which is
    the only combo-ATC check the live pipeline calls (the
    unified_constants variant with the extra suffix rule is imported
    by scoring.py under an alias and never invoked)."""
    from pipelines.drugs.scripts import scoring as ref_scoring

    from pids_drg_esoa_spark.functions.constants import (
        ATC_COMBINATION_PATTERNS,
        is_combination_atc_py,
    )

    assert list(ATC_COMBINATION_PATTERNS) == list(uc.ATC_COMBINATION_PATTERNS)
    probes = (
        list(uc.ATC_COMBINATION_PATTERNS)
        + ["J01CR02", "C07FB02", "A10BD07", "N02BE51", "M03BX55", "A02BC20",
           "B05XA30", "A01AA01", "N05BA", "j01cr02", "", "None"]
    )
    for code in probes:
        assert is_combination_atc_py(code) == ref_scoring.is_combination_atc(code), code


def test_p1_form_words_set_and_ordering():
    """Part-1 form vocabulary: same SET as the reference's FORM_WORDS
    (= FORM_TO_ROUTE keys) and the same longest-first scan property.
    The reference's tie order among equal-length words is set-iteration
    order — PYTHONHASHSEED-randomized, measured flipping across runs —
    so the exact sequence is unpinnable; the engine's deterministic
    tie-break is alphabetical."""
    sys.path.insert(0, REF)
    from pipelines.drugs.scripts import routes_forms as rf

    from pids_drg_esoa_spark.functions.constants import P1_FORM_WORDS
    from pids_drg_esoa_spark.functions.routes_forms import (
        parse_form_from_text_py,
    )

    assert set(P1_FORM_WORDS) == set(rf.FORM_WORDS)
    lens = [len(w) for w in P1_FORM_WORDS]
    assert lens == sorted(lens, reverse=True)
    # unique-longest cases must agree with the live reference exactly
    for text in ("paracetamol 500 mg tablet", "oral solution 100 mg/5 ml",
                 "dry powder inhaler 200 dose", "no form here", ""):
        ours = parse_form_from_text_py(text)
        theirs = rf.parse_form_from_text(text)
        # equal-length tie texts excluded by construction here
        assert ours == theirs, (text, ours, theirs)
