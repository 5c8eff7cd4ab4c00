"""F32/F33 golden tests — (matches, reason) tuples pinned from a
side-by-side run against the reference scoring implementation."""

from __future__ import annotations

from pids_drg_esoa_spark.functions.matching import (
    MATCH_PRIORITY,
    generics_match_py,
    parse_generic_with_subtype_py,
)


def test_parse_subtype():
    assert parse_generic_with_subtype_py("VITAMIN INTRAVENOUS, FAT-SOLUBLE") == (
        "VITAMIN INTRAVENOUS", "FAT-SOLUBLE",
    )
    assert parse_generic_with_subtype_py("AMINO ACIDS, CRYSTALLINE STANDARD") == (
        "AMINO ACIDS", "CRYSTALLINE STANDARD",
    )
    assert parse_generic_with_subtype_py("PARACETAMOL") == ("PARACETAMOL", None)
    # combinations never split on comma
    assert parse_generic_with_subtype_py("A, B + C") == ("A, B + C", None)


def test_single_drug_reasons():
    assert generics_match_py({"PARACETAMOL"}, "PARACETAMOL") == (True, "exact")
    assert generics_match_py({"PARACETAMOL"}, "PARACETAMOL HYDROCHLORIDE") == (
        True, "substring",
    )
    assert generics_match_py({"IBUPROFEN"}, "PARACETAMOL") == (False, "no_match")
    assert generics_match_py(set(), "PARACETAMOL") == (False, "missing_generic")
    assert generics_match_py({"X"}, "") == (False, "missing_generic")


def test_subtype_reasons():
    assert generics_match_py(
        {"AMINO ACIDS, CRYSTALLINE"}, "AMINO ACIDS, CRYSTALLINE STANDARD"
    ) == (True, "exact_with_subtype")
    # input demands a subtype the candidate lacks → no match
    assert generics_match_py({"AMINO ACIDS, CRYSTALLINE"}, "AMINO ACIDS") == (
        False, "no_match",
    )
    # candidate has subtype, input doesn't → base substring match
    assert generics_match_py({"AMINO ACIDS"}, "AMINO ACIDS, CRYSTALLINE") == (
        True, "substring",
    )


def test_combo_reasons():
    assert generics_match_py(
        {"AMOXICILLIN"}, "AMOXICILLIN + CLAVULANIC ACID"
    ) == (True, "combo_match")
    assert generics_match_py(
        {"AMOXICILLIN TRIHYDRATE"}, "AMOXICILLIN + CLAVULANIC ACID"
    ) == (True, "combo_partial")
    assert generics_match_py({"IBUPROFEN"}, "AMOXICILLIN + CLAVULANIC ACID") == (
        False, "combo_no_match",
    )
    assert generics_match_py({"TETANUS"}, "DIPHTHERIA AND TETANUS") == (
        True, "combo_match",
    )


def test_synonym_normalization_hook():
    syn = {"ACETAMINOPHEN": "PARACETAMOL"}
    fn = lambda g: syn.get(g.upper(), g.upper())  # noqa: E731
    assert generics_match_py({"ACETAMINOPHEN"}, "PARACETAMOL", fn) == (True, "exact")


def test_priority_map():
    assert MATCH_PRIORITY["exact"] == 0 == MATCH_PRIORITY["exact_with_subtype"]
    assert MATCH_PRIORITY["combo_match"] == 1
    assert MATCH_PRIORITY["substring"] == 2
    assert MATCH_PRIORITY["combo_partial"] == 3


# ---------------------------------------------------------------------------
# F33 selection-side helpers — differential tests against
# reference-shaped fixtures (tagger.py:273-340,624-722,884-920,
# scoring.py:249-266, lookup.py:309-405).
# ---------------------------------------------------------------------------

from pids_drg_esoa_spark.functions.matching import (  # noqa: E402
    build_combination_keys_ref_py,
    build_multiword_generics_py,
    input_generics_normalized_py,
    iv_vehicle_skip_py,
    mixture_component_key_py,
    stripped_generics_py,
)


def test_multiword_generics_set():
    mw = build_multiword_generics_py(["Isosorbide Dinitrate", "AMLODIPINE"])
    assert "ISOSORBIDE DINITRATE" in mw
    assert "AMLODIPINE" not in mw  # single word never enters
    # plural-first-word variant added (tagger.py:283-290)
    mw2 = build_multiword_generics_py(["AMINO ACID SOLUTION"])
    assert "AMINO ACIDS ACID SOLUTION" not in mw2  # plural of FIRST word only
    assert "AMINO ACID SOLUTION" in mw2
    assert "AMINOS ACID SOLUTION" in mw2


def test_stripped_generics_multiword_salt_guard():
    # DINITRATE is a salt token, but ISOSORBIDE DINITRATE is a known
    # multiword generic — _strip_salt returns it unchanged
    # (tagger.py:303-307); without the guard it would strip to ISOSORBIDE.
    assert stripped_generics_py(["isosorbide dinitrate"], {}) == ["ISOSORBIDE DINITRATE"]
    # non-multiword salt suffix still strips
    assert stripped_generics_py(["amlodipine besilate"], {}) == ["AMLODIPINE"]
    # pure-salt compound protected (tagger.py:708-710)
    assert stripped_generics_py(["sodium chloride"], {}) == ["SODIUM CHLORIDE"]
    # brand swap precedes the strip (tagger.py:624-630)
    assert stripped_generics_py(["biogesic"], {"BIOGESIC": "PARACETAMOL"}) == ["PARACETAMOL"]
    # junk filter (tagger.py:712-719)
    assert stripped_generics_py(["fc", "mg", "x", "paracetamol"], {}) == ["PARACETAMOL"]
    # explicit multiword set overrides the default
    assert stripped_generics_py(
        ["custom dinitrate"], {}, frozenset({"CUSTOM DINITRATE"})
    ) == ["CUSTOM DINITRATE"]


def test_build_combination_keys_ref_shape():
    # lookup.py:309-405: salt + compound-suffix strip, uppercase keys
    keys = build_combination_keys_ref_py(["ALUMINUM HYDROXIDE", "MAGNESIUM HYDROXIDE"])
    assert "ALUMINUM + MAGNESIUM" in keys
    assert "ALUMINUM MAGNESIUM" in keys  # space-join variant
    assert "MAGNESIUM AND ALUMINUM" in keys  # WHO style reversed
    assert all(k == k.upper() for k in keys)
    # digit tokens (doses) and paren tokens (brands) are filtered
    assert build_combination_keys_ref_py(["PARACETAMOL 500", "(BIOGESIC)"]) == []
    # embedded '+' splits into parts
    keys2 = build_combination_keys_ref_py(["IBUPROFEN+PARACETAMOL"])
    assert "IBUPROFEN + PARACETAMOL" in keys2
    # <2 clean parts → []
    assert build_combination_keys_ref_py(["PARACETAMOL"]) == []
    # 3+ components get the Oxford WHO form
    keys3 = build_combination_keys_ref_py(["A", "B", "C"])
    assert "A, B AND C" in keys3


def test_input_set_combo_synonyms_only_on_rewrite():
    # Only genuine synonym rewrites join the set (tagger.py:909-913):
    # ETHYL + ALCOHOL → combo key 'ETHYL ALCOHOL' → synonym ETHANOL.
    syn = {"ETHYL ALCOHOL": "ETHANOL"}
    norm, n, active, vehicle, mix = input_generics_normalized_py(
        ["ethyl", "alcohol"], None, syn, {}
    )
    assert "ETHANOL" in norm
    # identity combo keys must NOT join the set
    norm2, n2, *_ = input_generics_normalized_py(["paracetamol", "ibuprofen"], None, {}, {})
    assert norm2 == ["IBUPROFEN", "PARACETAMOL"] and n2 == 2


def test_input_set_fuzzy_correction_post_swap():
    # fuzzy_map is keyed by the POST-swap stripped generic (lowercase);
    # the corrected name enters verbatim, NOT synonym-normalized
    # (tagger.py:900-905).
    syn = {"CETIRIZINE": "LEVOCETIRIZINE"}  # would fire if synonyms applied
    norm, n, *_ = input_generics_normalized_py(
        ["setirizine"], {"setirizine": "CETIRIZINE"}, syn, {}
    )
    assert norm == ["CETIRIZINE"] and n == 1
    # a brand component's correction keys by its swapped generic
    norm2, *_ = input_generics_normalized_py(
        ["biogesic"], {"paracetamol": "PARACETAMOL"}, {}, {"BIOGESIC": "PARACETAMOL"}
    )
    assert norm2 == ["PARACETAMOL"]


def test_mixture_component_key():
    # junk filter, synonym-normalize, substring-dedup longest-first,
    # sorted join (tagger.py:309-340)
    assert mixture_component_key_py(["ASCORBIC", "ASCORBIC ACID", "ZINC"], {}) == (
        "ascorbic acid|zinc"
    )
    assert mixture_component_key_py(["PARACETAMOL"], {}) is None  # <2 survivors
    assert mixture_component_key_py(["MG", "+", "PARACETAMOL"], {}) is None


def test_iv_vehicle_skip():
    # candidate matches vehicle but not active → skipped (scoring.py:249-266)
    assert iv_vehicle_skip_py("DEXTROSE", "PARACETAMOL", "DEXTROSE", {}) is True
    assert iv_vehicle_skip_py("PARACETAMOL", "PARACETAMOL", "DEXTROSE", {}) is False
    # candidate matching both (combination) is kept
    assert iv_vehicle_skip_py("PARACETAMOL + DEXTROSE", "PARACETAMOL", "DEXTROSE", {}) is False
    # no active/vehicle → never skips
    assert iv_vehicle_skip_py("DEXTROSE", None, None, {}) is False
