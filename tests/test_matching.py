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
