"""Golden tests: vaccine canon (F31), diluent classes (F35), input
classification — cases shaped on FIXTURES.md §2 samples."""

from __future__ import annotations

import pytest

from pids_drg_esoa_spark.functions.vaccines import (
    classify_input_py,
    is_vaccine_text_py,
    normalize_diluent_py,
    normalize_vaccine_name_py,
    vaccine_component_keys_py,
)


def test_vaccine_detection():
    assert is_vaccine_text_py("MMR VACCINE 0.5ML")
    assert is_vaccine_text_py("anti-rabies vaccine")
    assert is_vaccine_text_py("PENTA 1 DOSE")
    assert not is_vaccine_text_py("PARACETAMOL 500MG TAB")


def test_canonical_registry():
    """Reference normalize_vaccine_name (unified_constants.py:1385-1446):
    canonical names come from the VACCINE_CANONICAL registry; texts
    with VACCINE but no pattern hit fall back to ('VACCINE', rest)."""
    assert normalize_vaccine_name_py("MMR VACCINE") == ("MMR VACCINE", None)
    name, details = normalize_vaccine_name_py("HEPATITIS B VACCINE RECOMBINANT 10MCG")
    assert name == "HEPATITIS B VACCINE" and details == "Recombinant"
    name, details = normalize_vaccine_name_py("SOMEODD VACCINE")
    assert name == "VACCINE" and "SOMEODD" in details


def test_match_vaccine_text_bidirectional():
    """match_vaccine_text (:1678-1707): word-bounded acronym scan,
    else substring component extraction + reverse acronym lookup —
    including the FLU-inside-FLUCONAZOLE substring behavior the live
    reference has (diff-adjudicated)."""
    from pids_drg_esoa_spark.functions.vaccines import match_vaccine_text_py

    assert match_vaccine_text_py("DTP BOOSTER 0.5ML") == (
        "DTP", ["DIPHTHERIA", "TETANUS", "PERTUSSIS"]
    )
    acr, comps = match_vaccine_text_py("measles mumps rubella vaccine live")
    assert acr == "MMR" and comps == ["MEASLES", "MUMPS", "RUBELLA"]
    # substring component scan: FLU inside FLUCONAZOLE flags INFLUENZA
    assert match_vaccine_text_py("FLUCONAZOLE 200MG TAB") == ("FLU", ["INFLUENZA"])
    assert match_vaccine_text_py("PARACETAMOL 500MG TAB") == (None, None)


def test_bidirectional_keys():
    keys = vaccine_component_keys_py("MMR VACCINE")
    assert "MMR" in keys and "MMR VACCINE" in keys
    assert "MEASLES" in keys and "RUBELLA" in keys
    assert "MEASLES + MUMPS + RUBELLA" in keys
    assert "MEASLES + MUMPS + RUBELLA VACCINE" in keys


def test_non_vaccine_is_none():
    assert normalize_vaccine_name_py("AMOXICILLIN 500MG CAP") == (None, None)


@pytest.mark.parametrize(
    "text,expected",
    [
        ("sterile water for injection", "WATER"),
        ("0.9% SODIUM CHLORIDE 1L", "NORMAL_SALINE"),
        ("PNSS 1L BOTTLE", "NORMAL_SALINE"),
        ("0.45% sodium chloride", "HALF_SALINE"),
        ("LACTATED RINGERS 1L", "LACTATED_RINGERS"),
        ("D5W 500ML", "D5_WATER"),
        ("0.3% sodium chloride", "SALINE_OTHER"),
        ("PARACETAMOL TAB", None),
    ],
)
def test_diluent_classes(text, expected):
    assert normalize_diluent_py(text) == expected


def test_classify_input():
    assert classify_input_py("5% DEXTROSE IN 0.9% SODIUM CHLORIDE 1 L BOTTLE", 2) == "iv_solution"
    assert classify_input_py("PNSS 1L", 1) == "iv_solution"
    assert classify_input_py("AMOXICILLIN + CLAVULANIC ACID TAB", 2) == "combination"
    assert classify_input_py("PARACETAMOL 500MG TAB", 1) == "single"
