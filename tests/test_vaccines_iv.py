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


def test_acronym_expansion():
    assert normalize_vaccine_name_py("MMR VACCINE") == "MEASLES + MUMPS + RUBELLA VACCINE"
    assert (
        normalize_vaccine_name_py("DTAP BOOSTER VACCINE")
        == "DIPHTHERIA + TETANUS + ACELLULAR PERTUSSIS VACCINE"
    )
    penta = normalize_vaccine_name_py("PENTA VACCINE")
    assert penta is not None and "HEPATITIS B" in penta and penta.count("+") == 4


def test_component_pattern_to_canon():
    got = normalize_vaccine_name_py("measles mumps rubella vaccine live")
    assert got == "MEASLES + MUMPS + RUBELLA VACCINE"


def test_bidirectional_keys():
    keys = vaccine_component_keys_py("MMR VACCINE")
    assert "measles + mumps + rubella vaccine" in keys
    assert "measles" in keys and "rubella" in keys
    assert "mmr" in keys  # reverse: components → acronym


def test_non_vaccine_is_none():
    assert normalize_vaccine_name_py("AMOXICILLIN 500MG CAP") is None


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
