"""F15/F13/F14 golden tests — expectations captured from the reference
extractor (tokenizer.py:330-744) via a side-by-side run; the fuzz
harness confirmed 0 diffs over 25k composed/random cases."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pids_drg_esoa_spark.functions.details import (
    calculate_iv_amounts_py,
    extract_drug_details,
    extract_drug_details_py,
    extract_release_detail_py,
    extract_type_detail_py,
    parse_dose_components_py,
)


def _d(text, **expected):
    got = extract_drug_details_py(text)
    for k, v in expected.items():
        assert got[k] == v, f"{text!r}: {k}={got[k]!r}, want {v!r}"


def test_indication_extraction():
    _d(
        "AMINO ACID SOLUTIONS FOR HEPATIC FAILURE",
        generic_name="AMINO ACID",
        indication_details="FOR HEPATIC FAILURE",
    )


def test_salt_and_alias_parentheticals():
    _d(
        "ALENDRONATE + CHOLECALCIFEROL (VIT. D3) ( as SODIUM SALT)",
        generic_name="ALENDRONATE + CHOLECALCIFEROL",
        salt_details="SODIUM SALT",
        alias_details="VIT. D3",
    )


def test_release_modifier():
    _d("NIFEDIPINE 30 mg MR TABLET", generic_name="NIFEDIPINE", release_details="MR")
    _d("METFORMIN 500 MG SR TABLET", release_details="SR")


def test_iv_diluent_and_wv_math():
    # 5% of 250 mL = 12.5 g = 12500 mg; 0.9% diluent = 2250 mg
    _d(
        "5% DEXTROSE IN 0.9% SODIUM CHLORIDE 250 mL",
        iv_diluent_type="SODIUM CHLORIDE",
        iv_diluent_amount="0.9%",
        drug_amount_mg=12500.0,
        diluent_amount_mg=2250.0,
        concentration_mg_per_ml=50.0,
        total_volume_ml=250.0,
    )
    _d(
        "5% DEXTROSE IN LACTATED RINGER'S SOLUTION 1 L",
        iv_diluent_type="LACTATED RINGER'S SOLUTION",
        drug_amount_mg=50000.0,
        total_volume_ml=1000.0,
    )


def test_leading_percent_moves_to_dose():
    _d(
        "0.9% SODIUM CHLORIDE 1 L SOLUTION",
        generic_name="SODIUM CHLORIDE",
        drug_amount_mg=9000.0,
        concentration_mg_per_ml=9.0,
    )


def test_diluent_volume_patterns():
    _d(
        "CEFTRIAXONE 1 g POWDER + 10 mL diluent SOLUTION VIAL",
        generic_name="CEFTRIAXONE",
        diluent_details="10 mL",
    )
    _d("METHYLPREDNISOLONE 1 g/16 mL + Diluent", diluent_details="16 mL")
    _d(
        "RABIES VACCINE 2.5 IU freeze-dried powder monodose vial + 0.5 mL diluent",
        generic_name="RABIES VACCINE",
        diluent_details="0.5 mL",
    )


def test_trailing_salt_suffix():
    _d(
        "DEXAMETHASONE SODIUM PHOSPHATE 4 MG/ML",
        generic_name="DEXAMETHASONE",
        salt_details="SODIUM PHOSPHATE",
    )


def test_comma_alias():
    _d("VITAMIN A, RETINOL", generic_name="VITAMIN A", alias_details="RETINOL")
    # comma tail that is a release modifier is BOTH alias (the comma
    # path only filters digit-leading tails) and the release detail
    _d(
        "PARACETAMOL, EXTENDED RELEASE 650 MG TABLET",
        alias_details="EXTENDED RELEASE 650 MG TABLET",
        release_details="EXTENDED RELEASE 650 MG TABLET",
    )


def test_type_detail():
    assert extract_type_detail_py("INSULIN, HUMAN") == ("INSULIN", "HUMAN")
    assert extract_type_detail_py("PARACETAMOL, EXTENDED RELEASE")[1] is None
    assert extract_release_detail_py("TABLET, SR") == ("TABLET", "SR")


def test_vaccine_potency_stripping():
    _d(
        "MEASLES VACCINE not less than 1000 PFU monodose vial + diluent",
        generic_name="MEASLES VACCINE",
        diluent_details="with diluent",
    )


def test_dose_components_struct():
    got = parse_dose_components_py("AMOXICILLIN 250 mg/5 mL SUSPENSION 60 mL")
    assert got["doses"][0]["concentration_mg_per_ml"] == 50.0
    assert got["doses"][0]["unit_type"] == "concentration"
    assert got["total_volume_ml"] == 60.0
    # mg/5mL shorthand: the 5 lives inside the per-unit token
    got = parse_dose_components_py("10 mg/5ml SYRUP")
    assert got["doses"][0]["concentration_mg_per_ml"] == 2.0
    # comma decimals
    got = parse_dose_components_py("PARACETAMOL 62,5 MG")
    assert got["doses"][0]["value"] == 62.5


def test_iv_amounts_math():
    got = calculate_iv_amounts_py([5.0], 0.9, 250.0)
    assert got["drug_amount_g"] == 12.5
    assert got["diluent_amount_g"] == 2.25
    assert got["diluent_volume_ml"] == 250.0
    assert calculate_iv_amounts_py([], None, 100.0)["drug_amount_mg"] is None


def test_empty_inputs():
    assert extract_drug_details_py(None)["generic_name"] == ""
    assert extract_drug_details_py("  ")["generic_name"] == ""


def test_details_udf_in_spark(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "t": [
                    "5% DEXTROSE IN 0.9% SODIUM CHLORIDE 250 mL",
                    "NIFEDIPINE 30 mg MR TABLET",
                    None,
                ]
            }
        )
    ).withColumn("d", extract_drug_details(F.col("t")))
    rows = df.select("d.generic_name", "d.release_details", "d.drug_amount_mg").collect()
    assert rows[0]["drug_amount_mg"] == 12500.0
    assert rows[1]["release_details"] == "MR"
    assert rows[2]["generic_name"] == ""
