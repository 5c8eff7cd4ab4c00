"""Part-4 bridge tests: typed dose keys, compatibility predicates,
reason priority — on FIXTURES.md §3-shaped Annex rows."""

from __future__ import annotations

import pytest

from pids_drg_esoa_spark.functions.dosekey import (
    DoseKey,
    dose_key_py,
    dose_keys_match_py,
    parse_annex_pipe_dose_py,
)
from pids_drg_esoa_spark.functions.routes_forms import (
    forms_are_equivalent_py,
    parse_form_py,
    parse_route_py,
)
from pids_drg_esoa_spark.plans.bridge import bridge_metrics, bridge_to_drug_codes


# ---------------------------------------------------------------------------
# F34 dose keys
# ---------------------------------------------------------------------------
def test_dose_key_kinds():
    assert dose_key_py("PARACETAMOL 500MG TAB") == DoseKey("mg", (500.0,))
    assert dose_key_py("AMIODARONE 150MG/3ML") == DoseKey("conc", (50.0,))
    assert dose_key_py("HEPARIN 5000 IU") == DoseKey("iu", (5000.0,))
    assert dose_key_py("MUPIROCIN 2% OINTMENT") == DoseKey("pct", (2.0,))
    assert dose_key_py("CO-AMOXICLAV 400|MG|57") == DoseKey("combo", (400.0, 57.0))
    assert dose_key_py("AMOX 250 mg + CLAV 125 mg") == DoseKey("combo", (250.0, 125.0))
    assert dose_key_py("no dose").kind == "none"


def test_pipe_format():
    assert parse_annex_pipe_dose_py("PARACETAMOL 500|MG|TABLET").values == (500.0,)
    assert parse_annex_pipe_dose_py("X 1|G|").values in ((1000.0,),)


def test_dose_match_rules():
    mg = dose_key_py("500 mg tab")
    assert dose_keys_match_py(mg, dose_key_py("0.5 g tab"))  # unit conversion
    assert not dose_keys_match_py(mg, dose_key_py("250 mg tab"))
    combo = dose_key_py("250 mg + 250 mg")
    assert dose_keys_match_py(mg, combo)  # mg↔combo by total, 1% tol
    conc = dose_key_py("100 mg/ml")
    assert dose_keys_match_py(dose_key_py("500mg/5ml"), conc)
    assert not dose_keys_match_py(DoseKey("none"), mg)


# ---------------------------------------------------------------------------
# F25/F27 forms & routes
# ---------------------------------------------------------------------------
def test_form_route_parsing():
    assert parse_form_py("PARACETAMOL 500MG TABLET") == "tablet"
    assert parse_form_py("AMOXICILLIN SUSP 250MG/5ML") == "suspension"
    assert parse_route_py("DILTIAZEM IV INFUSION")[0] == "intravenous"
    route, evidence = parse_route_py("PARACETAMOL 500MG TABLET")
    assert route == "oral" and evidence.startswith("imputed_from_form")


def test_form_equivalence():
    assert forms_are_equivalent_py("tab", "capsule")  # equivalence group
    assert forms_are_equivalent_py("syrup", "suspension")
    assert not forms_are_equivalent_py("tablet", "injection")  # no shared route
    assert forms_are_equivalent_py("solution", "injection")  # shared iv route


# ---------------------------------------------------------------------------
# end-to-end bridge
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def bridged(spark):
    tagged = spark.createDataFrame(
        [
            ("PARACETAMOL 500MG TAB", "PARACETAMOL", True),
            ("PARACETAMOL 250MG TABLET", "PARACETAMOL", True),
            ("PARACETAMOL TABLET", "PARACETAMOL", True),
            ("IBUPROFEN 200MG TAB", "IBUPROFEN", True),
            ("SCRIBBLE 10MG", None, False),
            ("AMOXICILLIN + CLAVULANIC ACID 400MG + 57MG TAB",
             "AMOXICILLIN + CLAVULANIC ACID", True),
        ],
        "raw_text string, generic_name string, matched boolean",
    )
    annex = spark.createDataFrame(
        [
            ("D001", "PARACETAMOL 500|MG|TABLET"),
            ("D002", "PARACETAMOL 500|MG|SUSPENSION"),
            ("D003", "CO-AMOXICLAV (AMOXICILLIN + CLAVULANIC ACID) 400|MG|57 TABLET"),
        ],
        "drug_code string, drug_description string",
    )
    out = bridge_to_drug_codes(tagged, annex)
    return {r.raw_text: r for r in out.collect()}, out


def test_bridge_reasons(bridged):
    rows, _ = bridged
    assert rows["PARACETAMOL 500MG TAB"].match_reason == "matched"
    assert rows["PARACETAMOL 500MG TAB"].drug_code == "D001"
    assert rows["PARACETAMOL 250MG TABLET"].match_reason == "dose_mismatch"
    assert rows["PARACETAMOL TABLET"].match_reason == "no_dose_in_esoa"
    assert rows["IBUPROFEN 200MG TAB"].match_reason == "generic_not_in_annex"
    assert rows["SCRIBBLE 10MG"].match_reason == "no_generic"


def test_bridge_combo(bridged):
    rows, _ = bridged
    combo = rows["AMOXICILLIN + CLAVULANIC ACID 400MG + 57MG TAB"]
    assert combo.match_reason == "matched"
    assert combo.drug_code == "D003"


def test_bridge_metrics(bridged):
    _, out = bridged
    hist = {r.match_reason: r.n for r in bridge_metrics(out).collect()}
    assert hist["matched"] == 2
    assert hist["dose_mismatch"] == 1
