"""Tagger plan tests on reference-shaped unified dims (FIXTURES.md
§4-§8): exact / synonym / brand / fuzzy / mixture tiers, ATC
preference, best-candidate selection, reason labels."""

from __future__ import annotations

import pytest

from pids_drg_esoa_spark.plans.tagger import tag_descriptions


@pytest.fixture(scope="module")
def dims(spark):
    generics = spark.createDataFrame(
        [
            ("PARACETAMOL", "DB00316"),
            ("AMOXICILLIN", "DB01060"),
            ("CLAVULANIC ACID", "DB00766"),
            ("SALBUTAMOL", "DB01001"),
            ("SODIUM CHLORIDE", "DB09153"),
            ("AMLODIPINE", "DB00381"),
        ],
        "generic_name string, drugbank_id string",
    )
    atc = spark.createDataFrame(
        [
            ("PARACETAMOL", "N02BE01", False),
            ("PARACETAMOL", "N02BE51", True),  # combination ATC sorts last
            ("AMOXICILLIN", "J01CA04", False),
            ("SALBUTAMOL", "R03AC02", False),
            ("SODIUM CHLORIDE", "B05XA03", False),
            ("AMLODIPINE", "C08CA01", False),
            ("AMOXICILLIN + CLAVULANIC ACID", "J01CR02", True),
        ],
        "generic_name string, atc_code string, is_combination_atc boolean",
    )
    synonyms = spark.createDataFrame(
        [("ACETAMINOPHEN", "PARACETAMOL")],
        "synonym string, generic_name string",
    )
    brands = spark.createDataFrame(
        [("BIOGESIC", "PARACETAMOL")],
        "brand_name string, generic_name string",
    )
    mixtures = spark.createDataFrame(
        [("amoxicillin|clavulanic acid", "AMOXICILLIN + CLAVULANIC ACID", "DBMIX01")],
        "component_key string, mixture_name string, drugbank_id string",
    )
    return dict(
        generics_dim=generics, atc_dim=atc, synonyms_dim=synonyms,
        brands_dim=brands, mixtures_dim=mixtures,
    )


def _tag(spark, dims, texts):
    esoa = spark.createDataFrame([(t,) for t in texts], "raw_text string")
    rows = tag_descriptions(esoa, **dims).collect()
    return {r.raw_text: r for r in rows}


def test_tiers_and_selection(spark, dims):
    out = _tag(
        spark,
        dims,
        [
            "PARACETAMOL 500MG TAB (OP)",
            "BIOGESIC 500 MG TABLET",
            "ACETAMINOPHEN 500MG TABLET",
            "PARACETMOL 500MG TAB",  # typo → fuzzy (ratio ≥ 85)
            "AMOXICILLIN + CLAVULANIC ACID 625MG TAB",
            "AMLODIPINE ( as BESILATE) 5MG TAB",
            "COMPLETELY UNKNOWN COMPOUND 10MG",
        ],
    )
    exact = out["PARACETAMOL 500MG TAB (OP)"]
    assert (exact.generic_name, exact.match_reason) == ("PARACETAMOL", "exact")
    assert exact.drugbank_id == "DB00316"
    # W2: non-combination ATC preferred as primary, combo sorts last
    assert exact.atc_primary == "N02BE01"
    assert exact.atc_codes == "N02BE01|N02BE51"

    brand = out["BIOGESIC 500 MG TABLET"]
    assert (brand.generic_name, brand.match_reason) == ("PARACETAMOL", "brand")

    syn = out["ACETAMINOPHEN 500MG TABLET"]
    assert (syn.generic_name, syn.match_reason) == ("PARACETAMOL", "synonym")

    fuzzy = out["PARACETMOL 500MG TAB"]
    assert (fuzzy.generic_name, fuzzy.match_reason) == ("PARACETAMOL", "fuzzy")

    mix = out["AMOXICILLIN + CLAVULANIC ACID 625MG TAB"]
    assert mix.generic_name == "AMOXICILLIN + CLAVULANIC ACID"
    assert mix.match_reason == "combination_key"
    assert mix.drugbank_id == "DBMIX01"
    assert mix.atc_primary == "J01CR02"

    salt = out["AMLODIPINE ( as BESILATE) 5MG TAB"]
    assert (salt.generic_name, salt.match_reason) == ("AMLODIPINE", "exact")

    missing = out["COMPLETELY UNKNOWN COMPOUND 10MG"]
    assert not missing.matched
    assert missing.match_reason == "unmatched"


def test_combination_without_mixture_synthesizes(spark, dims):
    dims2 = dict(dims, mixtures_dim=None)
    out = _tag(spark, dims2, ["AMOXICILLIN + CLAVULANIC ACID 625MG TAB"])
    row = out["AMOXICILLIN + CLAVULANIC ACID 625MG TAB"]
    assert row.generic_name == "AMOXICILLIN + CLAVULANIC ACID"
    assert row.match_reason.startswith("combination_tokens:")


def test_iv_fluid_compound_salt(spark, dims):
    out = _tag(spark, dims, ["SODIUM + CHLORIDE INJECTION"])
    row = out["SODIUM + CHLORIDE INJECTION"]
    # F18 merges the ions → single generic, not a 2-component combo
    assert row.generic_name == "SODIUM CHLORIDE"
    assert row.match_reason == "exact"


def test_dedup_by_text_single_row_per_text(spark, dims):
    esoa = spark.createDataFrame(
        [("PARACETAMOL 500MG TAB",)] * 5, "raw_text string"
    )
    rows = tag_descriptions(esoa, **dims).collect()
    assert len(rows) == 1


def test_prefix_tier_salt_suffixed_dim(spark, dims):
    """lookup.py:287-295: token 'cefuroxime' must reach dim
    'CEFUROXIME AXETIL' via the prefix tier (fuzzy ratio ~78 < 85
    would miss it); ADVICE r1."""
    generics = spark.createDataFrame(
        [("CEFUROXIME AXETIL", "DB01112"), ("PARACETAMOL", "DB00316")],
        "generic_name string, drugbank_id string",
    )
    dims2 = dict(dims, generics_dim=generics)
    out = _tag(spark, dims2, ["CEFUROXIME 500MG TAB"])
    row = out["CEFUROXIME 500MG TAB"]
    assert (row.generic_name, row.match_reason) == ("CEFUROXIME AXETIL", "prefix")


def test_fuzzy_leading_char_typo(spark, dims):
    """Leading-character typo ('setirizine'→'CETIRIZINE', ratio 90)
    must survive blocking — the reference's rapidfuzz scan is
    unblocked; ADVICE r1."""
    generics = spark.createDataFrame(
        [("CETIRIZINE", "DB00341")], "generic_name string, drugbank_id string"
    )
    dims2 = dict(dims, generics_dim=generics, mixtures_dim=None)
    out = _tag(spark, dims2, ["SETIRIZINE 10MG TAB"])
    row = out["SETIRIZINE 10MG TAB"]
    assert (row.generic_name, row.match_reason) == ("CETIRIZINE", "fuzzy")


def test_combination_gate_counts_distinct_components(spark, dims):
    """A component matching 2 dim rows must not offset a component
    matching 0: no synthesized combination unless EVERY component has
    a hit (tagger.py:707-834; ADVICE r1 high)."""
    generics = spark.createDataFrame(
        # PARACETAMOL twice (distinct drugbank ids) — many-to-many tier
        [("PARACETAMOL", "DB00316"), ("PARACETAMOL", "DB99999")],
        "generic_name string, drugbank_id string",
    )
    dims2 = dict(dims, generics_dim=generics, mixtures_dim=None)
    out = _tag(spark, dims2, ["PARACETAMOL + UNKNOWNCOMPOUNDXYZ 500MG"])
    row = out["PARACETAMOL + UNKNOWNCOMPOUNDXYZ 500MG"]
    assert not (row.match_reason or "").startswith("combination_tokens:")


def test_vaccine_override_and_input_class(spark, dims):
    out = _tag(
        spark,
        dims,
        [
            "MMR VACCINE 0.5ML",
            "5% DEXTROSE IN 0.9% SODIUM CHLORIDE 1 L BOTTLE",
            "PARACETAMOL 500MG TAB",
        ],
    )
    vax = out["MMR VACCINE 0.5ML"]
    assert vax.generic_name == "MEASLES + MUMPS + RUBELLA VACCINE"
    assert vax.match_reason == "vaccine"
    assert vax.matched

    iv = out["5% DEXTROSE IN 0.9% SODIUM CHLORIDE 1 L BOTTLE"]
    assert iv.input_class == "iv_solution"

    single = out["PARACETAMOL 500MG TAB"]
    assert single.input_class == "single"
    assert single.match_reason == "exact"
