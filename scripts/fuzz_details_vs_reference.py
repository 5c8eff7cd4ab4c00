"""Fuzz the F15 master details extractor against the LIVE reference
(round 6): generate composed drug-description texts from a grammar of
doses (plain / ratio / percent / multi-value / comma-grouped), IV
"X% DRUG IN Y% DILUENT" solutions, diluent/reconstitution volumes,
parentheticals (salt / brand / alias), indication+release+form+type
qualifiers and junk, run BOTH the reference's
``tokenizer.extract_drug_details`` (tokenizer.py:330-744) and this
repo's twin ``functions/details.extract_drug_details_py`` and compare
EVERY field of the returned dict — strings, dose arrays and the
computed IV w/v amounts (drug_amount_mg / diluent_amount_mg /
concentration_mg_per_ml) verbatim.

The r5 side-by-side swept 25k cases at 0 diffs but was session-local;
this commits the harness so the breadth check is reproducible (the
same rationale as fuzz_tokens_vs_reference.py).

Usage: python scripts/fuzz_details_vs_reference.py [n_cases] [seed]
Exit 0 iff zero mismatching result dicts.
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.functions.details import (  # noqa: E402
    extract_drug_details_py,
)
from scripts.diff_reference import install_rapidfuzz_shim  # noqa: E402

GENERICS = [
    "PARACETAMOL", "AMOXICILLIN", "CEFTRIAXONE", "SALBUTAMOL", "METFORMIN",
    "LOSARTAN", "DEXTROSE", "SODIUM CHLORIDE", "AMINO ACID SOLUTIONS",
    "ALENDRONATE + CHOLECALCIFEROL", "AMOXICILLIN + CLAVULANIC ACID",
    "NIFEDIPINE", "INSULIN", "IMMUNOGLOBULIN", "POTASSIUM CHLORIDE",
]
DOSES = [
    "500 mg", "500MG", "1 g", "1G", "2.5 mg", "1,000 MG", "1000 IU",
    "10 mcg", "250 mg/5 mL", "500/125 mg", "120 mg/5 mL", "0.9%", "5 %",
    "5%", "20 meq", "1 MIU", "40 mg/mL", "500 mg + 125 mg",
]
VOLUMES = ["50 mL", "100 mL", "250 mL", "500 mL", "1 L", "60 mL", "5 mL"]
IV_BASES = [
    "IN WATER", "IN 0.9% SODIUM CHLORIDE", "IN 0.3% SODIUM CHLORIDE",
    "IN LACTATED RINGER'S SOLUTION", "IN LACTATED RINGERS",
    "IN ACETATED RINGER'S", "IN RINGER'S LACTATE", "IN RINGERS SOLUTION",
]
DILUENTS = [
    "+ 5 mL diluent", "WITH 10 mL solvent", "+ 2 mL sterile water",
    "with 5ml reconstitution fluid",
]
PARENS = [
    "( as SODIUM SALT)", "(as HCl)", "( as SULFATE )", "(VIT. D3)",
    "(BRANDEX)", "(OP)", "(100'S)", "(HUMAN)", "(PEDIATRIC)",
]
QUALIFIERS = [
    "FOR HEPATIC FAILURE", "FOR RENAL FAILURE", "MR", "SR", "XR",
    "EXTENDED RELEASE", "MODIFIED RELEASE", "FILM COATED", "CHEWABLE",
    "DRY POWDER", "HUMAN", "ORODISPERSIBLE", "EFFERVESCENT",
]
FORMS = [
    "TABLET", "CAPSULE", "VIAL", "AMPULE", "SUSPENSION", "SYRUP",
    "SOLUTION", "NEBULE", "INJ", "DROPS", "FOR INJECTION", "PREMIX",
]


def gen_text(rng: random.Random) -> str:
    """Compose a reference-shaped drug description; ~20% of cases use
    the fixed IV 'X% DRUG IN Y% BASE VOLUME' template the w/v math
    keys on, the rest sample the grammar independently."""
    if rng.random() < 0.2:
        pct = rng.choice(["5", "0.9", "10", "0.3", "50"])
        drug = rng.choice(["DEXTROSE", "SODIUM CHLORIDE", "MANNITOL"])
        base = rng.choice(IV_BASES)
        vol = rng.choice(VOLUMES)
        txt = f"{pct}% {drug} {base} {vol}"
        if rng.random() < 0.3:
            txt += " " + rng.choice(FORMS)
        return txt
    parts = [rng.choice(GENERICS)]
    for pool, p in (
        (PARENS, 0.4), (DOSES, 0.85), (VOLUMES, 0.25), (DILUENTS, 0.2),
        (QUALIFIERS, 0.4), (FORMS, 0.6), (PARENS, 0.15),
    ):
        if rng.random() < p:
            parts.append(rng.choice(pool))
    txt = " ".join(parts)
    if rng.random() < 0.15:
        txt = txt.lower()
    elif rng.random() < 0.1:
        txt = txt.title()
    if rng.random() < 0.1:
        txt = txt.replace(" (", "( ", 1)
    return txt


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = random.Random(seed)

    install_rapidfuzz_shim()
    sys.path.insert(0, "/root/reference")
    from pipelines.drugs.scripts.tokenizer import (
        extract_drug_details as ref_extract,
    )

    bad = 0
    for i in range(n):
        t = gen_text(rng)
        ref = ref_extract(t)
        ours = extract_drug_details_py(t)
        diff = {
            k: (ref.get(k), ours.get(k))
            for k in ref
            if ref.get(k) != ours.get(k)
        }
        if diff:
            bad += 1
            print(f"MISMATCH {t!r}")
            for k, (r, o) in diff.items():
                print(f"  {k}: ref={r!r} ours={o!r}")
    print(f"{n} fuzzed texts, {bad} mismatching detail dicts")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
