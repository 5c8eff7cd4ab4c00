"""Fuzz the Part-4 typed dose-key cascade (F34) against the LIVE
reference (round 6). The reference's dose-key logic lives as nested
functions inside ``run_esoa_to_drug_code`` (runners.py:287:
normalize_diluent:409, parse_combo_dose:428, parse_dose_to_mg:546,
get_dose_key:725, doses_match:792) — this harness lifts them out via
AST source extraction and execs them verbatim, then drives BOTH sides
through the reference's own Part-3 shape:

  text → tokenizer.extract_generic_tokens → categorize_tokens →
  dose = '|'.join(dose-category keys)             (tagger.py:980)
  text → tokenizer.extract_drug_details           (structured columns)
  row  → get_dose_key(row)        vs   dose_key_py(column mode)

and compares the typed key tuples field-for-field, plus
``doses_match`` vs ``dose_keys_match_py`` over sampled key PAIRS (the
bridge's actual gate decision).

Usage: python scripts/fuzz_dosekey_vs_reference.py [n_cases] [seed]
Exit 0 iff zero key mismatches and zero match-decision mismatches.
"""

from __future__ import annotations

import ast
import os
import random
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.functions.details import (  # noqa: E402
    extract_drug_details_py,
)
from pids_drg_esoa_spark.functions.dosekey import (  # noqa: E402
    DoseKey,
    dose_key_py,
    dose_keys_match_py,
)
from scripts.diff_reference import install_rapidfuzz_shim  # noqa: E402

REF_RUNNERS = "/root/reference/pipelines/drugs/scripts/runners.py"
NESTED = (
    "normalize_diluent",
    "parse_combo_dose",
    "parse_dose_to_mg",
    "get_dose_key",
    "doses_match",
)


def extract_reference_dose_fns() -> dict:
    """Lift the nested dose-key functions (and the DILUENT_EQUIVALENTS
    literal they close over) out of run_esoa_to_drug_code and exec
    them verbatim in a minimal namespace."""
    import re as _re

    import pandas as _pd

    src = open(REF_RUNNERS).read()
    tree = ast.parse(src)
    outer = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "run_esoa_to_drug_code"
    )
    pieces = []
    for node in ast.walk(outer):
        if isinstance(node, ast.FunctionDef) and node.name in NESTED:
            pieces.append((node.lineno, ast.get_source_segment(src, node)))
        # the DILUENT_EQUIVALENTS / UNIT_TO_MG dict literal assignments
        if (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name)
                and t.id in ("DILUENT_EQUIVALENTS", "UNIT_TO_MG")
                for t in node.targets
            )
        ):
            pieces.append((node.lineno, ast.get_source_segment(src, node)))
    assert len(pieces) == len(NESTED) + 2, f"extracted {len(pieces)} pieces"
    ns = {"re": _re, "pd": _pd}
    for _, seg in sorted(pieces):
        exec(textwrap.dedent(seg), ns)  # noqa: S102 — reference's own code
    return ns


GENERICS = [
    "PARACETAMOL", "AMOXICILLIN", "CEFTRIAXONE", "SALBUTAMOL",
    "SODIUM CHLORIDE", "DEXTROSE", "INSULIN", "EPOETIN",
    "POTASSIUM CHLORIDE", "MANNITOL", "HEPARIN",
]
DOSES = [
    "500MG", "500 MG", "1 G", "2.5 mg", "1,000 MG", "1000 IU", "5000 IU",
    "10 MCG", "250 MG/5 ML", "40 MG/ML", "1000 IU/ML", "500/125 MG",
    "0.9%", "5%", "9%", ".9%", "10 %", "20 MEQ", "500 MG + 125 MG",
    "50", "1 MIU", "2 G/10 ML",
]
VOLUMES = ["1 ML", "5 ML", "10 ML", "50 ML", "100 ML", "250 ML", "500 ML", "1 L"]
IV_TEMPLATES = [
    "{pct}% {drug} IN WATER {vol}",
    "{pct}% {drug} IN 0.9% SODIUM CHLORIDE {vol}",
    "{pct}% {drug} IN LACTATED RINGER'S SOLUTION {vol}",
    "{pct}% {drug} IN RINGERS SOLUTION {vol}",
]
NSS_DESCS = [
    "PNSS {vol}", "NSS {vol}", "PLAIN NSS {vol}", "NORMAL SALINE {vol}",
    "D5 WATER {vol}", "D5IMB {vol}", "D10 WATER {vol}", "5% DEXTROSE {vol}",
]
FORMS = ["TABLET", "VIAL", "AMPULE", "SUSPENSION", "SOLUTION", "INJ", "NEBULE"]


def gen_case(rng: random.Random) -> tuple[str, str]:
    """Return (text, matched_generic_name)."""
    r = rng.random()
    if r < 0.15:
        pct = rng.choice(["5", "0.9", "10", "0.3"])
        drug = rng.choice(["DEXTROSE", "SODIUM CHLORIDE", "MANNITOL"])
        text = rng.choice(IV_TEMPLATES).format(
            pct=pct, drug=drug, vol=rng.choice(VOLUMES)
        )
        return text, drug
    if r < 0.3:
        # NSS/D5/D10 inference shapes: volume-only dose, context in desc
        desc = rng.choice(NSS_DESCS).format(vol=rng.choice(VOLUMES))
        gen = "SODIUM CHLORIDE" if ("NSS" in desc or "SALINE" in desc) else "DEXTROSE"
        return desc, gen
    gen = rng.choice(GENERICS)
    parts = [gen]
    if rng.random() < 0.9:
        parts.append(rng.choice(DOSES))
    if rng.random() < 0.3:
        parts.append(rng.choice(VOLUMES))
    if rng.random() < 0.5:
        parts.append(rng.choice(FORMS))
    text = " ".join(parts)
    if rng.random() < 0.15:
        text = text.lower()
    return text, gen


def to_ref_tuple(k: DoseKey):
    """Map this repo's DoseKey to the reference's tuple shape."""
    if k.kind == "none":
        return None
    if k.kind == "iv":
        return ("iv", k.conc, k.diluent, k.vol)
    if k.kind == "conc":
        return ("conc", k.conc, k.vol, k.unit)
    return (k.kind, k.amount)  # mg / iu


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = random.Random(seed)

    install_rapidfuzz_shim()
    sys.path.insert(0, "/root/reference")
    from pipelines.drugs.scripts.tokenizer import (
        categorize_tokens as ref_categorize,
        extract_drug_details as ref_details,
        extract_generic_tokens as ref_extract,
    )

    ref = extract_reference_dose_fns()
    get_dose_key, doses_match = ref["get_dose_key"], ref["doses_match"]

    multiword = frozenset({"SODIUM CHLORIDE", "POTASSIUM CHLORIDE"})
    bad_keys = bad_match = 0
    ref_keys: list = []
    our_keys: list[DoseKey] = []
    for i in range(n):
        text, gen = gen_case(rng)
        det = ref_details(text)
        toks, _ = ref_extract(text, set(multiword))
        dose_str = "|".join(ref_categorize(toks).get("dose", {}).keys()) or None
        row = {
            "drug_amount_mg": det["drug_amount_mg"],
            "concentration_mg_per_ml": det["concentration_mg_per_ml"],
            "iv_diluent_type": det["iv_diluent_type"],
            "total_volume_ml": det["total_volume_ml"],
            "dose": dose_str,
            "DESCRIPTION": text,
            "matched_generic_name": gen,
        }
        rk = get_dose_key(row)
        ok = dose_key_py(dose_str, generic=gen,
                         details=extract_drug_details_py(text), desc=text)
        if rk != to_ref_tuple(ok):
            bad_keys += 1
            print(f"KEY MISMATCH {text!r} dose={dose_str!r}\n  ref {rk}\n  our {to_ref_tuple(ok)}")
        ref_keys.append(rk)
        our_keys.append(ok)

    # Pairwise match-decision fuzz over a sample of key pairs.
    n_pairs = min(len(ref_keys) * 4, 200_000)
    for _ in range(n_pairs):
        i, j = rng.randrange(len(ref_keys)), rng.randrange(len(ref_keys))
        r = bool(doses_match(ref_keys[i], ref_keys[j]))
        o = dose_keys_match_py(our_keys[i], our_keys[j])
        if r != o:
            bad_match += 1
            print(f"MATCH MISMATCH ref={ref_keys[i]} vs {ref_keys[j]}: ref {r} our {o}")

    print(
        f"{n} fuzzed cases: {bad_keys} key mismatches; "
        f"{n_pairs} sampled pairs: {bad_match} match-decision mismatches"
    )
    return 0 if bad_keys == 0 and bad_match == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
