"""Fuzz the F1 normalize + F9-F12 dose chain against the LIVE
reference (round 6). The PNF prepare step derives every dose column
through ``parse_dose_struct_from_text(normalize_text(molecule + " " +
spec))`` (reference prepare.py:92-117), and F12 scores candidate
doses — so a divergence in any link silently changes pnf_prepared
and, through unified_generics/dosages, the matching surface.

Compared links (each side runs its OWN function):
  1. normalize_text           (text_utils.py:49)   vs functions.text.normalize_text_py
  2. parse chain norm->parse  (dose.py:49-100)     vs functions.dose.parse_dose_py
  3. to_mg                    (dose.py:103-114)    vs functions.dose.to_mg_py
  4. safe_ratio_mg_per_ml     (dose.py:129-135)    vs mg/per_val twin semantics
  5. dose_similarity          (dose.py:200-259)    vs functions.dose.dose_similarity_pnf_py

Grammar: every unit spelling the two regex banks disagree on (iu,
units, gm/gms, kg, meq, mmol, microgram, milligram, mcg symbols
incl. µ/μ), comma decimals, '/', ' per ', per-volume and per-noun
ratios, packs (x and ×), percents (w/v, w/w), multi-dose strings,
embedded molecule prefixes, junk and empties.

Usage: python scripts/fuzz_dose_vs_reference.py [n] [seed]
Exit 0 iff zero mismatches on every link.
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.functions.dose import (  # noqa: E402
    Dose,
    dose_similarity_pnf_py,
    parse_dose_py,
    to_mg_py,
)
from pids_drg_esoa_spark.functions.text import normalize_text_py  # noqa: E402
from scripts.diff_reference import install_rapidfuzz_shim  # noqa: E402

NAMES = [
    "PARACETAMOL", "AMOXICILLIN + CLAVULANIC ACID", "Ceftriaxone (as sodium)",
    "SALBUTAMOL SULFATE", "VITAMIN B COMPLEX", "FERROUS SULFATE",
    "EPOETIN ALFA", "INSULIN GLARGINE", "POLYMIXIN B", "NEOSTIGMINE",
    "", "HYDROCHLORDE TEST",
]
NUMS = ["500", "5", "0.5", "2.5", "2,5", "1000", "0.25", "12.5", "1,000"]
UNITS = [
    "mg", "MG", "g", "G", "mcg", "ug", "iu", "IU", "gm", "gms", "kg",
    "meq", "mmol", "units", "unit", "µg", "μg", "microgram", "micrograms",
    "milligram", "ng",
]
PER_NOUNS = [
    "tab", "tabs", "tablet", "tablets", "cap", "caps", "capsule",
    "capsules", "sachet", "sachets", "drop", "drops", "gtt",
    "actuation", "actuations", "spray", "sprays", "puff", "puffs",
    "dose", "doses",
]
PER_VOLS = ["ml", "mL", "ML", "l", "L", "5 ml", "100 ml", "2.5 ml", "100 l", "5ml", "cc", "5 cc"]
SEPS = ["/", " / ", " per ", "/ ", " /"]
FORMS = ["TABLET", "CAPSULE", "VIAL", "AMPULE", "SUSPENSION", "SYRUP", "solution for injection"]


def gen_dose(rng: random.Random) -> str:
    r = rng.random()
    num = rng.choice(NUMS)
    unit = rng.choice(UNITS)
    if r < 0.30:  # plain amount
        return f"{num}{rng.choice(['', ' '])}{unit}"
    if r < 0.50:  # ratio per volume
        return f"{num}{rng.choice(['', ' '])}{unit}{rng.choice(SEPS)}{rng.choice(PER_VOLS)}"
    if r < 0.62:  # ratio per noun
        per = rng.choice(PER_NOUNS)
        pv = rng.choice(["", "1 ", "2 "])
        return f"{num} {unit}{rng.choice(SEPS)}{pv}{per}"
    if r < 0.72:  # percent
        wv = rng.choice(["", " w/v", " w/w", "w/v"])
        return f"{num}{rng.choice(['', ' '])}%{wv}"
    if r < 0.82:  # pack
        x = rng.choice(["x", "X", "×"])
        return f"{rng.randrange(2, 20)} {x} {num} {unit}"
    if r < 0.90:  # two doses
        return f"{num} {unit} + {rng.choice(NUMS)} {rng.choice(UNITS)}"
    if r < 0.96:  # dose + stray volume
        return f"{num} {unit} {rng.choice(['', 'in '])}{rng.choice(PER_VOLS)}"
    return rng.choice(["N/A", "as directed", "", "10 15 20", "%", "x 5 mg"])


def gen_text(rng: random.Random) -> str:
    name = rng.choice(NAMES)
    dose = gen_dose(rng)
    form = rng.choice(FORMS) if rng.random() < 0.6 else ""
    parts = [p for p in (name, dose, form) if p]
    if rng.random() < 0.1:
        parts.append("I.V.")
    if rng.random() < 0.1:
        parts.append("iv")
    s = " ".join(parts)
    if rng.random() < 0.2:
        s = s.lower()
    return s


def as_tuple(d: dict | None) -> tuple:
    """Reference payload -> comparable tuple."""
    d = d or {}
    return (
        d.get("dose_kind") or d.get("kind"),
        d.get("strength"),
        d.get("unit"),
        d.get("per_val"),
        d.get("per_unit"),
        d.get("pct"),
    )


def ours_tuple(d: Dose) -> tuple:
    return (d.kind, d.strength, d.unit, d.per_val, d.per_unit, d.pct)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = random.Random(seed)

    install_rapidfuzz_shim()
    sys.path.insert(0, "/root/reference")
    from pipelines.drugs.scripts.dose import (
        dose_similarity as ref_sim,
        parse_dose_struct_from_text as ref_parse,
        safe_ratio_mg_per_ml as ref_ratio,
        to_mg as ref_to_mg,
    )
    from pipelines.drugs.scripts.text_utils import normalize_text as ref_norm

    bad = {"norm": 0, "parse": 0, "to_mg": 0, "ratio": 0, "sim": 0}
    shown = 0

    def report(link: str, detail: str) -> None:
        nonlocal shown
        bad[link] += 1
        if shown < 60:
            print(f"MISMATCH[{link}] {detail}")
            shown += 1

    for i in range(n):
        raw = gen_text(rng)
        rn, on = ref_norm(raw), normalize_text_py(raw)
        if rn != on:
            report("norm", f"{raw!r}\n  ref {rn!r}\n  our {on!r}")
        # parse chain on the REFERENCE normalization so link 2 isolates
        # the parser even while link 1 has open mismatches
        try:
            rp = as_tuple(ref_parse(rn))
        except ValueError:
            # reference extra-ratio branch crashes on comma decimals
            # (dose.py:94) — our twin converts them; skip the compare
            pass
        else:
            op = ours_tuple(parse_dose_py(rn))
            if rp != op:
                report("parse", f"{rn!r}\n  ref {rp}\n  our {op}")

        # to_mg / safe_ratio over the unit bank
        val = float(rng.choice(["0", "0.5", "5", "500", "1000"]))
        unit = rng.choice(UNITS + [None, ""])
        rm = ref_to_mg(val, unit)
        om = to_mg_py(val, unit)
        if rm != om:
            report("to_mg", f"({val}, {unit!r}): ref {rm} our {om}")
        pv = rng.choice([None, "", "0", "1", "5", "abc", 2.0])
        rr = ref_ratio(val, unit, pv)
        try:
            pvf = float(pv) if pv not in (None, "") else None
        except (TypeError, ValueError):
            pvf = None
        mg = to_mg_py(val, unit)
        orr = None if mg is None or not pvf else mg / pvf
        if rr != orr:
            report("ratio", f"({val}, {unit!r}, {pv!r}): ref {rr} our {orr}")

        # dose_similarity: random esoa dose dict vs random pnf row
        ek = rng.choice(["amount", "ratio", "percent", None])
        esoa = {}
        if ek == "amount":
            esoa = {"kind": "amount", "strength": float(rng.choice([5, 500, 35, 60, 80])),
                    "unit": rng.choice(["mg", "g", "mcg", "iu"])}
        elif ek == "ratio":
            esoa = {"kind": "ratio", "strength": float(rng.choice([5, 100, 500])),
                    "unit": rng.choice(["mg", "g", "mcg", "iu"]),
                    "per_val": rng.choice([1.0, 5.0])}  # 0.0 excluded: the
            # REFERENCE ZeroDivisionErrors on it (dose.py:244); our
            # guard treats 0 as 1.0 — documented improvement
        elif ek == "percent":
            esoa = {"kind": "percent", "pct": rng.choice([0.9, 5.0, 10.0])}
        pnf = {
            "dose_kind": rng.choice(["amount", "ratio", "percent", None]),
            "strength_mg": rng.choice([None, "", "None", 5.0, 500.0, 35.0, "35", "abc"]),
            "ratio_mg_per_ml": rng.choice([None, 0, 1.0, 20.0, 100.0]),
            "pct": rng.choice([None, 0.9, 5.0, "10"]),
            "generic_id": rng.choice([None, "trimetazidine", " Trimetazidine ", "amlodipine", 7]),
        }
        rs = ref_sim(esoa, pnf)
        d = Dose(kind=esoa.get("kind"), strength=esoa.get("strength"),
                 unit=esoa.get("unit"), per_val=esoa.get("per_val"),
                 pct=esoa.get("pct"))
        try:
            smg = float(pnf["strength_mg"]) if pnf["strength_mg"] not in (None, "", "None") else None
        except (TypeError, ValueError):
            smg = None
        gid = pnf["generic_id"] if isinstance(pnf["generic_id"], str) else None
        try:
            ppct = float(pnf["pct"]) if pnf["pct"] is not None else None
        except (TypeError, ValueError):
            ppct = None
        os_ = dose_similarity_pnf_py(
            d, pnf["dose_kind"], smg,
            pnf["ratio_mg_per_ml"], ppct, gid,
        )
        if rs != os_:
            report("sim", f"esoa={esoa} pnf={pnf}: ref {rs} our {os_}")

    total = sum(bad.values())
    print(f"{n} fuzz cases: {bad} -> {total} total mismatches")
    return 0 if total == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
