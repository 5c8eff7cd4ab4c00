"""Randomized Part-1 fuzz: compose adversarial PNF rows (messy
molecules, salt tails, parentheticals, combination names, junk specs,
multi-route labels, dirty ATC codes) plus randomized lean dims, run
the REFERENCE's prepare.py + build_unified_reference.py in-place vs
the engine's prepare_pnf + build_unified_*, and compare with
scripts/diff_reference_part1.compare_outputs (the widened r10 compare:
full dose struct, form with the PARITY class-2 adjudication, the F15
details columns against the engine twin, and all seven unified
tables).

Why: Part 1 is the spine every downstream table consumes; its
differential ran only on a FIXED corpus until now, and eight
consecutive first-time randomized campaigns against other surfaces
each found real divergences.

Usage: python scripts/fuzz_part1_vs_reference.py [rows_per_seed] [seeds...]
Exit 0 iff 0 unexplained mismatches across all seeds.
"""

from __future__ import annotations

import os
import random
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402

import scripts.diff_reference_part1 as dp1  # noqa: E402

PRE = ["DEXA", "KETO", "ALBU", "CIPRO", "METO", "LORA", "FENO", "QUETIA",
       "RISPE", "OLME", "CARVE", "GLICLA", "PANTO", "ROSU", "LEVO", "HYDRO"]
SUF = ["STATIN", "SARTAN", "PRIL", "OLOL", "MYCIN", "CILLIN", "ZOLE",
       "PINE", "DONE", "XETINE", "MIDE", "ZIDE"]
SALTS = ["HYDROCHLORIDE", "SULFATE", "SODIUM", "MALEATE", "BESILATE",
         "TRIHYDRATE", "SODIUM SUCCINATE", "POTASSIUM", "CITRATE",
         "MONOHYDRATE", "TARTRATE"]
ROUTES = ["Oral:", "IV:", "Inj.:", "Oral/Inj.:", "Buccal:", "Topical:",
          "Ophthalmic:", "Oral: IV:", "Sublingual/Oral:", "oral", "", None]
SPECS = [
    "500 mg tablet", "250 mg/5 mL suspension", "0.9% 1 L solution",
    "1 g vial", "2 x 500 mg", "10 mg/mL injection", "500mg",
    "50 mcg/actuation inhaler", "1,000 mg sachet", "75 mg + 20 mg tablet",
    "capsule soft gelatin 500 MG", "5 MG/5ML syrup 60 mL",
    "0.05% cream 10 g", "20 meq/15 mL", "junk spec text", "", None,
    "1.5 mg tablet", "2.5 iu vial", "per 5 mL 125 mg",
]
ATCS = ["N02BE01", " n02be01 ", "J01CR02", "C09AA05", None, "", "???",
        "A10BA02 ", "B05XA03"]


def synth_name(rng: random.Random) -> str:
    return rng.choice(PRE) + rng.choice(SUF)


def compose_molecule(rng: random.Random, name: str) -> str:
    r = rng.random()
    if r < 0.15:
        m = name
    elif r < 0.35:
        m = f"{name} {rng.choice(SALTS)}"
    elif r < 0.45:
        m = f"{name} AS {rng.choice(SALTS)}"
    elif r < 0.55:
        m = f"{name} ( as {rng.choice(SALTS)})"
    elif r < 0.65:
        paren = rng.choice([
            "BRANDX", "ANTI-INFECTIVE", "VIT. D3", "PEDIATRIC",
            "as sodium salt", "MODIFIED RELEASE",
        ])
        m = f"{name} ({paren})"
    elif r < 0.75:
        m = f"{name} + {synth_name(rng)}"
    elif r < 0.82:
        m = f"{name}/{synth_name(rng)}"
    elif r < 0.88:
        m = f"{name}, Extended Release"
    elif r < 0.94:
        m = f"{name} 10% SOLUTION"
    else:
        m = rng.choice([f"  {name}  ", name.title(), name.lower(), ""])
    if rng.random() < 0.2:
        m = m.title()
    return m


def build_fuzz_dims(rng: random.Random, n_pnf: int) -> dict[str, pd.DataFrame]:
    names = sorted({synth_name(rng) for _ in range(max(24, n_pnf // 3))})
    pnf_rows = []
    for i in range(n_pnf):
        name = rng.choice(names)
        pnf_rows.append((
            compose_molecule(rng, name),
            rng.choice(ROUTES),
            rng.choice(ATCS),
            rng.choice(SPECS),
        ))
    dbg, dba, who, fdab, dbb, mix, syn = [], [], [], [], [], [], []
    for i, name in enumerate(names):
        dbid = f"DBF{i:04d}"
        case = rng.choice([str.title, str.upper, str.lower])
        dbg.append((dbid, case(name)))
        if rng.random() < 0.7:
            dba.append((dbid, name, rng.choice([a for a in ATCS if a])))
        if rng.random() < 0.3:
            who.append((rng.choice([a for a in ATCS if a]).strip(), name))
        if rng.random() < 0.4:
            fdab.append((f"BR{name[:6]}", name))
            if rng.random() < 0.5:  # same-source duplicate brand rows
                fdab.append((f"BR{name[:6]}", rng.choice(names)))
        if rng.random() < 0.25:
            dbb.append((f"DB{name[:6]}X", name.title(), dbid))
        if rng.random() < 0.35:
            syn.append((f"SYN{name}", case(name)))
        if rng.random() < 0.1:
            syn.append((f"DANGLING{name}", f"NOSPINE{name}"))
    for i in range(0, len(names) - 1, 7):
        a, b = names[i], names[i + 1]
        mix.append((f"DBMXF{i:03d}", f"{a.title()} + {b.title()}",
                    rng.choice([f"{a.lower()} + {b.lower()}",
                                f" {a.lower()}+{b.lower()} ",
                                f"{b.lower()} + {a.lower()}"])))
    ids = [r[0] for r in dbg]
    dos_rows, salt_rows = [], []
    forms = ["tablet", "Capsule ", "SOLUTION", None, "syrup"]
    droutes = ["oral", " Intravenous", None, "topical"]
    strengths = ["500 mg", " 250 MG ", "10 mg/5 mL", "1 g", None, "0.5 mg"]
    for i, dbid in enumerate(ids):
        for _ in range(rng.choice([0, 1, 1, 2])):
            dos_rows.append((dbid, rng.choice(forms), rng.choice(droutes),
                             rng.choice(strengths)))
        if rng.random() < 0.3:
            salt_rows.append((dbid, rng.choice(["hydrochloride", "Sulfate ",
                                                "sodium", ""]), f"sk{i}"))
            if rng.random() < 0.3:
                salt_rows.append(salt_rows[-1])
    dos_rows.append(("DBUNKNOWN9", "tablet", "oral", "500 mg"))
    dos_rows.append((None, "tablet", "oral", "1 g"))
    salt_rows.append((None, "sodium", "orphan"))
    return {
        "pnf": pd.DataFrame(
            pnf_rows,
            columns=["Molecule", "Route", "ATC Code", "Technical Specifications"],
        ),
        "drugbank_generics": pd.DataFrame(dbg, columns=["drugbank_id", "generic_name"]),
        "drugbank_atc": pd.DataFrame(dba, columns=["drugbank_id", "generic_name", "atc_code"]),
        "who_atc": pd.DataFrame(who or [("Z99ZZ99", "ZFILLER")], columns=["atc_code", "atc_name"]),
        "fda_brands": pd.DataFrame(fdab or [("BRZ", "ZFILLER")], columns=["brand_name", "generic_name"]),
        "drugbank_brands": pd.DataFrame(dbb or [("DBZX", "Zfiller", "DBF0000")],
                                        columns=["brand_name", "generic_name", "drugbank_id"]),
        "mixtures": pd.DataFrame(mix or [("DBMXZ", "Afill + Bfill", "afill + bfill")],
                                 columns=["drugbank_id", "mixture_name", "component_generics"]),
        "synonyms": pd.DataFrame(syn or [("SYNZ", "ZFILLER")], columns=["synonym", "generic_name"]),
        "dosages": pd.DataFrame(dos_rows, columns=["drugbank_id", "form", "route", "strength"]),
        "salts": pd.DataFrame(salt_rows, columns=["drugbank_id", "salt_name", "name_key"]),
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seeds = [int(s) for s in sys.argv[2:]] or [11, 47, 2028]
    total = 0
    for seed in seeds:
        rng = random.Random(seed)
        shutil.rmtree(dp1.SCRATCH, ignore_errors=True)
        os.makedirs(dp1.SCRATCH)
        dims = build_fuzz_dims(rng, n)
        print(f"--- seed {seed}: {len(dims['pnf'])} pnf rows, "
              f"{len(dims['drugbank_generics'])} spine generics")
        bad = dp1.compare_outputs(dims)
        total += bad
        print(f"seed {seed}: {bad} unexplained mismatches")
    shutil.rmtree(dp1.SCRATCH, ignore_errors=True)
    print(f"\nFUZZ PART-1 TOTAL unexplained mismatches: {total}")
    return 0 if total == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
