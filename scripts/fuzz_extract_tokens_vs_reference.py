"""Direct differential fuzz: functions/tokens.extract_generic_tokens_py
vs the LIVE reference tokenizer.extract_generic_tokens, over composed
adversarial texts (multiword dim names, pure-salt compounds with
'*'/'/' junctions, '( as …)' patterns, '+' combinations with
skip/form words, ' IN ' IV shapes, form-modifier tails, typos, case
noise).

The reference iterates two SETS whose order is hash-dependent
(equal-length multiwords in the pre-pass; PURE_SALT_COMPOUNDS in the
re-add — PARITY.md classes 2/6), so it runs in TWO subprocesses under
different PYTHONHASHSEEDs and texts whose outputs flip between them
are excluded as order-ambiguous; the engine's deterministic stand-ins
cover those.

Usage: python scripts/fuzz_extract_tokens_vs_reference.py [n] [seeds...]
Exit 0 iff 0 mismatches on order-stable texts.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MW_DIMS = [
    "ISOSORBIDE DINITRATE", "AMOXICILLIN + CLAVULANIC ACID",
    "ALUMINIUM HYDROXIDE + MAGNESIUM HYDROXIDE", "TRANEXAMIC ACID",
    "DEXASTATIN + KETOSARTAN", "INSULIN GLARGINE", "SODIUM CHLORIDE",
    "CALCIUM GLUCONATE", "AMINO ACID", "VITAMIN B12",
]
PSC = ["SODIUM LACTATE", "POTASSIUM CITRATE", "CALCIUM ACETATE",
       "MAGNESIUM SULFATE", "SODIUM CHLORIDE", "FERROUS FUMARATE"]
NAMES = ["DEXASTATIN", "KETOSARTAN", "ALBUPRIL", "CIPROMYCIN", "LORAZOLE",
         "METOPINE", "QUETIADONE", "RISPEXETINE", "SODIUM", "ZINC"]
SALTS = ["HYDROCHLORIDE", "SULFATE", "SODIUM", "MALEATE", "TRIHYDRATE"]
FORMS = ["TABLET", "CAPSULE SOFT GELATIN", "SOLUTION", "VIAL", "FILM COATED TABLET",
         "POWDER", "TABLETS EXTENDED RELEASE"]
JUNK = ["USP", "STERILE", "FOR", "1", "L", "BOTTLE", "500", "MG", "5%"]


def typo(rng: random.Random, w: str) -> str:
    if len(w) < 5:
        return w
    i = rng.randrange(1, len(w) - 1)
    return w[:i] + w[i + 1:] if rng.random() < 0.5 else w[:i] + "X" + w[i:]


def compose(rng: random.Random, n: int) -> list[str]:
    texts = []
    while len(texts) < n:
        r = rng.random()
        if r < 0.15:
            t = f"{rng.choice(NAMES)} {rng.choice(SALTS)} 500 MG {rng.choice(FORMS)}"
        elif r < 0.3:
            mw = rng.choice(MW_DIMS)
            if rng.random() < 0.4:
                mw = typo(rng, mw)
            t = f"{mw} {rng.choice(['250 MG', '1 G'])} {rng.choice(FORMS)}"
        elif r < 0.42:
            a, b = rng.sample(PSC, 2)
            t = f"5% {a}{rng.choice(['*', '/', ' + ', '+'])}{b} IN 1 L BOTTLE"
        elif r < 0.54:
            k = rng.choice([2, 3])
            comps = rng.sample(NAMES + PSC, k)
            sep = rng.choice([" + ", "+"])
            t = sep.join(comps) + f" {rng.choice(['625 MG TAB', 'DOSE VIAL', ''])}"
        elif r < 0.64:
            t = (f"{rng.choice(NAMES)} ( as {rng.choice(SALTS)}) "
                 f"{rng.choice(['70 MG', ''])} {rng.choice(FORMS)}")
        elif r < 0.76:
            g = rng.choice(NAMES + MW_DIMS)
            veh = rng.choice(["SODIUM CHLORIDE", "DEXTROSE", "LACTATED RINGER'S", "WATER"])
            t = f"{rng.choice(['5%', '0.9%', ''])} {g} IN {rng.choice(['0.9%', ''])} {veh} 1 L BOTTLE"
        elif r < 0.86:
            t = (f"{rng.choice(NAMES)} {rng.choice(FORMS)} "
                 f"{rng.choice(['GELATIN', 'COATED', 'SUGAR FREE', 'STARCH'])}")
        else:
            t = " ".join(rng.choice(NAMES + JUNK + PSC) for _ in range(rng.randint(2, 7)))
        if rng.random() < 0.2:
            t = t.title()
        if rng.random() < 0.1:
            t = f"DILUENT + {t}"
        texts.append(" ".join(t.split()))
    return list(dict.fromkeys(texts))


_REF_RUNNER = r"""
import json, sys
sys.path.insert(0, "/root/reference")
from pipelines.drugs.scripts.tokenizer import extract_generic_tokens
texts, mw = json.load(open(sys.argv[1]))
out = [extract_generic_tokens(t, set(mw)) for t in texts]
json.dump(out, open(sys.argv[2], "w"))
"""


def run_ref(texts: list[str], mw: list[str], hashseed: str) -> list:
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f_in:
        json.dump([texts, mw], f_in)
        in_p = f_in.name
    out_p = in_p + ".out"
    env = dict(os.environ, PYTHONHASHSEED=hashseed)
    res = subprocess.run(
        [sys.executable, "-c", _REF_RUNNER, in_p, out_p], env=env, capture_output=True
    )
    if res.returncode != 0:
        sys.stderr.write(res.stderr.decode()[-2000:])
        raise RuntimeError("reference subprocess failed")
    out = json.load(open(out_p))
    os.unlink(in_p)
    os.unlink(out_p)
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    seeds = [int(s) for s in sys.argv[2:]] or [17, 71, 20251]

    from pids_drg_esoa_spark.functions.matching import build_multiword_generics_py
    from pids_drg_esoa_spark.functions.tokens import extract_generic_tokens_py

    total_bad = 0
    for seed in seeds:
        rng = random.Random(seed)
        texts = compose(rng, n)
        # multiword set: static constants + the composed dim names
        # (build_multiword_generics_py mirrors the tagger's builder)
        mw = build_multiword_generics_py(MW_DIMS)
        refs = [run_ref(texts, sorted(mw), hs) for hs in ("0", "4242", "7", "99", "31337")]
        ambiguous = sum(
            1 for rows in zip(*refs) if any(r != rows[0] for r in rows[1:])
        )
        from pids_drg_esoa_spark.functions.constants import PURE_SALT_COMPOUNDS

        psc_upper = frozenset(p.upper() for p in PURE_SALT_COMPOUNDS)

        def class6_order_only(ref_g: list, eng_g: list) -> bool:
            """True iff the two generic-token lists differ ONLY in the
            relative order of PURE_SALT_COMPOUNDS members — the
            reference's set-iteration re-add order (PARITY class 6;
            a finite seed sample can miss a stable-looking tie)."""
            if sorted(ref_g) != sorted(eng_g):
                return False
            return [g for g in ref_g if g not in psc_upper] == [
                g for g in eng_g if g not in psc_upper
            ]

        bad = 0
        class6 = 0
        for t, rows in zip(texts, zip(*refs)):
            if any(r != rows[0] for r in rows[1:]):
                continue  # order-ambiguous under hash seed — adjudicated
            a = rows[0]
            etoks, egens = extract_generic_tokens_py(t, mw)
            if [etoks, egens] == [list(a[0]), list(a[1])]:
                continue
            if etoks == list(a[0]) and class6_order_only(list(a[1]), egens):
                class6 += 1
                continue
            bad += 1
            if bad <= 10:
                print(f"  seed {seed}: {t!r}\n    ref  {a}\n    eng  {(etoks, egens)}")
        print(f"seed {seed}: {len(texts)} texts, {ambiguous} order-ambiguous excluded, "
              f"{class6} class-6 psc-order (adjudicated), {bad} mismatches")
        total_bad += bad
    print(f"\nEXTRACT-TOKENS TOTAL mismatches: {total_bad}")
    return 0 if total_bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
