"""Domain throughput benchmark at the reference's production volume.

The reference processes 146,189 eSOA rows (BASELINE.md) with a
process-pool tagger printing rows/s per chunk. This harness
synthesizes a deterministic eSOA-like corpus of the same size from
domain templates (seeded — NOT the driver's testdata, which has no
drug text), runs the full 4-part flow (unified build → tag Annex →
tag eSOA → bridge), and prints one JSON line with wall seconds and
rows/s for comparison against the reference's throughput harness
(tagger.py:499-558).

    python scripts/domain_bench.py [n_rows]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_GENERICS = 400
N_BRANDS = 300
N_ROWS_DEFAULT = 146_189

SYLLABLES = ["par", "ace", "tam", "ol", "mox", "cil", "lin", "dip", "ine", "zol",
             "mab", "stat", "pril", "sar", "tan", "vir", "mycin", "floxa", "cef",
             "tri", "metho", "prim", "sul", "fa", "done", "pam", "lam", "oxi"]
FORMS = ["TAB", "TABLET", "CAPSULE", "CAP", "SUSP 60ML", "INJECTION", "VIAL", "NEBULE"]
DOSES = [50, 100, 200, 250, 300, 500, 750, 1000]


def synth_inputs(rng: random.Random, n_rows: int):
    generics = sorted(
        {
            "".join(rng.choice(SYLLABLES) for _ in range(rng.randint(2, 4))).upper()
            for _ in range(N_GENERICS * 2)
        }
    )[:N_GENERICS]
    brands = [f"BRAND{i:03d}" for i in range(N_BRANDS)]
    brand_map = [(b, rng.choice(generics)) for b in brands]
    # plain-text descriptions — the real Annex F shape (the pipe dose
    # format is Part 2's own intermediate, and feeding it here left
    # every annex row without a parsed dose key: esoa_drug_code was 0
    # and the bridge's matched path went unexercised at volume)
    annex = [
        (f"D{i:05d}", f"{g} {rng.choice(DOSES)} MG {rng.choice(['TABLET','CAPSULE','SUSPENSION'])}")
        for i, g in enumerate(generics)
    ]
    esoa = []
    for _ in range(n_rows):
        g = rng.choice(generics)
        dose = rng.choice(DOSES)
        form = rng.choice(FORMS)
        kind = rng.random()
        if kind < 0.55:
            txt = f"{g} {dose}MG {form}"
        elif kind < 0.7:
            b, bg = rng.choice(brand_map)
            txt = f"{b} ({bg}) {dose} MG {form}"
        elif kind < 0.8:
            g2 = rng.choice(generics)
            txt = f"{g} + {g2} {dose}MG + {rng.choice(DOSES)}MG {form}"
        elif kind < 0.9:
            # typo tier: drop one char to exercise the fuzzy path
            pos = rng.randrange(max(len(g) - 1, 1))
            txt = f"{g[:pos]}{g[pos + 1:]} {dose}MG {form}"
        else:
            txt = f"UNLISTED COMPOUND {rng.randrange(10_000)} {dose}MG"
        esoa.append((txt,))
    return generics, brand_map, annex, esoa


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else N_ROWS_DEFAULT
    rng = random.Random(42)
    generics, brand_map, annex, esoa = synth_inputs(rng, n_rows)

    from pids_drg_esoa_spark.pipelines.runner import run_drugs_all
    from pids_drg_esoa_spark.session import get_spark

    spark = get_spark(app_name="domain-bench")
    inputs = {
        "pnf": spark.createDataFrame(
            [(g, "Oral:", "X00XX00", "500 mg tablet") for g in generics[: N_GENERICS // 2]],
            "`Molecule` string, `Route` string, `ATC Code` string, `Technical Specifications` string",
        ),
        "drugbank_generics": spark.createDataFrame(
            [(f"DB{i:05d}", g) for i, g in enumerate(generics)],
            "drugbank_id string, generic_name string",
        ),
        "drugbank_atc": spark.createDataFrame(
            [(f"DB{i:05d}", g, f"A{i:02d}AA{i % 100:02d}") for i, g in enumerate(generics)],
            "drugbank_id string, generic_name string, atc_code string",
        ),
        "drugbank_brands": spark.createDataFrame(
            [(b, g, None) for b, g in brand_map[: N_BRANDS // 2]],
            "brand_name string, generic_name string, drugbank_id string",
        ),
        "fda_brands": spark.createDataFrame(
            [(b, g) for b, g in brand_map[N_BRANDS // 2:]],
            "brand_name string, generic_name string",
        ),
        "who_atc": spark.createDataFrame(
            [(f"W{i:02d}AA{i % 100:02d}", g) for i, g in enumerate(generics[::3])],
            "atc_code string, atc_name string",
        ),
        "mixtures": spark.createDataFrame(
            [(None, f"{a} + {b}", f"{a} + {b}") for a, b in zip(generics[::7], generics[1::7])],
            "drugbank_id string, mixture_name string, component_generics string",
        ),
        "annex_f": spark.createDataFrame(annex, "drug_code string, drug_description string"),
        "esoa": spark.createDataFrame(esoa, "raw_text string"),
    }

    t0 = time.time()
    res = run_drugs_all(spark, inputs)
    n_bridged = res.esoa_with_drug_code.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "metric": "domain_e2e_wall",
                "value": round(wall, 2),
                "unit": "sec",
                "rows": n_rows,
                "rows_per_sec": round(n_rows / wall, 1),
                "coverage": res.coverage,
                "bridged_rows": n_bridged,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
