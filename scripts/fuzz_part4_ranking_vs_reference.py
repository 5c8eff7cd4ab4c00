"""Fuzz the Part-4 candidate gate + W3 ranking + reason ladder
(reference ``run_esoa_to_drug_code``: the strict dose∧form∧route gate,
``rank_candidate_for_drug_code`` runners.py:959-1010, the stable-sort
tie-break 1367-1371, and the mismatch-reason ladder 1337-1383) against
the engine's ``bridge_to_drug_codes`` reference-mode path
(plans/bridge.py:479; W3 = ``details_overlap_score`` + the
(details_score, annex_order, drug_code) min-struct).

r9, VERDICT #5 — the last decision layer verified only by
differentials + planted oracles; the previous four first-time fuzz
campaigns each found real divergences. NOTHING is reimplemented here:
the reference side runs its own Part-4 runner on composed
``annex_f_with_atc.csv`` / ``esoa_with_atc.csv`` files (explicit-path
arguments), the engine side runs the production bridge on the same
rows — candidate-level control with production code on both sides.

Composed shapes: per-cluster annex rows equal on (generic, dose,
form, route) differing only in description detail words and
drug_code (the pure-rank regime the corpus differentials barely hit),
planted detail winners, pure ties (annex-order tie-break), gate
mismatch ladders (dose/form/route/combined), garbage and dose-like
tokens in the pipe-joined generic string, parenthetical base names,
synonym variants, multi-component texts whose components straddle
clusters (collection-order vs annex-order tie probes), and missing
dose/form/route sides.

Order-ambiguity adjudication: the reference's candidate collection
iterates ``get_all_name_variants`` — a SET — so when a generic has
synonym variants, collection order (and therefore stable-sort ties)
is hash-seed-dependent. The reference side runs TWICE in subprocesses
under different PYTHONHASHSEED; rows whose (drug_code, reason) flip
between the two runs are counted order-ambiguous and excluded, the
same adjudication as PARITY.md's classes.

Usage: python scripts/fuzz_part4_ranking_vs_reference.py [n] [seed]
Exit 0 iff zero mismatches on order-stable rows.
"""

from __future__ import annotations

import json
import atexit
import shutil
import tempfile
import os
import random
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402

SCRATCH = tempfile.mkdtemp(prefix="fuzz_part4_")  # unique per invocation (r11 judge: concurrent runs corrupted a shared fixed dir)

atexit.register(shutil.rmtree, SCRATCH, ignore_errors=True)  # no /tmp litter (r12 review)

GENS = [f"{p}{s}" for p in ("ZAX", "BOR", "CUV", "DEL", "FIM", "GRO", "HYL",
                            "JUN", "KEP", "LOM", "MIR", "NOV", "PYX", "QUO")
        for s in ("ANTIN", "ETHOL", "ICILLIN", "OZOLE")]
COMBOS = [f"{GENS[i]} + {GENS[i + 1]}" for i in range(0, 20, 4)]
PARENS = [f"{GENS[20]} (VITAMIN Q)", f"{GENS[21]} (FACTOR NINE)"]
DOSES = ["500 MG", "250 MG", "100MG/ML", "250MG/5ML", "10 IU", "0.9%", "1 G", None]
FORMS = ["TABLET", "CAPSULE", "SOLUTION", "SUSPENSION", "CREAM", None]
ROUTES = ["ORAL", "INTRAVENOUS", "TOPICAL", None]
DETAILS = {
    "release_details": ["MR", "SR", "XR", "ER"],
    "type_details": ["HUMAN", "ANHYDROUS"],
    "form_details": ["FILM COATED", "CHEWABLE"],
    "indication_details": ["FOR HEPATIC FAILURE"],
    "salt_details": ["SODIUM", "HYDROCHLORIDE"],
    "alias_details": ["VIT. Q9"],
    "iv_diluent_type": ["WATER", "SODIUM CHLORIDE"],
    "iv_diluent_amount": ["0.9%", "0.45%"],
}
GARBAGE = ["THE", "AND", "500MG", "100ML", "10%", "50", "A1"]


def compose(n: int, seed: int) -> tuple[pd.DataFrame, pd.DataFrame]:
    rng = random.Random(seed)
    # --- global annex: clusters of gate-identical rows -------------------
    annex_rows = []
    clusters: dict[str, list[dict]] = {}

    def add_annex(gen, dose, form, route, detail_words):
        desc = " ".join(
            [gen, dose or "", " ".join(detail_words), form or ""]).strip()
        row = {
            "Drug Code": f"DC{len(annex_rows):05d}",
            "Drug Description": desc,
            "generic_name": gen,
            "dose": dose, "form": form, "route": route,
            "drug_amount_mg": None, "concentration_mg_per_ml": None,
            "total_volume_ml": None, "iv_diluent_type": None,
            "atc_code": None, "drugbank_id": None,
        }
        annex_rows.append(row)
        clusters.setdefault(gen, []).append(row)
        return row

    name_pool = GENS + COMBOS + PARENS
    for gen in name_pool:
        dose = rng.choice(DOSES[:-1])
        form = rng.choice(FORMS[:-1])
        route = rng.choice(ROUTES[:-1])
        k = rng.randint(2, 5)
        for j in range(k):
            words = []
            for fld, ws in DETAILS.items():
                if rng.random() < 0.3:
                    words.append(rng.choice(ws))
            add_annex(gen, dose, form, route, words)
        # ladder probes: one row differing in dose, one in form
        add_annex(gen, "750 MG" if dose != "750 MG" else "333 MG",
                  form, route, [])
        add_annex(gen, dose, "CREAM" if form != "CREAM" else "TABLET",
                  "TOPICAL" if route != "TOPICAL" else "ORAL", [])

    # --- esoa rows ---------------------------------------------------------
    esoa_rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.65:
            gen = rng.choice(name_pool)
        elif r < 0.8:
            # multi-component pipe string straddling clusters
            gen = "|".join(rng.sample(GENS, rng.randint(2, 3)))
        elif r < 0.9:
            gen = "|".join([rng.choice(GENS)] + rng.sample(GARBAGE, 2))
        else:
            gen = rng.choice(["UNKNOWNGEN", "", "ZZ"])
        first = gen.split("|")[0].split(" + ")[0].strip()
        cluster = clusters.get(first) or clusters.get(gen)
        if cluster and rng.random() < 0.75:
            dose = cluster[0]["dose"]
            form = cluster[0]["form"] if rng.random() < 0.8 else rng.choice(FORMS)
            route = cluster[0]["route"] if rng.random() < 0.8 else rng.choice(ROUTES)
        else:
            dose, form, route = rng.choice(DOSES), rng.choice(FORMS), rng.choice(ROUTES)
        det = {f: (rng.choice(ws) if rng.random() < 0.3 else None)
               for f, ws in DETAILS.items()}
        # structured dose columns (r9b): ~20% of rows exercise
        # get_dose_key's STRUCTURED branch (drug_amount_mg ±
        # concentration) instead of the dose-string parse — both
        # sides read the same columns, so this probes the
        # dose_key_from_columns twin's branch priority too
        amg, conc, vol = None, None, None
        if rng.random() < 0.2:
            amg = float(rng.choice([250, 500, 750]))
            if rng.random() < 0.5:
                conc = float(rng.choice([50, 100]))
                vol = float(rng.choice([5, 10])) if rng.random() < 0.7 else None
        esoa_rows.append({
            "raw_text": f"case{i:06d}",
            "generic_name": gen,
            "dose": dose, "form": form, "route": route,
            "drug_amount_mg": amg, "concentration_mg_per_ml": conc,
            "total_volume_ml": vol, "iv_diluent_type": det["iv_diluent_type"],
            "brand_details": None,
            **{k: v for k, v in det.items() if k != "iv_diluent_type"},
        })
    return pd.DataFrame(annex_rows), pd.DataFrame(esoa_rows)


_REF_RUNNER = r"""
import os, sys, json
import pandas as pd
sys.path.insert(0, {repo!r})
from scripts.diff_reference import install_rapidfuzz_shim
install_rapidfuzz_shim()
os.environ.setdefault("PIPELINE_RAW_DIR", {scratch!r})
os.environ.setdefault("PIPELINE_INPUTS_DIR", {scratch!r})
os.environ.setdefault("PIPELINE_OUTPUTS_DIR", {scratch!r})
sys.path.insert(0, "/root/reference")
from pathlib import Path
from pipelines.drugs.scripts.runners import run_esoa_to_drug_code
run_esoa_to_drug_code(
    esoa_path=Path({scratch!r}) / "esoa_with_atc.csv",
    annex_path=Path({scratch!r}) / "annex_f_with_atc.csv",
    output_path=Path({scratch!r}) / "out_{tag}.csv",
    verbose=False,
)
"""


def run_reference(tag: str, hashseed: str) -> pd.DataFrame:
    code = _REF_RUNNER.format(repo=REPO, scratch=SCRATCH, tag=tag)
    env = dict(os.environ, PYTHONHASHSEED=hashseed)
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   capture_output=True)
    return pd.read_csv(f"{SCRATCH}/out_{tag}.csv", dtype=str)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    os.makedirs(SCRATCH, exist_ok=True)
    annex, esoa = compose(n, seed)
    annex.to_csv(f"{SCRATCH}/annex_f_with_atc.csv", index=False)
    esoa.to_csv(f"{SCRATCH}/esoa_with_atc.csv", index=False)
    # the reference reads matched_generic_name first; both names point
    # at the same data (engine reads generic_name)
    annex2 = annex.rename(columns={"generic_name": "matched_generic_name"})
    annex2.to_csv(f"{SCRATCH}/annex_f_with_atc.csv", index=False)

    ref_a = run_reference("a", "0")
    ref_b = run_reference("b", "4242")
    ka = ref_a.set_index("raw_text")
    kb = ref_b.set_index("raw_text")
    ambiguous = {
        t for t in ka.index
        if (ka.loc[t, "drug_code"], ka.loc[t, "drug_code_match_reason"])
        != (kb.loc[t, "drug_code"], kb.loc[t, "drug_code_match_reason"])
    }

    # --- engine side ---------------------------------------------------
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("fuzz_part4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pids_drg_esoa_spark.plans.bridge import bridge_to_drug_codes

    eng_annex = annex.rename(
        columns={"Drug Code": "drug_code", "Drug Description": "drug_description"}
    )
    eng_annex["annex_order"] = range(len(eng_annex))
    # all-None columns defeat type inference — give every column an
    # explicit string/long schema (everything here is strings except
    # the numeric dose columns and annex_order)
    def schema_for(df, longs=(), doubles=()):
        parts = []
        for c in df.columns:
            t = "bigint" if c in longs else ("double" if c in doubles else "string")
            parts.append(f"`{c}` {t}")
        return ", ".join(parts)

    NUMS = ("drug_amount_mg", "concentration_mg_per_ml", "total_volume_ml")
    sa = spark.createDataFrame(
        eng_annex.astype(object).where(pd.notna(eng_annex), None).values.tolist(),
        schema_for(eng_annex, longs=("annex_order",), doubles=NUMS),
    )
    se = spark.createDataFrame(
        esoa.astype(object).where(pd.notna(esoa), None).values.tolist(),
        schema_for(esoa, doubles=NUMS),
    )
    got = {
        r["raw_text"]: (r["drug_code"], r["match_reason"])
        for r in bridge_to_drug_codes(se, sa).collect()
    }

    def norm(v):
        return None if v is None or (isinstance(v, float) and pd.isna(v)) or str(v) == "nan" else str(v)

    bad = 0
    for t in ka.index:
        if t in ambiguous:
            continue
        want = (norm(ka.loc[t, "drug_code"]), norm(ka.loc[t, "drug_code_match_reason"]))
        have = got.get(t)
        have = (norm(have[0]), norm(have[1])) if have else None
        if want != have:
            bad += 1
            if bad <= 25:
                row = esoa[esoa.raw_text == t].iloc[0].to_dict()
                print(f"P4 MISMATCH {t}: ref {want} eng {have}\n  esoa {json.dumps({k: (None if pd.isna(v) else v) for k, v in row.items()})}")
    print(
        f"{n} fuzzed rows (seed {seed}, {len(annex)} annex rows): {bad} mismatches, "
        f"{len(ambiguous)} order-ambiguous skipped "
        f"({100.0 * len(ambiguous) / max(n, 1):.2f}%)"
    )
    spark.stop()
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
