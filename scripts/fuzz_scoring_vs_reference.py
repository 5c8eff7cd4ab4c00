"""Fuzz the W1 candidate-selection layer (``select_best_candidate`` +
``sort_atc_codes`` + the live ``is_combination_atc``, reference
scoring.py:42-70,203-387) against the LIVE reference over composed
candidate sets (round 8 — the last big decision layer that had no
candidate-level fuzz; rounds 5-7 proved every layer fuzzed for the
first time surfaced a latent divergence, and this one surfaced THREE:
the combo-ATC flag matched neither reference variant, atc_priority
used the W2-first ATC's flag — inverted for combination inputs over
mixed ATC sets — and the output/tie-key ATC applied W2's length-first
ordering where the reference compares the winning pair's code string
lexicographically).

Engine side runs the PRODUCTION code: ``flag_combination_atc`` (the
F28 expr) + ``w1_select_best`` (the stage-5 window) in ONE Spark job
per seed over every fuzzed case, with the F33 gate replicated
driver-side from the same Python twins the production pandas_udf
wraps (``generics_match_py``/``iv_vehicle_skip_py`` — each separately
fuzz-pinned). Reference side calls ``select_best_candidate`` per case.

Full-tuple ties (reference winner depends on candidate list order —
its sort is stable and nothing orders candidates after cand_atc) are
detected by re-running the reference on the reversed candidate list;
order-dependent cases are counted and excluded from the verdict, the
same adjudication as the Part-1 brand keep='first' ties.

Usage: python scripts/fuzz_scoring_vs_reference.py [n] [seed]
Exit 0 iff zero mismatches on order-stable cases.
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.functions.constants import (  # noqa: E402
    ATC_COMBINATION_PATTERNS,
    is_combination_atc_py,
)
from pids_drg_esoa_spark.functions.matching import (  # noqa: E402
    MATCH_PRIORITY,
    generics_match_py,
    iv_vehicle_skip_py,
)
from pids_drg_esoa_spark.functions.tokens import apply_synonym_py  # noqa: E402
from scripts.diff_reference import install_rapidfuzz_shim  # noqa: E402

# --- pools ----------------------------------------------------------------
# ATC pool: combo-by-pattern, non-combo, the OLD engine flag's suffix
# traps (suffix 20/30/50-59 but no pattern — must be NON-combo on the
# live path), short 5-char codes, and a lowercase probe.
ATCS_COMBO = [
    "J01CR02", "C07FB02", "A10BD07", "N02BE51", "C09DA03", "R03AK06",
    "A02BD01", "M05BB03", "N02AJ06", "R03DA20", "C09DA", "J01CR",
]
ATCS_PLAIN = [
    "A01AA01", "N05BA01", "B01AC06", "J01CA04", "N02BE01", "P01BA02",
    "A10AB", "N05BA", "B05XA03", "j01ca08",
]
ATCS_SUFFIX_TRAP = ["M03BX55", "A02BC20", "C03EA30", "B05XA30", "D07XC54"]
ATC_POOL = ATCS_COMBO + ATCS_PLAIN + ATCS_SUFFIX_TRAP

BASES = [
    "PARACETAMOL", "AMOXICILLIN", "CEFTRIAXONE", "SALBUTAMOL",
    "ASCORBIC ACID", "IRON", "SODIUM ASCORBATE", "CLAVULANIC ACID",
    "IODINE", "IODAMIDE", "DEXTROSE", "SODIUM CHLORIDE",
    "VITAMIN INTRAVENOUS", "AMINO ACIDS", "SALBUTAMOL SULFATE",
    "METFORMIN", "LOSARTAN", "HYDROCHLOROTHIAZIDE",
]
SUBTYPES = ["FAT-SOLUBLE", "CRYSTALLINE STANDARD", "B COMPLEX"]
DETAIL_WORDS = {
    "release_details": ["MR", "SR", "XR", "ER"],
    "type_details": ["HUMAN", "ANHYDROUS", "MONOBASIC"],
    "form_details": ["FILM COATED", "CHEWABLE"],
    "indication_details": ["FOR HEPATIC FAILURE", "FOR NEBULIZATION"],
    "salt_details": ["SODIUM", "HYDROCHLORIDE", "SULFATE"],
    "brand_details": ["BIOGESIC", "VENTOLIN", "AUGMENTIN"],
    "alias_details": ["VIT. D3", "VIT C"],
    "iv_diluent_type": ["WATER", "SODIUM CHLORIDE", "LACTATED RINGER'S"],
}
FORMS = ["TABLET", "CAPSULE", "SOLUTION", "SUSPENSION"]


def gen_generic(rng: random.Random, allow_combo: bool = True) -> str:
    if allow_combo and rng.random() < 0.3:
        k = rng.choice([2, 2, 3])
        sep = rng.choice([" + ", " AND "])
        return sep.join(
            rng.choice(BASES) for _ in range(k)
        )
    base = rng.choice(BASES)
    if rng.random() < 0.2:
        base = f"{base}, {rng.choice(SUBTYPES)}"
    return base


def main() -> int:  # noqa: C901
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rng = random.Random(seed)

    install_rapidfuzz_shim()
    sys.path.insert(0, "/root/reference")
    from pipelines.drugs.scripts.lookup import apply_synonym as ref_apply
    from pipelines.drugs.scripts import scoring as ref_scoring

    # 1) the combo-ATC flag itself, exhaustive over the pool + patterns
    flag_bad = 0
    for code in ATC_POOL + list(ATC_COMBINATION_PATTERNS) + ["", "None"]:
        r, o = ref_scoring.is_combination_atc(code), is_combination_atc_py(code)
        if r != o:
            flag_bad += 1
            print(f"FLAG MISMATCH {code!r}: ref {r} our {o}")

    # 2) sort_atc_codes (W2) on random code lists — against the same
    # struct ordering w1_select_best's payload uses
    w2_bad = 0
    for _ in range(2000):
        codes = rng.sample(ATC_POOL, rng.randint(1, 6))
        ref_sorted = ref_scoring.sort_atc_codes(list(codes))
        ours = sorted(
            [c for c in codes if c],
            key=lambda a: (is_combination_atc_py(a), len(a), a),
        )
        if ref_sorted != ours:
            w2_bad += 1
            print(f"W2 MISMATCH {codes!r}: ref {ref_sorted} our {ours}")

    syn = {
        "VIT": "VITAMIN", "VITAMINS": "VITAMIN",
        "ACETAMINOPHEN": "PARACETAMOL",
        "CO-AMOXICLAV": "AMOXICILLIN + CLAVULANIC ACID",
        "D5W": "DEXTROSE",
    }
    ref_syn_fn = lambda g: ref_apply(g, syn)  # noqa: E731
    our_syn_fn = lambda g: apply_synonym_py(g, syn)  # noqa: E731

    # Name → ATC list is GLOBAL per seed (the engine joins the atc dim
    # by generic name, so one name cannot carry two ATC sets)
    name_atcs: dict[str, list[str]] = {}

    def atcs_for(name: str) -> list[str]:
        if name not in name_atcs:
            k = rng.choice([0, 1, 1, 1, 2, 2, 3])
            name_atcs[name] = rng.sample(ATC_POOL, k) if k else []
        return name_atcs[name]

    cases = []
    for i in range(n):
        k_cand = rng.randint(1, 6)
        names: list[str] = []
        while len(names) < k_cand:
            g = gen_generic(rng)
            if g not in names:
                names.append(g)
        cands = []
        for g in names:
            dbid = f"DB{rng.randrange(10000):05d}" if rng.random() < 0.8 else None
            ref_text = None
            if rng.random() < 0.6:
                extra = ""
                if rng.random() < 0.5:
                    fld = rng.choice(list(DETAIL_WORDS))
                    extra = " " + rng.choice(DETAIL_WORDS[fld])
                ref_text = f"{g}{extra} {rng.choice(['100MG', '250MG', ''])}".strip()
            cands.append(
                {"generic_name": g, "atcs": atcs_for(g), "drugbank_id": dbid,
                 "reference_text": ref_text, "source": rng.choice(["pnf", "who", "fda"])}
            )
        # input generics: mostly fragments/wholes of candidate names
        n_inp = rng.choice([1, 1, 1, 2, 3])
        inputs = []
        for _ in range(n_inp):
            r = rng.random()
            if r < 0.55:
                src = rng.choice(names)
                pick = rng.choice(src.replace(" + ", "|").replace(" AND ", "|").split("|"))
                inputs.append(pick.strip())
            elif r < 0.7:
                src = rng.choice(names)
                cut = rng.randrange(4, max(5, len(src)))
                inputs.append(src[:cut].strip())
            else:
                inputs.append(gen_generic(rng, allow_combo=False))
        input_set = {x for x in inputs if x}
        num_input = len(input_set)
        has_plus = rng.random() < 0.35
        has_in = rng.random() < 0.25 and num_input > 1
        is_iv = has_in and not has_plus
        is_comb = num_input > 1 and has_plus
        is_single = num_input == 1
        stripped = sorted(input_set)
        if is_iv and len(stripped) > 1 and rng.random() < 0.5:
            stripped = [stripped[0], rng.choice(["WATER", "SODIUM CHLORIDE", "DEXTROSE"])]
        details = {}
        for fld, words in DETAIL_WORDS.items():
            if rng.random() < 0.25:
                details[fld] = rng.choice(words)
        input_form = rng.choice(FORMS) if rng.random() < 0.4 else None
        cases.append(
            {"id": f"case{i}", "cands": cands, "input_set": input_set,
             "is_single": is_single, "is_comb": is_comb, "is_iv": is_iv,
             "stripped": stripped, "details": details, "input_form": input_form}
        )

    # --- reference side ----------------------------------------------------
    def ref_candidates(case, reverse=False):
        out = []
        seq = reversed(case["cands"]) if reverse else case["cands"]
        for gm in seq:
            codes = [a for a in ref_scoring.sort_atc_codes(list(gm["atcs"])) if a]
            if codes:
                for a in codes:
                    out.append({"atc_code": a, "drugbank_id": gm["drugbank_id"],
                                "generic_name": gm["generic_name"],
                                "reference_text": gm["reference_text"],
                                "source": gm["source"], "form": None, "route": None,
                                "doses": None})
            elif gm["drugbank_id"]:
                out.append({"atc_code": None, "drugbank_id": gm["drugbank_id"],
                            "generic_name": gm["generic_name"],
                            "reference_text": gm["reference_text"],
                            "source": gm["source"], "form": None, "route": None,
                            "doses": None})
        return out

    def ref_best(case, reverse=False):
        cats = {"form": {case["input_form"]: 1}} if case["input_form"] else {}
        best = ref_scoring.select_best_candidate(
            candidates=ref_candidates(case, reverse),
            input_tokens=[],
            input_categories=cats,
            # the SAME set object both sides: generics_match returns on
            # the first base-matching input, so set iteration order is
            # part of the contract — a copy could iterate differently
            input_generics_normalized=case["input_set"],
            is_single_drug=case["is_single"],
            is_combination=case["is_comb"],
            is_iv_solution=case["is_iv"],
            stripped_generics=case["stripped"],
            apply_synonyms_fn=ref_syn_fn,
            input_details=case["details"],
        )
        return (best["generic_name"], best["atc_code"]) if best else None

    ref_wins, ambiguous = {}, set()
    for case in cases:
        fwd = ref_best(case)
        if fwd != ref_best(case, reverse=True):
            ambiguous.add(case["id"])
        ref_wins[case["id"]] = fwd

    # --- engine side: ONE Spark job over all cases --------------------------
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("fuzz_scoring")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pids_drg_esoa_spark.pipelines.runner import flag_combination_atc
    from pids_drg_esoa_spark.plans.tagger import w1_select_best

    cand_rows, doc_rows, inp_rows = [], [], []
    for case in cases:
        cid = case["id"]
        active = case["stripped"][0] if len(case["stripped"]) > 1 else None
        vehicle = case["stripped"][1] if len(case["stripped"]) > 1 else None
        for gm in case["cands"]:
            # production F33 gate, driver-side from the same twins the
            # validate pandas_udf wraps (tagger.py:346-370,1296-1323)
            m, reason = generics_match_py(case["input_set"], gm["generic_name"], our_syn_fn)
            if not m:
                continue
            if case["is_iv"] and iv_vehicle_skip_py(gm["generic_name"], active, vehicle, syn):
                continue
            gu = gm["generic_name"].upper()
            cand_is_combo = " + " in gu or " AND " in gu
            if case["is_comb"] and not cand_is_combo:
                continue
            cand_rows.append(
                (cid, gm["generic_name"], gm["drugbank_id"], gm["reference_text"],
                 MATCH_PRIORITY.get(reason, 4), "token", reason, gm["source"])
            )
        d = case["details"]
        doc_rows.append(
            (cid, tuple(d.get(f) for f in DETAIL_WORDS), case["input_form"])
        )
        inp_rows.append((cid, case["is_single"], case["is_comb"]))

    details_fields = ", ".join(f"{f}: string" for f in DETAIL_WORDS)
    all_cand = spark.createDataFrame(
        cand_rows,
        "raw_text string, generic_name string, drugbank_id string, "
        "reference_text string, match_priority int, match_reason string, "
        "gm_reason string, sources string",
    )
    atc_dim = flag_combination_atc(
        spark.createDataFrame(
            [(g, a) for g, atcs in name_atcs.items() for a in atcs],
            "generic_name string, atc_code string",
        )
    )
    docs = spark.createDataFrame(
        doc_rows, f"raw_text string, details struct<{details_fields}>, input_form string"
    )
    doc_inputs = spark.createDataFrame(
        inp_rows, "raw_text string, is_single boolean, is_combination boolean"
    )
    got = {
        r["raw_text"]: (r["generic_name"], r["atc_primary"], r["atc_codes"])
        for r in w1_select_best(all_cand, atc_dim, docs, doc_inputs).collect()
    }

    bad = 0
    for case in cases:
        cid = case["id"]
        if cid in ambiguous:
            continue
        want = ref_wins[cid]
        have = got.get(cid)
        have2 = (have[0], have[1]) if have else None
        if want != have2:
            bad += 1
            if bad <= 20:
                print(f"W1 MISMATCH {cid}: ref {want} our {have2}\n  case {case}")
            continue
        # W2 payload check on the winning generic
        if have is not None:
            codes = [a for a in ref_scoring.sort_atc_codes(list(name_atcs.get(have[0], []))) if a]
            want_codes = "|".join(codes) if codes else None
            if want_codes != have[2]:
                bad += 1
                if bad <= 20:
                    print(f"W2-PAYLOAD MISMATCH {cid}: ref {want_codes} our {have[2]}")

    print(
        f"{n} fuzzed candidate sets (seed {seed}): {bad} W1/W2 mismatches, "
        f"{flag_bad} flag mismatches, {w2_bad} sort mismatches, "
        f"{len(ambiguous)} order-ambiguous skipped "
        f"({100.0 * len(ambiguous) / max(n, 1):.2f}%)"
    )
    spark.stop()
    return 0 if bad == 0 and flag_bad == 0 and w2_bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
