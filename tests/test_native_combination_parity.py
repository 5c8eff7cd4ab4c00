"""Native combination normalizer ≡ Python twin — on the golden cases
AND a generated domain corpus (the native version is the tagger's hot
path; any divergence is a correctness bug, not a perf tradeoff)."""

from __future__ import annotations

import random
import sys

from pids_drg_esoa_spark.functions.tokens import (
    normalize_generic_combination_native,
    normalize_generic_combination_py,
)

GOLDEN = [
    "DEXTROSE IN LACTATED RINGERS WITH POTASSIUM CHLORIDE AND MAGNESIUM SULFATE",
    "SODIUM + CHLORIDE INJECTION",
    "DEXTROSE IN SODIUM CHLORIDE SOLUTION",
    "PARACETAMOL 500MG TABLET",
    "AMOXICILLIN + CLAVULANIC ACID 625MG TAB",
    "NEOSTIGMINE 1 gm",
    "CELECOXIB 200MG TAB (OP)",
    "BUTAMIRATE CITRATE (SINECOD FORTE) 50MG TABLET",
    "MUPIROCIN OINTMENT 2%, 52%, 5 G, GRAM",
    "EUROMED (POTASSIUM CHLORIDE) 2MEQ/ML 20ML/VIAL",
    "KETOANALOGUE+AMINO ACIDS 600MG TAB (GENERIC)",
    "5% DEXTROSE IN 0.9% SODIUM CHLORIDE 1 L BOTTLE",
    "D5 500ML",
    "PNSS 1L",
    "",
]


def _corpus(n: int = 300) -> list[str]:
    sys.path.insert(0, "/root/repo/scripts")
    from domain_bench import synth_inputs

    rng = random.Random(7)
    _, _, _, esoa = synth_inputs(rng, n)
    return [t for (t,) in esoa]


def test_native_equals_python(spark):
    texts = GOLDEN + _corpus()
    df = spark.createDataFrame([(t,) for t in texts], "raw string")
    got = [
        r[0] for r in df.select(normalize_generic_combination_native("raw")).collect()
    ]
    want = [normalize_generic_combination_py(t) for t in texts]
    mismatches = [(t, g, w) for t, g, w in zip(texts, got, want) if g != w]
    assert not mismatches, mismatches[:5]


def _adversarial(n: int = 500) -> list[str]:
    """Grammar-fuzzed drug-like texts stressing the structures the
    normalizer special-cases: commas, parentheticals, IN-reorder,
    AND/+ separators, %-doses, junk suffixes, ragged spacing."""
    rng = random.Random(1337)
    generics = ["PARACETAMOL", "SODIUM CHLORIDE", "AMOXICILLIN", "DEXTROSE",
                "CLAVULANIC ACID", "AMINO ACIDS", "ISOSORBIDE DINITRATE",
                "VITAMIN B COMPLEX", "MAGNESIUM SULFATE", "XY"]
    salts = ["SODIUM", "HYDROCHLORIDE", "CITRATE", "SULFATE", ""]
    doses = ["500MG", "2.5 MG/5ML", "0.9%", "1 gm", "275", "70 mg + 2800 IU", ""]
    forms = ["TABLET", "TAB", "CAPSULE", "SUSPENSION", "AMPULE", "SOLUTION", ""]
    junk = ["**", "(OP)", "(GENERIC)", "USP", ", FOR SUSPENSION", "", "", ""]
    seps = [" + ", " AND ", "+", " , ", " IN "]
    out = []
    for _ in range(n):
        k = rng.choice([1, 1, 1, 2, 2, 3])
        parts = []
        for _ in range(k):
            g = rng.choice(generics)
            s = rng.choice(salts)
            parts.append((g + " " + s).strip() if s else g)
        text = rng.choice(seps).join(parts) if k > 1 else parts[0]
        if rng.random() < 0.5:
            text += " " + rng.choice(doses)
        if rng.random() < 0.5:
            text += " " + rng.choice(forms)
        if rng.random() < 0.4:
            text += " " + rng.choice(junk)
        if rng.random() < 0.2:
            text = "  " + text.replace(" ", "  ", 1)
        if rng.random() < 0.15:
            text = text.lower()
        out.append(text.strip())
    return out


def test_native_equals_python_adversarial(spark):
    texts = _adversarial()
    df = spark.createDataFrame([(t,) for t in texts], "raw string")
    got = [
        r[0] for r in df.select(normalize_generic_combination_native("raw")).collect()
    ]
    want = [normalize_generic_combination_py(t) for t in texts]
    mismatches = [(t, g, w) for t, g, w in zip(texts, got, want) if g != w]
    assert not mismatches, (len(mismatches), mismatches[:5])
