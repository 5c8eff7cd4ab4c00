"""Fuzz the Part-4 form/route compatibility gates (F24-F27 strict
tier) against the LIVE reference (round 7).

``forms_compatible`` and ``route_matches`` are nested inside
``run_esoa_to_drug_code`` (runners.py:1195-1335) — the same
lift-via-AST treatment as the dose-key harness: exec the reference's
own source in a namespace carrying its real FORM_EQUIVALENTS /
FORM_TO_ROUTES tables, then drive both sides over composed
(cand_form, esoa_form, cand_route, esoa_route) tuples. These two
predicates decide which Annex candidates survive the strict bridge
gate, and ``forms_compatible`` contains TWO order-sensitive
behaviors worth fuzzing specifically:

- the partial-key fallback scans FORM_TO_ROUTES in dict order and
  takes the FIRST key that substring-matches — table ORDER is
  load-bearing, so the harness first asserts the engine's
  FORM_TO_ROUTES_P4 matches the reference table key-for-key IN
  ORDER (and FORM_EQUIVALENTS_P4 value-for-value);
- observed routes CONSTRAIN the form-derived route sets
  (set-intersection vs replacement depending on emptiness).

Grammar: canonical forms, alias spellings, unknown/garbage forms,
substring fragments of real form names (the partial-match surface),
mixed case, empty/None, routes from every synonym group + unknowns.

Usage: python scripts/fuzz_routes_forms_vs_reference.py [n] [seed]
Exit 0 iff zero mismatches on both predicates.
"""

from __future__ import annotations

import ast
import os
import random
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.functions.part4_tables import (  # noqa: E402
    FORM_EQUIVALENTS_P4,
    FORM_TO_ROUTES_P4,
)
from pids_drg_esoa_spark.functions.routes_forms import (  # noqa: E402
    part4_forms_compatible_py,
    part4_route_matches_py,
)

REF_RUNNERS = "/root/reference/pipelines/drugs/scripts/runners.py"
NESTED = ("forms_compatible", "route_matches")


def extract_reference_fns() -> dict:
    """Lift the nested Part-4 form/route predicates out of
    run_esoa_to_drug_code and exec them verbatim with the reference's
    own constant tables in scope."""
    sys.path.insert(0, "/root/reference")
    from pipelines.drugs.scripts.unified_constants import (
        FORM_EQUIVALENTS,
        FORM_TO_ROUTES,
    )

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
    assert len(pieces) == len(NESTED), f"extracted {len(pieces)} pieces"
    ns = {"FORM_EQUIVALENTS": FORM_EQUIVALENTS, "FORM_TO_ROUTES": FORM_TO_ROUTES}
    for _, seg in sorted(pieces):
        exec(textwrap.dedent(seg), ns)  # noqa: S102 — reference's own code
    return ns


def check_tables() -> int:
    """The engine's P4 tables must equal the reference's — including
    FORM_TO_ROUTES key ORDER (the partial-match loop takes the first
    substring hit)."""
    sys.path.insert(0, "/root/reference")
    from pipelines.drugs.scripts.unified_constants import (
        FORM_EQUIVALENTS,
        FORM_TO_ROUTES,
    )

    bad = 0
    if list(FORM_TO_ROUTES_P4) != list(FORM_TO_ROUTES):
        bad += 1
        print("FORM_TO_ROUTES key ORDER differs from reference")
    for k in FORM_TO_ROUTES:
        if list(FORM_TO_ROUTES_P4.get(k, ())) != list(FORM_TO_ROUTES[k]):
            bad += 1
            print(f"FORM_TO_ROUTES[{k!r}]: ref {FORM_TO_ROUTES[k]} "
                  f"ours {FORM_TO_ROUTES_P4.get(k)}")
    ref_eq = {k: set(v) for k, v in FORM_EQUIVALENTS.items()}
    our_eq = {k: set(v) for k, v in FORM_EQUIVALENTS_P4.items()}
    if ref_eq != our_eq:
        bad += 1
        only_r = set(ref_eq) - set(our_eq)
        only_o = set(our_eq) - set(ref_eq)
        diff = {k for k in set(ref_eq) & set(our_eq) if ref_eq[k] != our_eq[k]}
        print(f"FORM_EQUIVALENTS differ: only-ref {sorted(only_r)[:5]} "
              f"only-ours {sorted(only_o)[:5]} value-diffs {sorted(diff)[:5]}")
    return bad


ROUTES = [
    "ORAL", "PO", "BY MOUTH", "PARENTERAL", "INTRAVENOUS", "IV", "IM",
    "INTRAMUSCULAR", "SUBCUTANEOUS", "SC", "SQ", "INHALATION", "INHALED",
    "NEBULIZATION", "RESPIRATORY", "TOPICAL", "EXTERNAL", "CUTANEOUS",
    "OPHTHALMIC", "EYE", "OCULAR", "OTIC", "EAR", "NASAL", "RECTAL", "PR",
    "VAGINAL", "PV", "INTRATHECAL", "SUBLINGUAL", "ZZUNKNOWN", "",
]


def gen_form(rng: random.Random, pool: list[str]) -> str | None:
    r = rng.random()
    if r < 0.08:
        return None
    if r < 0.12:
        return ""
    if r < 0.20:  # garbage
        return rng.choice(["BLOB", "ZZFORM", "WIDGET", "X", "KIT; TABLET"])
    form = rng.choice(pool)
    if rng.random() < 0.25 and len(form) > 4:  # substring fragment —
        # the partial-key-match surface ('TABLE', 'ABLET', …)
        cut = rng.randrange(3, len(form))
        form = form[:cut] if rng.random() < 0.5 else form[-cut:]
    if rng.random() < 0.2:
        form = form.lower()
    if rng.random() < 0.15:
        form = f"  {form} "
    return form


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    rng = random.Random(seed)

    bad_tables = check_tables()
    ns = extract_reference_fns()
    ref_fc, ref_rm = ns["forms_compatible"], ns["route_matches"]

    pool = list(FORM_TO_ROUTES_P4) + [
        "AMPULE", "AMPOULE", "VIAL", "INJECTION", "BOTTLE", "SYRUP",
        "SUSPENSION", "SOLUTION", "ELIXIR", "LIQUID", "DROPS", "TABLET",
        "CAPSULE", "CAPLET", "NEBULE", "NEBULIZER", "INHALER", "AEROSOL",
        "MDI", "DPI", "CREAM", "OINTMENT", "GEL", "LOTION", "GRANULE",
        "POWDER", "SACHET",
    ]
    bad_fc = bad_rm = 0
    for i in range(n):
        cf, ef = gen_form(rng, pool), gen_form(rng, pool)
        cr = rng.choice(ROUTES) if rng.random() < 0.7 else None
        er = rng.choice(ROUTES) if rng.random() < 0.7 else None
        r = bool(ref_fc(cf, ef, cr, er))
        o = part4_forms_compatible_py(cf, ef, cr, er)
        if r != o:
            bad_fc += 1
            print(f"FORMS MISMATCH cand={cf!r} esoa={ef!r} cr={cr!r} er={er!r}: "
                  f"ref {r} our {o}")
        r2 = bool(ref_rm(cr, er))
        o2 = part4_route_matches_py(cr, er)
        if r2 != o2:
            bad_rm += 1
            print(f"ROUTE MISMATCH cand={cr!r} esoa={er!r}: ref {r2} our {o2}")

    total = bad_tables + bad_fc + bad_rm
    print(
        f"{n} fuzzed tuples (seed {seed}): tables={bad_tables}, "
        f"forms_compatible={bad_fc}, route_matches={bad_rm} — "
        f"{total} total mismatches"
    )
    return 0 if total == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
