"""Coverage-parity tracker (VERDICT r3 #3): run the full Part 1-4
drugs flow over the reference-shaped corpus
(pipelines/parity_corpus.py — every text from the reference's own
committed tests/docs) and write COVERAGE_PARITY.md with the per-text
outcomes and the coverage block next to BASELINE.md's production
numbers.

Usage: python scripts/coverage_parity.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pids_drg_esoa_spark.pipelines.parity_corpus import ESOA_CASES, build_inputs  # noqa: E402
from pids_drg_esoa_spark.pipelines.runner import run_drugs_all  # noqa: E402
from pids_drg_esoa_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="coverage-parity")
    res = run_drugs_all(spark, build_inputs(spark))
    rows = {r.raw_text: r for r in res.esoa_with_atc.collect()}
    bridged = {r.raw_text: r for r in res.esoa_with_drug_code.collect()}

    def outcome(r) -> str:
        if r is None or not r.matched:
            return "none"
        return "atc" if r.atc_primary else "generic"

    lines = [
        "# COVERAGE_PARITY — reference-shaped corpus, tracked per round",
        "",
        "Corpus: every eSOA text from the reference's committed tests/docs",
        "(pipelines/parity_corpus.py). Expectations are the reference's own",
        "documented outcomes ('atc' = generic + ATC, 'generic' = generic only,",
        "'none' = unmatched). Regenerate with `python scripts/coverage_parity.py`;",
        "gated by tests/test_coverage_parity.py.",
        "",
        "| raw_text | expected | got generic | reason | drug_code | p4 reason |",
        "|---|---|---|---|---|---|",
    ]
    hits = misses = 0
    for text, want in ESOA_CASES:
        r = rows.get(text)
        b = bridged.get(text)
        ok = outcome(r) == want
        hits += ok
        misses += not ok
        lines.append(
            f"| {text} | {want}{'' if ok else ' **MISS**'} | "
            f"{(r.generic_name if r else None) or ''} | {(r.match_reason if r else '')} | "
            f"{(b.drug_code if b else None) or ''} | {(b.match_reason if b else '')} |"
        )
    n = len(ESOA_CASES)
    lines += [
        "",
        f"**Expectation agreement: {hits}/{n}**"
        + (" — all reference-documented outcomes reproduced." if misses == 0 else f" ({misses} MISS)"),
        "",
        "## Coverage block vs BASELINE.md (production run, different data scale)",
        "",
        "```",
        res.summary_md,
        "```",
        "",
        "The corpus is fixture-scale (20 curated texts), so the tracked",
        "quantity is expectation agreement + round-over-round drift of the",
        "block above — NOT equality with the 146K-row production",
        "percentages (95.5 / 71.4 / 34.9).",
    ]
    out = os.path.join(REPO, "COVERAGE_PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"\nwrote {out}")
    spark.stop()
    sys.exit(0 if misses == 0 else 1)


if __name__ == "__main__":
    main()
