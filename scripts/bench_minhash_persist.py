"""Adjudicate the dedup_minhash_lsh_pairs persist strategy with data
(VERDICT r3 #5): time the operator at sf0.1 and at a 10× scale-up
("sf1": sf0.1 documents unioned 10x with shifted doc ids — a local
benchmark artifact, never an oracle input) under three plans:

- both:  persist(shingles) + persist(signature)   [shipped]
- none:  no persists (every consumer recomputes the subtree)
- sh:    persist(shingles) only

Usage: python scripts/bench_minhash_persist.py [sf_dir] [repeats]
Prints one JSON line per (scale, variant).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from pids_drg_esoa_spark.operators.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    minhash_signature,
    verify_jaccard,
    word_shingles,
)
from pids_drg_esoa_spark.session import get_spark  # noqa: E402


def run_variant(docs: DataFrame, variant: str) -> tuple[float, int]:
    t0 = time.time()
    sh = word_shingles(docs, "text", "doc_id", 3)
    if variant in ("both", "sh"):
        sh = sh.persist()
    sig = minhash_signature(sh)
    if variant == "both":
        sig = sig.persist()
    pairs = lsh_candidate_pairs(sig)
    verified = verify_jaccard(pairs, sh, sizes=sig.select("doc", F.col("n_sh").alias("n")))
    n = verified.filter(3 * F.col("n_common") >= 2 * F.col("n_union")).count()
    dt = time.time() - t0
    sh.unpersist()
    sig.unpersist()
    return dt, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark(app_name="bench-minhash-persist")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scaled = base
    for i in range(1, 10):
        scaled = scaled.unionByName(
            base.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                # shift text content too so the 10x copies are not pure
                # exact duplicates of each other (prefix token varies)
                F.concat(F.lit(f"v{i} "), F.col("text")).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    scales = {"sf0.1": base, "sf1x10": scaled}
    for scale, docs in scales.items():
        docs = docs.persist()
        docs.count()  # materialize the input once, outside the timings
        for variant in ("both", "none", "sh"):
            best = None
            for _ in range(repeats):
                dt, n = run_variant(docs, variant)
                best = dt if best is None else min(best, dt)
            print(
                json.dumps(
                    {"scale": scale, "variant": variant, "sec": round(best, 2), "pairs": n}
                ),
                flush=True,
            )
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
