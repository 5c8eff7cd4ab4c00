"""Streaming growing-index near-dup ≡ batch LSH equivalence fuzz.

Property: stream a corpus through `stream_neardup_against_index`
(static index + grown tail) in K random part files, and the UNION of
per-trigger outputs must equal the one-shot batch
`minhash_verified_pairs` over the FULL corpus, minus exactly the two
pair classes the streaming contract excludes by design:
  - pairs entirely inside the pre-built index (never probed), and
  - pairs inside one part (the probe excludes the current batch's own
    rows — retry-idempotence), with metrics (n_common, n_union)
    matching cell-for-cell.

Corpus: synthetic near-dup families (token-perturbed copies crossing
the 2/3 Jaccard threshold both ways) + singletons, split at random
into index and arrival parts.

Usage: python scripts/fuzz_streaming_neardup_equivalence.py [n_docs] [seeds...]
Exit 0 iff 0 discrepancies across all seeds.
"""

from __future__ import annotations

import os
import random
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402

WORDS = [f"w{i:03d}" for i in range(400)]


def make_corpus(rng: random.Random, n: int) -> list[tuple[str, str]]:
    docs: list[tuple[str, str]] = []
    i = 0
    while len(docs) < n:
        base = [rng.choice(WORDS) for _ in range(rng.randint(6, 16))]
        docs.append((f"D{i:05d}", " ".join(base)))
        i += 1
        # near-dup family: perturb 0-2 tokens (mostly above threshold)
        for _ in range(rng.choice([0, 0, 1, 1, 2, 3])):
            if len(docs) >= n:
                break
            v = list(base)
            for _ in range(rng.choice([0, 1, 1, 2])):
                v[rng.randrange(len(v))] = rng.choice(WORDS)
            docs.append((f"D{i:05d}", " ".join(v)))
            i += 1
    return docs


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    seeds = [int(s) for s in sys.argv[2:]] or [3, 58, 777]

    from pyspark.sql import functions as F  # noqa: F401

    from pids_drg_esoa_spark.operators.dedup import minhash_verified_pairs
    from pids_drg_esoa_spark.session import get_spark
    from pids_drg_esoa_spark.streaming.incremental import (
        stream_neardup_against_index,
    )

    spark = get_spark(app_name="fuzz_stream_neardup")
    spark.sparkContext.setLogLevel("ERROR")

    total_bad = 0
    for seed in seeds:
        rng = random.Random(seed)
        docs = make_corpus(rng, n)
        rng.shuffle(docs)
        n_index = rng.randint(n // 4, n // 2)
        index_docs, stream_docs = docs[:n_index], docs[n_index:]
        k_parts = rng.randint(3, 8)
        bounds = sorted(rng.sample(range(1, len(stream_docs)), k_parts - 1))
        chunks = [stream_docs[a:b] for a, b in zip([0] + bounds, bounds + [len(stream_docs)])]
        part_of = {d: -1 for d, _ in index_docs}
        for pi, chunk in enumerate(chunks):
            for d, _ in chunk:
                part_of[d] = pi

        # --- batch truth over the FULL corpus
        full = spark.createDataFrame(pd.DataFrame(docs, columns=["ITEM_NUMBER", "DESCRIPTION"]))
        verified, caches = minhash_verified_pairs(
            full, text_col="DESCRIPTION", id_col="ITEM_NUMBER", n_docs=len(docs)
        )
        batch_pairs = {
            frozenset((r.doc_a, r.doc_b)): (r.n_common, r.n_union)
            for r in verified.collect()
        }
        for c in caches:
            c.unpersist()
        expected = {
            p: v for p, v in batch_pairs.items()
            if len({part_of[d] for d in p}) == 2  # different parts/index
            and max(part_of[d] for d in p) >= 0   # not both in the index
        }

        # --- streaming
        work = tempfile.mkdtemp(prefix=f"fuzz_neardup_{seed}_")
        src, out_dir, ckpt, grow = (
            os.path.join(work, d) for d in ("parts", "out", "ckpt", "grow")
        )
        os.makedirs(src)
        for i, chunk in enumerate(chunks):
            pd.DataFrame(chunk, columns=["ITEM_NUMBER", "DESCRIPTION"]).assign(
                ITEM_REF_CODE="x"
            )[["ITEM_NUMBER", "ITEM_REF_CODE", "DESCRIPTION"]].to_csv(
                os.path.join(src, f"part_{i}.csv"), index=False
            )
        idx_df = spark.createDataFrame(
            pd.DataFrame(index_docs, columns=["ITEM_NUMBER", "DESCRIPTION"])
        )
        q = stream_neardup_against_index(
            spark, src, idx_df, out_dir, ckpt, grow_index_dir=grow
        )
        q.awaitTermination()
        got = {
            frozenset((r.new_doc, r.index_doc)): (r.n_common, r.n_union)
            for r in spark.read.parquet(out_dir).collect()
        }
        for rel in q.neardup_index:
            rel.unpersist()

        bad = 0
        for p in sorted(expected.keys() - got.keys(), key=sorted):
            bad += 1
            print(f"  seed {seed}: pair {sorted(p)} in batch, MISSING from stream")
        for p in sorted(got.keys() - expected.keys(), key=sorted):
            bad += 1
            print(f"  seed {seed}: pair {sorted(p)} streamed, not in batch truth "
                  f"(parts {[part_of.get(d) for d in sorted(p)]})")
        for p in expected.keys() & got.keys():
            if expected[p] != got[p]:
                bad += 1
                print(f"  seed {seed}: pair {sorted(p)} metrics: "
                      f"batch {expected[p]} stream {got[p]}")
        print(f"seed {seed}: {len(docs)} docs ({n_index} index + {len(chunks)} parts), "
              f"batch pairs {len(batch_pairs)}, expected cross {len(expected)}, "
              f"streamed {len(got)}, {bad} discrepancies")
        total_bad += bad
        shutil.rmtree(work, ignore_errors=True)

    spark.stop()
    print(f"\nSTREAM-NEARDUP≡BATCH TOTAL discrepancies: {total_bad}")
    return 0 if total_bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
