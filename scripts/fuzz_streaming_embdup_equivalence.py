"""Streaming growing-index EMBEDDING near-dup ≡ batch LSH equivalence
fuzz — the vector twin of fuzz_streaming_neardup_equivalence.

Property: stream unit-norm embedding parts through
`stream_embdup_against_index` (static index + grown parquet tail) and
the UNION of per-trigger outputs must equal one-shot
`near_dup_pairs_lsh` over the FULL corpus minus exactly the two
by-design exclusions (pairs inside the pre-built index; pairs inside
one part), with the integer dot_q matching cell-for-cell. Both sides
share quantize / sign_bucket / NEAR_DUP_DOT_MIN, so any drift is a
real contract break, not a tolerance artifact.

Corpus: clone-with-noise vector families (most above the 0.95-cosine
threshold, some straddling it) across a handful of labels.

Usage: python scripts/fuzz_streaming_embdup_equivalence.py [n_vecs] [seeds...]
Exit 0 iff 0 discrepancies across all seeds.
"""

from __future__ import annotations

import math
import os
import random
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pandas as pd  # noqa: E402

DIM = 16
LABELS = ["en", "fr", "de"]


def _unit(v: list[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def make_vectors(rng: random.Random, n: int) -> list[tuple[int, str, list[float]]]:
    out: list[tuple[int, str, list[float]]] = []
    i = 0
    while len(out) < n:
        base = _unit([rng.gauss(0, 1) for _ in range(DIM)])
        label = rng.choice(LABELS)
        out.append((i, label, base))
        i += 1
        for _ in range(rng.choice([0, 0, 1, 1, 2, 3])):
            if len(out) >= n:
                break
            # perturbation scale straddles the 0.95-cosine threshold
            eps = rng.choice([0.02, 0.05, 0.1, 0.2, 0.35])
            v = _unit([x + rng.gauss(0, eps) for x in base])
            out.append((i, label, v))
            i += 1
    return out


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    seeds = [int(s) for s in sys.argv[2:]] or [9, 62, 314]

    from pids_drg_esoa_spark.operators.similarity import near_dup_pairs_lsh
    from pids_drg_esoa_spark.session import get_spark
    from pids_drg_esoa_spark.streaming.incremental import (
        stream_embdup_against_index,
    )

    spark = get_spark(app_name="fuzz_stream_embdup")
    spark.sparkContext.setLogLevel("ERROR")

    total_bad = 0
    for seed in seeds:
        rng = random.Random(seed)
        vecs = make_vectors(rng, n)
        rng.shuffle(vecs)
        n_index = rng.randint(n // 4, n // 2)
        index_vecs, stream_vecs = vecs[:n_index], vecs[n_index:]
        k_parts = rng.randint(3, 8)
        bounds = sorted(rng.sample(range(1, len(stream_vecs)), k_parts - 1))
        chunks = [stream_vecs[a:b] for a, b in zip([0] + bounds, bounds + [len(stream_vecs)])]
        part_of = {vid: -1 for vid, _, _ in index_vecs}
        for pi, chunk in enumerate(chunks):
            for vid, _, _ in chunk:
                part_of[vid] = pi

        def _df(rows):
            return spark.createDataFrame(
                [(int(v), l, [float(x) for x in e]) for v, l, e in rows],
                "vec_id long, label string, embedding array<float>",
            )

        batch_pairs = {
            frozenset((r.vec_a, r.vec_b)): r.dot_q
            for r in near_dup_pairs_lsh(_df(vecs)).collect()
        }
        expected = {
            p: d for p, d in batch_pairs.items()
            if len({part_of[v] for v in p}) == 2
            and max(part_of[v] for v in p) >= 0
        }

        work = tempfile.mkdtemp(prefix=f"fuzz_embdup_{seed}_")
        src, out_dir, ckpt, grow = (
            os.path.join(work, d) for d in ("parts", "out", "ckpt", "grow")
        )
        os.makedirs(src)
        for i, chunk in enumerate(chunks):
            _df(chunk).coalesce(1).write.parquet(os.path.join(src, f"p{i}"))
            # streaming source reads a flat directory of parquet files
            d = os.path.join(src, f"p{i}")
            for f in os.listdir(d):
                if f.endswith(".parquet"):
                    shutil.move(os.path.join(d, f), os.path.join(src, f"part_{i}.parquet"))
            shutil.rmtree(d, ignore_errors=True)
        q = stream_embdup_against_index(
            spark, src, _df(index_vecs), out_dir, ckpt, grow_index_dir=grow
        )
        q.awaitTermination()
        got = {
            frozenset((r.new_vec, r.index_vec)): r.dot_q
            for r in spark.read.parquet(out_dir).collect()
        }
        for rel in q.embdup_index:
            rel.unpersist()

        bad = 0
        for p in sorted(expected.keys() - got.keys(), key=sorted):
            bad += 1
            print(f"  seed {seed}: pair {sorted(p)} in batch, MISSING from stream")
        for p in sorted(got.keys() - expected.keys(), key=sorted):
            bad += 1
            print(f"  seed {seed}: pair {sorted(p)} streamed, not in batch truth "
                  f"(parts {[part_of.get(v) for v in sorted(p)]})")
        for p in expected.keys() & got.keys():
            if expected[p] != got[p]:
                bad += 1
                print(f"  seed {seed}: pair {sorted(p)} dot_q: "
                      f"batch {expected[p]} stream {got[p]}")
        print(f"seed {seed}: {len(vecs)} vecs ({n_index} index + {len(chunks)} parts), "
              f"batch pairs {len(batch_pairs)}, expected cross {len(expected)}, "
              f"streamed {len(got)}, {bad} discrepancies")
        total_bad += bad
        shutil.rmtree(work, ignore_errors=True)

    spark.stop()
    print(f"\nSTREAM-EMBDUP≡BATCH TOTAL discrepancies: {total_bad}")
    return 0 if total_bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
