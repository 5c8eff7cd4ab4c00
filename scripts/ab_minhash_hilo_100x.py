"""A/B for the minhash signature aggregation at NxSF0.1 distinct scale
(r13 carried item #2 / r14 VERDICT #4): the shipped md5-hex-string
min() (SortAggregate pair — immutable string buffers) vs a hi/lo
decimal(20,0) two-pass decomposition (HashAggregate everywhere, plus
one extra join-back shuffle of the full shingle relation).

The hi/lo shape computes the IDENTICAL 8 hex signatures: a 32-char md5
is two 16-hex-digit unsigned 64-bit halves; lexicographic hex min ==
numeric 128-bit min == (min hi, then min lo among rows attaining min
hi). Equality is verified exactly (full anti-join both ways) at
mult=1 before timing; each timed variant runs noop-sink so the sink
never pollutes the comparison (guide §1.4).

Usage: python scripts/ab_minhash_hilo_100x.py [mult] [rounds]
Prints one JSON line with per-variant walls.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402

N_HASHES = 8


def corpus(spark, mult: int) -> DataFrame:
    from pids_drg_esoa_spark.sources.tables import table

    base = table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
    # stride from max(doc_id)+1, not 10*n_base (r13 ADVICE #2: sparse
    # ids would collide across copies and plant phantom duplicates)
    stride = base.agg(F.max("doc_id")).first()[0] + 1
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    tag = F.concat(F.lit("_c"), F.col("copy").cast("string"))
    return (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * stride).alias("doc_id"),
            F.array_join(
                F.transform(F.split("text", " "), lambda w: F.concat(w, tag)), " "
            ).alias("text"),
        )
        .persist()
    )


def sig_str(sh: DataFrame) -> DataFrame:
    """Shipped shape (operators/dedup.minhash_signature)."""
    aggs = [
        F.expr(f"min(md5(concat('{h}|', sh))) AS m{h}") for h in range(N_HASHES)
    ] + [F.count(F.lit(1)).alias("n_sh")]
    return sh.groupBy("doc").agg(*aggs)


def sig_hilo(sh: DataFrame) -> DataFrame:
    """hi/lo two-pass: all-HashAggregate, one extra shingle join."""
    # md5 once per seed in its own projection, halves split from the
    # named column — two md5-bearing expressions per seed would hash
    # every shingle twice (no CSE across independent select items)
    hexes = sh.select(
        "doc",
        *[F.expr(f"md5(concat('{h}|', sh)) AS h{h}") for h in range(N_HASHES)],
    )
    halves = hexes.select(
        "doc",
        *[
            F.expr(
                f"cast(conv(substring(h{h}, 1, 16), 16, 10) as decimal(20,0)) AS hi{h}"
            )
            for h in range(N_HASHES)
        ],
        *[
            F.expr(
                f"cast(conv(substring(h{h}, 17, 16), 16, 10) as decimal(20,0)) AS lo{h}"
            )
            for h in range(N_HASHES)
        ],
    )
    a1 = halves.groupBy("doc").agg(
        *[F.min(f"hi{h}").alias(f"minhi{h}") for h in range(N_HASHES)],
        F.count(F.lit(1)).alias("n_sh"),
    )
    a2 = (
        halves.join(a1, "doc")
        .groupBy("doc")
        .agg(
            *[
                F.min(
                    F.when(F.col(f"hi{h}") == F.col(f"minhi{h}"), F.col(f"lo{h}"))
                ).alias(f"minlo{h}")
                for h in range(N_HASHES)
            ],
            F.first("n_sh").alias("n_sh"),
        )
    )
    hexcol = lambda c: F.lpad(F.lower(F.conv(F.col(c).cast("string"), 10, 16)), 16, "0")  # noqa: E731
    return a2.join(
        a1.select("doc", *[f"minhi{h}" for h in range(N_HASHES)]), "doc"
    ).select(
        "doc",
        *[
            F.concat(hexcol(f"minhi{h}"), hexcol(f"minlo{h}")).alias(f"m{h}")
            for h in range(N_HASHES)
        ],
        "n_sh",
    )


def noop(df: DataFrame) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    from pids_drg_esoa_spark.operators.dedup import word_shingles
    from pids_drg_esoa_spark.session import get_spark

    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab-hilo", ui=False)

    # exact-equality pin at mult=1 (order-insensitive full compare)
    d1 = corpus(spark, 1)
    sh1 = word_shingles(d1, "text", "doc_id", 3).persist()
    a, b = sig_str(sh1), sig_hilo(sh1)
    cols = a.columns
    diff = a.select(cols).exceptAll(b.select(cols)).count() + b.select(cols).exceptAll(
        a.select(cols)
    ).count()
    assert diff == 0, f"hi/lo signatures differ from shipped: {diff} rows"
    sh1.unpersist(); d1.unpersist()

    docs = corpus(spark, mult)
    n_docs = docs.count()
    sh = word_shingles(docs, "text", "doc_id", 3).persist()
    n_sh = sh.count()  # materialize so both variants read a hot cache
    walls = {"str": [], "hilo": []}
    for _ in range(rounds):
        walls["str"].append(noop(sig_str(sh)))
        walls["hilo"].append(noop(sig_hilo(sh)))
    print(json.dumps({
        "mult": mult, "n_docs": n_docs, "n_shingle_rows": n_sh,
        "equality_diff_rows": diff,
        "walls_str": walls["str"], "min_str": min(walls["str"]),
        "walls_hilo": walls["hilo"], "min_hilo": min(walls["hilo"]),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
