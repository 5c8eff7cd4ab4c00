"""A/B harness: text_repetition_signals shipped (explode + 2 shuffles
+ 2 joins) vs a per-doc native rewrite (array_sort + aggregate fold,
ZERO exchanges).

Verifies row-identity first (full collect compare at the given SF),
then times both shapes noop-style (count of a select *) over N runs.
Also builds a x`--mult` synthetic corpus (docs cloned with fresh ids)
to see the gap at scale where the shuffles start to matter.

Usage: python scripts/bench_repetition_variants.py [--mult 20] [--runs 5]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def native_repetition(d: DataFrame) -> DataFrame:
    """Per-doc rewrite: gram arrays via transform, run-length stats via
    array_sort + aggregate fold. No explode, no shuffle, no join."""
    toks = F.split("text", " ")

    def gram_arr(n: int):
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def run_stats(arr):
        """(top, dup) over the sorted gram array: top = longest run,
        dup = positions in runs of length >= 2 (== sum of counts >= 2)."""
        sorted_arr = F.array_sort(arr)
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("top"),
            F.lit(0).cast("long").alias("dup"),
        )

        def merge(acc, x):
            run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["top"], run).alias("top"),
                (
                    acc["dup"]
                    + F.when(run == 2, 2).when(run > 2, 1).otherwise(0)
                ).cast("long").alias("dup"),
            )

        return F.aggregate(sorted_arr, init, merge)

    g2 = gram_arr(2)
    g3 = gram_arr(3)
    s2 = run_stats(g2)
    s3 = run_stats(g3)
    n2 = F.size(g2).cast("bigint")
    n3 = F.size(g3).cast("bigint")

    def micros(num, den):
        return F.when(den > 0, F.floor(num * 1000000.0 / den)).otherwise(
            F.lit(0)
        ).cast("bigint")

    return d.select(
        "doc_id",
        n2.alias("n_2grams"),
        micros(s2["top"], n2).alias("top_2gram_frac_micros"),
        micros(s2["dup"], n2).alias("dup_2gram_frac_micros"),
        micros(s3["top"], n3).alias("top_3gram_frac_micros"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=20)
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    from pids_drg_esoa_spark.operators.textstats import text_repetition_signals
    from pids_drg_esoa_spark.session import get_spark
    from pids_drg_esoa_spark.sources.tables import table

    spark = get_spark(app_name="rep-ab", ui=False)
    d = table(spark, args.sf_dir, "documents")

    shipped = text_repetition_signals(spark, args.sf_dir)
    native = native_repetition(d)

    a = {tuple(r) for r in shipped.collect()}
    b = {tuple(r) for r in native.collect()}
    only_a, only_b = a - b, b - a
    print(f"row-identity: shipped {len(a)} rows, native {len(b)} rows, "
          f"diff {len(only_a)}/{len(only_b)}")
    if only_a or only_b:
        print("  shipped-only sample:", sorted(only_a)[:5])
        print("  native-only sample:", sorted(only_b)[:5])
        sys.exit(1)

    big = d.select("doc_id", "text")
    for i in range(args.mult - 1):
        big = big.unionByName(
            d.select((F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"), "text")
        )
    big = big.localCheckpoint()  # freeze: both variants read the same leaf
    n_big = big.count()
    print(f"synthetic corpus: {n_big} docs")

    def run_fn(make, src):
        df = make(src)
        df.write.format("noop").mode("overwrite").save()

    from pids_drg_esoa_spark.operators.textstats import (
        text_repetition_signals as _unused,  # noqa: F401
    )

    # shipped shape over the big corpus: re-express inline (the catalog fn
    # reads from sf_dir) — same plan as textstats.text_repetition_signals.
    def shipped_big(src: DataFrame) -> DataFrame:
        toks = F.split("text", " ")

        def gram_stats(n: int, with_dup: bool):
            idx = F.when(
                F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
            ).otherwise(F.array().cast("array<int>"))
            gram = F.concat_ws(
                " ", *[F.element_at("tk", F.col("i") + j) for j in range(n)]
            )
            counts = (
                src.select("doc_id", F.explode(idx).alias("i"), toks.alias("tk"))
                .select("doc_id", gram.alias("gram"))
                .groupBy("doc_id", "gram")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            aggs = [F.max("c").alias(f"top{n}"), F.sum("c").cast("bigint").alias(f"n{n}")]
            if with_dup:
                aggs.append(
                    F.coalesce(F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0))
                    .cast("bigint").alias(f"dup{n}")
                )
            return counts.groupBy("doc_id").agg(*aggs)

        s2 = gram_stats(2, True)
        s3 = gram_stats(3, False)
        micros = lambda num, den: F.coalesce(  # noqa: E731
            F.floor(num * 1000000.0 / den), F.lit(0)
        ).cast("bigint")
        return (
            src.join(s2, "doc_id", "left")
            .join(s3, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n2", F.lit(0)).cast("bigint").alias("n_2grams"),
                micros(F.col("top2"), F.col("n2")).alias("top_2gram_frac_micros"),
                micros(F.col("dup2"), F.col("n2")).alias("dup_2gram_frac_micros"),
                micros(F.col("top3"), F.col("n3")).alias("top_3gram_frac_micros"),
            )
        )

    def onepass_big(src: DataFrame) -> DataFrame:
        """Variant B: ONE explode carries both gram sizes (tagged rows),
        one groupBy(doc, n, gram), one conditional re-agg, one join back
        — halves the corpus passes and the exchanges, stays codegen'd."""
        toks = F.split("text", " ")
        idx2 = F.when(
            F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
        ).otherwise(F.array().cast("array<int>"))
        g2 = F.concat_ws(
            " ", F.element_at("tk", F.col("i")), F.element_at("tk", F.col("i") + 1)
        )
        g3 = F.when(
            F.col("i") <= F.size("tk") - 2,
            F.concat_ws(
                " ",
                F.element_at("tk", F.col("i")),
                F.element_at("tk", F.col("i") + 1),
                F.element_at("tk", F.col("i") + 2),
            ),
        )
        both = (
            src.select("doc_id", F.explode(idx2).alias("i"), toks.alias("tk"))
            .select(
                "doc_id",
                F.explode(
                    F.array(
                        F.struct(F.lit(2).alias("n"), g2.alias("gram")),
                        F.struct(F.lit(3).alias("n"), g3.alias("gram")),
                    )
                ).alias("t"),
            )
            .select("doc_id", F.col("t.n").alias("n"), F.col("t.gram").alias("gram"))
            .filter(F.col("gram").isNotNull())
        )
        counts = both.groupBy("doc_id", "n", "gram").agg(F.count(F.lit(1)).alias("c"))
        is2, is3 = F.col("n") == 2, F.col("n") == 3
        s = counts.groupBy("doc_id").agg(
            F.max(F.when(is2, F.col("c"))).alias("top2"),
            F.sum(F.when(is2, F.col("c"))).cast("bigint").alias("n2"),
            F.coalesce(
                F.sum(F.when(is2 & (F.col("c") >= 2), F.col("c"))), F.lit(0)
            ).cast("bigint").alias("dup2"),
            F.max(F.when(is3, F.col("c"))).alias("top3"),
            F.sum(F.when(is3, F.col("c"))).cast("bigint").alias("n3"),
        )
        micros = lambda num, den: F.coalesce(  # noqa: E731
            F.floor(num * 1000000.0 / den), F.lit(0)
        ).cast("bigint")
        return src.join(s, "doc_id", "left").select(
            "doc_id",
            F.coalesce("n2", F.lit(0)).cast("bigint").alias("n_2grams"),
            micros(F.col("top2"), F.col("n2")).alias("top_2gram_frac_micros"),
            micros(F.col("dup2"), F.col("n2")).alias("dup_2gram_frac_micros"),
            micros(F.col("top3"), F.col("n3")).alias("top_3gram_frac_micros"),
        )

    # big-corpus row identity too (cheap enough)
    xa = {tuple(r) for r in shipped_big(big).collect()}
    xb = {tuple(r) for r in native_repetition(big).collect()}
    xc = {tuple(r) for r in onepass_big(big).collect()}
    print(f"big row-identity: {len(xa)} vs {len(xb)} vs onepass {len(xc)}, "
          f"diff {len(xa-xb)}/{len(xb-xa)} onepass {len(xa-xc)}/{len(xc-xa)}")
    if xa != xb or xa != xc:
        sys.exit(1)

    for label, make in (
        ("shipped", shipped_big), ("native", native_repetition), ("onepass", onepass_big)
    ):
        walls = []
        for _ in range(args.runs):
            t0 = time.time()
            run_fn(make, big)
            walls.append(round(time.time() - t0, 3))
        print(f"{label:8s} x{args.mult}: {walls}  min={min(walls)}")

    spark.stop()


if __name__ == "__main__":
    main()
