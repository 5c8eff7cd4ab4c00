"""Phase-level wall attribution for the tagger fixed cost: build the
headline inputs, call tag_descriptions once, then force each persisted
intermediate in creation order, timing every step. The first count of
each relation pays exactly the work BETWEEN it and the previous
materialization, so the deltas attribute the warm wall to plan-build /
doc-enrich / probe-keys / fallback / tier-cascade / doc-inputs / W1.

Usage: python scripts/profile_tagger_phases.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def build_inputs(spark, sf_dir):
    from pids_drg_esoa_spark.pipelines.runner import flag_combination_atc
    from pids_drg_esoa_spark.sources.tables import table

    p = table(spark, sf_dir, "part")
    ks = p.select(F.col("p_partkey").alias("k")).distinct()
    k = F.col("k")
    m = k % 5
    gen = F.concat(F.lit("GEN"), k.cast("string"))
    # digit-free, POOL-BOUNDED combo names, in sync with the headline
    # query (r10 — see plans/domain2.tagger_w1_rank_headline)
    kp = k % 485
    ka = F.translate(kp.cast("string"), "0123456789", "ABCDEFGHIJ")
    gen4 = F.concat(F.lit("GEN"), ka)
    combo_name = F.concat(gen4, F.lit(" + ZPART"), ka)
    esoa = ks.select(
        F.when(m == 4, F.concat(combo_name, F.lit(" "), ((k % 89) + 1).cast("string"), F.lit(" MG")))
        .otherwise(F.concat(gen, F.lit(" 500 MG TABLET")))
        .alias("raw_text")
    )
    generics = ks.select(
        F.when(m == 4, combo_name).otherwise(gen).alias("generic_name"),
        F.when(m == 4, F.concat(F.lit("DB"), kp.cast("string")))
        .otherwise(F.concat(F.lit("DB"), k.cast("string"))).alias("drugbank_id"),
    ).distinct()
    components = ks.filter(m == 4).select(
        gen4.alias("generic_name"),
        F.concat(F.lit("DBS"), kp.cast("string")).alias("drugbank_id"),
    ).union(ks.filter(m == 4).select(
        F.concat(F.lit("ZPART"), ka).alias("generic_name"),
        F.concat(F.lit("DBZ"), kp.cast("string")).alias("drugbank_id"),
    )).distinct()
    generics = generics.union(components)
    cname = F.when(m == 4, combo_name).otherwise(gen).alias("generic_name")
    atc = None
    for cond, code in (
        (m == 0, "N02BE01"), (m == 0, "J01CR02"),
        (m == 1, "J01CR02"),
        (m == 2, "C09AA"), (m == 2, "N02BE01"),
        (m == 4, "N02BE01"), (m == 4, "J01CR02"),
    ):
        leg = ks.filter(cond).select(cname, F.lit(code).alias("atc_code")).distinct()
        atc = leg if atc is None else atc.union(leg)
    return esoa, generics, flag_combination_atc(atc)


def main() -> None:
    import os

    from pids_drg_esoa_spark.plans.tagger import tag_descriptions
    from pids_drg_esoa_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="prof_phases", ui=True)
    esoa, generics, atc = build_inputs(spark, sf_dir)

    def one_pass(label: str) -> None:
        t0 = time.time()
        tagged = tag_descriptions(esoa, generics, atc)
        t_build = time.time() - t0
        steps = [("build(dims+collects+docs ckpt+keys.count)", t_build)]
        for i, r in enumerate(tagged.persisted_intermediates):
            t0 = time.time()
            n = r.count()
            steps.append((f"intermediate[{i}] rows={n} cols={r.columns[:4]}", time.time() - t0))
        t0 = time.time()
        n = tagged.count()
        steps.append((f"final tagged rows={n}", time.time() - t0))
        total = sum(s[1] for s in steps)
        print(f"--- {label}: total {total:.2f}s")
        for name, dt in steps:
            print(f"  {dt:6.2f}s  {name}")
        for r in tagged.persisted_intermediates:
            r.unpersist()

    one_pass("cold")
    one_pass("warm")
    one_pass("warm2")
    spark.stop()


if __name__ == "__main__":
    main()
