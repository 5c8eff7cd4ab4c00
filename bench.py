"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is timed end-to-end (plan + execute); the terminal action
is a count-style reduction so results never land on the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pids_drg_esoa_spark.plans.catalog import all_specs
    from pids_drg_esoa_spark.session import get_spark

    spark = get_spark(app_name="bench")
    specs = all_specs()

    # Headline set: one per operator family, heaviest variants.
    headline = [n for n in (
        "tpch_q1_pricing_summary",
        "j1_left_join_fact_dim",
        "j3_broadcast_dim_chain",
        "w5_topn_per_key",
        "w_running_sum",
        "a5_dedup_deterministic",
        "t_asof_join_latest_order",
        "t_sessionize",
        "j9_j10_candidate_bridge",
        "dedup_minhash_lsh_pairs",
        "dedup_simhash_fingerprints",
        "ann_cosine_topk",
        "ann_ivf_kmeans_topk",
        "text_quality_scores",
        "mm_image_decode_stub",
        "dedup_span_exact",
        "text_repetition_signals",
        "t_interval_join_binned",
        "semantic_dedup_semdedup",
        "tagger_w1_rank_headline",
    ) if n in specs]

    # Warm the JVM/codegen path once so timings measure the plan, not startup.
    specs["tpch_q1_pricing_summary"].fn(spark, sf_dir).count()

    # Single-shot local timings carry ~±30% noise (SCALE.md); run each
    # query twice and record both the first (cold, comparable to prior
    # rounds) and the second (warm — OS page cache + codegen cache hot,
    # the number to compare round-over-round for real plan deltas).
    timings: dict[str, float] = {}
    timings_warm: dict[str, float] = {}
    for name in headline:
        t0 = time.time()
        n_rows = specs[name].fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        assert n_rows >= 0
        t0 = time.time()
        specs[name].fn(spark, sf_dir).count()
        timings_warm[name] = round(time.time() - t0, 3)

    # best-of-2 (min of the two runs) — the flakiness guard: cold
    # numbers whipsaw ±30% on page-cache state, so round-over-round
    # comparisons should read cold/best/warm together.
    timings_best = {n: min(timings[n], timings_warm[n]) for n in timings}
    total = round(sum(timings.values()), 3)
    total_warm = round(sum(timings_warm.values()), 3)
    total_best = round(sum(timings_best.values()), 3)
    # round-over-round continuity: the 19 queries present since r8
    # (movers diagnosed on this subtotal, not on totals that change
    # when headlines are added)
    new_since_r8 = {"tagger_w1_rank_headline"}
    cont = [n for n in timings if n not in new_since_r8]
    cont_cold = round(sum(timings[n] for n in cont), 3)
    cont_warm = round(sum(timings_warm[n] for n in cont), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # verbose detail goes to STDERR (humans, SCALE.md) — the contract
    # is ONE JSON line on stdout
    print(
        json.dumps(
            {
                "metric": "headline_queries_detail",
                "queries_warm": timings_warm,
                "queries_best": timings_best,
            }
        ),
        file=sys.stderr,
    )
    # compact canonical line LAST — the driver records the final ~2000
    # chars of output, and r9's single verbose line outgrew that
    # window ("parsed": null); this one is self-sufficient and small
    compact = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "value_warm": total_warm,
        "value_best": total_best,
        "continuity_19_cold": cont_cold,
        "continuity_19_warm": cont_warm,
        "sf": float(sf) if sf else None,
    }
    line = json.dumps(compact)
    if len(line) > 1900:  # keep the canonical line inside the capture
        compact["queries"] = {"truncated": "see headline_queries_detail line"}
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
