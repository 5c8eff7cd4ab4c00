"""Dump ``.explain("formatted")`` for catalog queries to files.

Usage:
    python scripts/dump_plans.py <out_dir> [name ...]

With no names, dumps the bench.py headline set. Each query's plan goes
to ``<out_dir>/<name>.txt``. Used to commit the before/after plan
evidence for optimization rounds (plans/r13/).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = [
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
]


def main() -> int:
    out_dir = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from pids_drg_esoa_spark.plans.catalog import all_specs
    from pids_drg_esoa_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    specs = all_specs()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
