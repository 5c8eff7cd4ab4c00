"""CLI entry: dispatch a registered pipeline on ITEM_REF_CODE.

Reference shape (main.py:115-140 → registry → BasePipeline.run,
SURVEY §3.1): `_cli` parses args, resolves input/output dirs per
ITEM_REF_CODE slug, and runs the registered pipeline.

    python -m pids_drg_esoa_spark.cli --item-ref-code DrugsAndMedicine \
        --inputs-dir ./inputs --output-dir ./out
"""

from __future__ import annotations

import argparse
import os

from .pipelines.base import PipelineContext, get_pipeline, slugify_item_ref_code
from .session import get_spark
from .sources.readers import read_table_prefer_parquet
from .sources.writers import write_parquet

# input table stems each pipeline expects under <inputs-dir>/<slug>/
PIPELINE_INPUTS: dict[str, tuple[str, ...]] = {
    "DrugsAndMedicine": (
        "esoa", "pnf", "drugbank_generics", "drugbank_atc", "drugbank_brands",
        "fda_brands", "who_atc", "mixtures",
    ),
    "LaboratoryAndDiagnostic": ("esoa", "labs_master", "diagnostics"),
}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--item-ref-code", required=True)
    ap.add_argument("--inputs-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    slug = slugify_item_ref_code(args.item_ref_code)
    spark = get_spark(app_name=f"pids-drg-esoa-{slug}", cpus=args.cpus)
    base = os.path.join(args.inputs_dir, slug)
    inputs = {
        stem: read_table_prefer_parquet(spark, os.path.join(base, stem))
        for stem in PIPELINE_INPUTS[args.item_ref_code]
    }
    pipe = get_pipeline(args.item_ref_code)
    ctx = PipelineContext(spark=spark, inputs=inputs)
    timings: dict[str, float] = {}
    pipe.run(ctx, timing_hook=lambda n, s: timings.__setitem__(n, round(s, 2)))

    out_base = os.path.join(args.output_dir, slug)
    for name, df in ctx.artifacts.items():
        write_parquet(df, os.path.join(out_base, name))
    print(f"wrote {sorted(ctx.artifacts)} to {out_base}; stage seconds {timings}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
