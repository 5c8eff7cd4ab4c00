"""Labs pipeline: the minimum end-to-end slice (SURVEY §7 step 1).

Reference semantics (pipelines/labs/…):
- prepare (prepare_labs.py:13-14,27-48,71-72): require ITEM_NUMBER /
  ITEM_REF_CODE / DESCRIPTION; keep ITEM_REF_CODE ==
  'LaboratoryAndDiagnostic'; drop ITEM_NUMBER in [1540, 1896]; drop
  null/empty descriptions; dedupe (ITEM_NUMBER, DESCRIPTION); sort.
- match (match_labs.py:18-36,51-66,86-108 J11): normalize description
  (lower, non-alnum→space, collapse) → exact join against the labs
  master; misses fall back to the Diagnostics catalog; coalesce
  precedence master > diagnostics, with a match_source label.

Spark-first: the two catalogs broadcast (they are small dims); the
eSOA side never shuffles. The reference's first-wins dict semantics
(`setdefault`, match_labs.py:35 — SURVEY §7 order-dependence) becomes
an explicit min-key dedupe of the master per normalized description.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window as W

from ..functions.text import normalize_basic
from .base import BasePipeline, PipelineContext, register_pipeline

EXCLUDED_ITEM_RANGE = (1540, 1896)


def prepare_labs(esoa: DataFrame) -> DataFrame:
    required = {"ITEM_NUMBER", "ITEM_REF_CODE", "DESCRIPTION"}
    missing = required - set(esoa.columns)
    if missing:
        raise ValueError(f"labs input missing required columns: {sorted(missing)}")
    lo, hi = EXCLUDED_ITEM_RANGE
    return (
        esoa.filter(F.col("ITEM_REF_CODE") == "LaboratoryAndDiagnostic")
        # coalesce(False): a non-numeric/null ITEM_NUMBER casts to
        # NULL, and ~NULL-between would silently DROP the row — the
        # reference's pd.to_numeric(errors='coerce') mask KEEPS
        # non-numeric ids (prepare_labs.py:42-44); only the numbered
        # range is excluded
        # try_cast DOUBLE, not long: pd.to_numeric parses FLOAT and
        # scientific shapes ('1540.0', '1540.5', '1.6e3' → 1600) and
        # excludes them when the numeric value lands in [1540, 1896]
        # — a long cast NULLs them and kept them (labs fuzz seed 11)
        # try_cast: ANSI mode makes a plain cast THROW on 'LAB-001'
        .filter(
            ~F.coalesce(
                F.col("ITEM_NUMBER").try_cast("double").between(lo, hi), F.lit(False)
            )
        )
        .filter(F.col("DESCRIPTION").isNotNull() & (F.trim("DESCRIPTION") != ""))
        .dropDuplicates(["ITEM_NUMBER", "DESCRIPTION"])
    )


def _first_wins(df: DataFrame, key: str, order: str) -> DataFrame:
    """The reference's dict-setdefault first-wins (match_labs.py:29-36)
    keeps the FIRST FILE ROW per normalized key. When the dim carries a
    `_row_order` column (file position — the labs dims are
    driver-readable small catalogs, so attaching it is exact), the
    engine matches that rule verbatim; otherwise it falls back to the
    deterministic min-key survivor (labs fuzz seed 11: with shuffled
    master file order the two rules pick different survivors — the
    file order IS an input property, not nondeterminism)."""
    order_col = "_row_order" if "_row_order" in df.columns else order
    w = W.partitionBy(key).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", *(["_row_order"] if "_row_order" in df.columns else []))
    )


def match_labs(esoa_prepared: DataFrame, master: DataFrame, diagnostics: DataFrame) -> DataFrame:
    """Two-level lookup with coalesce precedence (J11)."""
    e = esoa_prepared.withColumn("desc_norm", normalize_basic("DESCRIPTION"))

    m = _first_wins(
        master.select(
            normalize_basic("DESCRIPTION").alias("desc_norm"),
            F.col("ITEM_NUMBER").alias("master_item_number"),
            F.col("DESCRIPTION").alias("master_description"),
            F.col("IS_OFFICIAL").alias("master_is_official"),
            *(["_row_order"] if "_row_order" in master.columns else []),
        ),
        "desc_norm",
        "master_item_number",
    )
    # full diagnostics passthrough (reference output carries
    # diagnostics_cat/spec/etc/misc, match_labs.py:100-107); columns
    # are optional so thin fixtures still work
    diag_extra = [c for c in ("cat", "spec", "etc", "misc") if c in diagnostics.columns]
    d = _first_wins(
        diagnostics.select(
            normalize_basic("desc").alias("desc_norm"),
            F.col("code").alias("diag_code"),
            F.col("desc").alias("diag_description"),
            *[F.col(c).alias(f"diag_{c}") for c in diag_extra],
            *(["_row_order"] if "_row_order" in diagnostics.columns else []),
        ),
        "desc_norm",
        "diag_code",
    )
    out = e.join(F.broadcast(m), "desc_norm", "left").join(
        F.broadcast(d), "desc_norm", "left"
    )
    # reference contract (match_labs.py:86-108 — an `elif`): the
    # diagnostics fields are populated ONLY when the master did NOT
    # match; a name present in both catalogs reports master fields
    # with NULL diagnostics fields, not both (labs differential)
    for c in ["diag_code", "diag_description", *[f"diag_{x}" for x in diag_extra]]:
        out = out.withColumn(
            c, F.when(F.col("master_description").isNull(), F.col(c))
        )
    return (
        out
        .withColumn(
            "matched_description",
            F.coalesce("master_description", "diag_description"),
        )
        # the reference's name for the coalesced output column
        # (match_labs.py:73 standard_description, falling back to the
        # input description when unmatched)
        .withColumn(
            "standard_description",
            F.coalesce("master_description", "diag_description", "DESCRIPTION"),
        )
        .withColumn(
            "match_source",
            F.when(F.col("master_description").isNotNull(), "labs_master")
            .when(F.col("diag_description").isNotNull(), "diagnostics")
            .otherwise("unmatched"),
        )
        .orderBy(F.col("ITEM_NUMBER").try_cast("long"), F.col("ITEM_NUMBER"))
    )


def coverage_metrics(matched: DataFrame) -> DataFrame:
    """A7: counts + percentages per match source."""
    total = F.sum(F.lit(1)).alias("n_total")
    return matched.agg(
        total,
        F.sum(F.when(F.col("match_source") == "labs_master", 1).otherwise(0)).alias("n_master"),
        F.sum(F.when(F.col("match_source") == "diagnostics", 1).otherwise(0)).alias("n_diag"),
        F.sum(F.when(F.col("match_source") == "unmatched", 1).otherwise(0)).alias("n_unmatched"),
    )


@register_pipeline
class LabsPipeline(BasePipeline):
    item_ref_code = "LaboratoryAndDiagnostic"

    def prepare_inputs(self, ctx: PipelineContext) -> None:
        ctx.artifacts["esoa_prepared"] = prepare_labs(ctx.inputs["esoa"])

    def match(self, ctx: PipelineContext) -> None:
        ctx.artifacts["esoa_matched_labs"] = match_labs(
            ctx.artifacts["esoa_prepared"], ctx.inputs["labs_master"], ctx.inputs["diagnostics"]
        )

    def post_run(self, ctx: PipelineContext) -> None:
        ctx.artifacts["metrics"] = coverage_metrics(ctx.artifacts["esoa_matched_labs"])
