"""Part 4: bridge tagged eSOA rows to Annex F drug codes.

Reference (runners.py:287-1425, SURVEY §3.2/§7 step 7): build a
multi-key Annex index (per component generic — J9), generate
candidates per eSOA row, evaluate strict typed compatibility
predicates (dose/form/route — J10), pick the best by a details
tie-break (W3), and label failures with a fixed priority
(runners.py:1337-1383 — dose ⊳ form ⊳ route ⊳ combined).

Spark-first: the Annex index is a small broadcast dim exploded by
component; candidate evaluation is a broadcast join + Arrow-batched
predicate UDFs (the typed dose-key logic is irreducibly Python —
F34); selection is a window rank-1 with every key explicit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.dosekey import DoseKey, dose_key_py, dose_keys_match_py
from ..functions.routes_forms import forms_are_equivalent_py, parse_form_py, parse_route_py
from ..functions.tokens import normalize_generic_combination_py

DOSE_KEY_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("values", T.ArrayType(T.DoubleType())),
    ]
)


@F.pandas_udf(DOSE_KEY_SCHEMA)
def dose_key(text: pd.Series) -> pd.DataFrame:
    keys = text.map(dose_key_py)
    return pd.DataFrame(
        {"kind": keys.map(lambda k: k.kind), "values": keys.map(lambda k: list(k.values))}
    )


@F.pandas_udf(T.BooleanType())
def dose_keys_match(ka: pd.Series, va: pd.Series, kb: pd.Series, vb: pd.Series) -> pd.Series:
    def as_tuple(v) -> tuple:
        return tuple(v) if v is not None else ()

    return pd.Series(
        [
            dose_keys_match_py(DoseKey(k1, as_tuple(v1)), DoseKey(k2, as_tuple(v2)))
            for k1, v1, k2, v2 in zip(ka, va, kb, vb)
        ]
    )


@F.pandas_udf(T.StringType())
def parse_form(text: pd.Series) -> pd.Series:
    return text.map(parse_form_py)


@F.pandas_udf(T.StringType())
def parse_route(text: pd.Series) -> pd.Series:
    return text.map(lambda t: parse_route_py(t)[0])


@F.pandas_udf(T.BooleanType())
def forms_compatible(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([forms_are_equivalent_py(x, y) for x, y in zip(a, b)])


def _annex_generic_py(desc: str | None) -> str:
    """Annex lookup names: the paren-stripped combination PLUS the
    combinations named inside parentheticals — the reference indexes
    per component, base-name-sans-parens, and synonyms
    (runners.py:1012-1094)."""
    if not desc:
        return ""
    import re as _re

    variants = [normalize_generic_combination_py(desc)]
    for m in _re.finditer(r"\(([^()]+)\)", desc):
        variants.append(normalize_generic_combination_py(m.group(1)))
    seen: list[str] = []
    for v in variants:
        for comp in v.split(" + "):
            if comp and comp not in seen:
                seen.append(comp)
    return " + ".join(seen)


@F.pandas_udf(T.StringType())
def annex_generic(desc: pd.Series) -> pd.Series:
    return desc.map(_annex_generic_py)


def build_annex_index(annex_f: DataFrame) -> DataFrame:
    """J9 index: one row per (component generic → drug code), with the
    parsed dose key / form / route of the Annex entry. Small dim —
    broadcast at the join site (replaces the reference's driver dicts,
    runners.py:1012-1094)."""
    parsed = annex_f.select(
        F.col("drug_code"),
        F.col("drug_description"),
        annex_generic(F.col("drug_description")).alias("annex_combo"),
        dose_key(F.col("drug_description")).alias("annex_dose"),
        parse_form(F.col("drug_description")).alias("annex_form"),
        parse_route(F.col("drug_description")).alias("annex_route"),
    )
    return parsed.withColumn(
        "component", F.explode(F.split(F.lower("annex_combo"), " \\+ "))
    ).filter(F.col("component") != "")


def bridge_to_drug_codes(tagged: DataFrame, annex_f: DataFrame) -> DataFrame:
    """tagged: output of plans.tagger (raw_text, generic_name, …).
    Returns one row per raw_text with (drug_code, match_reason)."""
    esoa = tagged.select(
        "raw_text",
        "generic_name",
        F.col("matched").alias("has_generic"),
        dose_key(F.col("raw_text")).alias("esoa_dose"),
        parse_form(F.col("raw_text")).alias("esoa_form"),
        parse_route(F.col("raw_text")).alias("esoa_route"),
        F.filter(
            F.split(F.lower(F.coalesce("generic_name", F.lit(""))), " \\+ "),
            lambda x: x != "",
        ).alias("components"),
    ).persist()  # reused by candidate gen AND the final left join
    index = F.broadcast(build_annex_index(annex_f))

    cand = (
        esoa.filter(F.col("has_generic"))
        .select("raw_text", "esoa_dose", "esoa_form", "esoa_route",
                F.explode("components").alias("component"))
        .join(index, "component")
        .distinct()
    )
    flagged = cand.select(
        "raw_text",
        "drug_code",
        dose_keys_match(
            F.col("esoa_dose.kind"), F.col("esoa_dose.values"),
            F.col("annex_dose.kind"), F.col("annex_dose.values"),
        ).alias("dose_ok"),
        forms_compatible("esoa_form", "annex_form").alias("form_ok"),
        (
            F.col("esoa_route").isNotNull()
            & (F.col("esoa_route") == F.col("annex_route"))
        ).alias("route_ok"),
        F.col("esoa_dose.kind").alias("esoa_dose_kind"),
    ).persist()  # reused by the valid-rank window and the flags rollup

    # W3: best fully-valid candidate; every tie-break key explicit.
    valid = flagged.filter(F.col("dose_ok") & F.col("form_ok"))
    w = W.partitionBy("raw_text").orderBy(
        F.desc("route_ok"), F.asc("drug_code")
    )
    best = (
        valid.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("raw_text", F.col("drug_code").alias("best_drug_code"), F.col("route_ok").alias("best_route_ok"))
    )

    flags = flagged.groupBy("raw_text").agg(
        F.max(F.when(F.col("dose_ok") & F.col("form_ok"), 1).otherwise(0)).alias("has_valid"),
        F.max(F.when(F.col("dose_ok"), 1).otherwise(0)).alias("has_dose_ok"),
        F.max(F.when(F.col("form_ok"), 1).otherwise(0)).alias("has_form_ok"),
        F.count(F.lit(1)).alias("n_cand"),
    )

    out = (
        esoa.join(flags, "raw_text", "left")
        .join(best, "raw_text", "left")
        .select(
            "raw_text",
            "generic_name",
            F.when(F.col("has_valid") == 1, F.col("best_drug_code")).alias("drug_code"),
            F.when(~F.col("has_generic"), "no_generic")
            .when(F.col("n_cand").isNull(), "generic_not_in_annex")
            .when(F.col("has_valid") == 1, "matched")
            .when(F.col("esoa_dose.kind") == "none", "no_dose_in_esoa")
            .when((F.col("has_form_ok") == 1) & (F.col("has_dose_ok") == 0), "dose_mismatch")
            .when(F.col("has_dose_ok") == 1, "form_mismatch")
            .otherwise("combined_mismatch")
            .alias("match_reason"),
        )
    )
    return out


def bridge_metrics(bridged: DataFrame) -> DataFrame:
    """run_summary reason histogram (A4/A7, run_drugs_all.py:52-117)."""
    return bridged.groupBy("match_reason").agg(F.count(F.lit(1)).alias("n")).orderBy(
        F.desc("n"), F.asc("match_reason")
    )
