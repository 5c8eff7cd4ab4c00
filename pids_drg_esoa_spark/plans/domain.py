"""Domain functions under the oracle: planted round-trip checks.

The heavy domain parsers are golden-tested against the reference's
cases (tests/), but the native tiers can ALSO run under the driver's
DuckDB gate: synthesize domain-shaped strings from synthetic columns,
run the real parser in Spark, and have the oracle compute the
expected values directly from the planted inputs. The parser must
recover exactly what was planted — a self-checking oracle with no
duplicated regex on the DuckDB side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dose import normalize_dose_string, parse_dose, ratio_mg_per_ml, to_mg
from ..functions.text import normalize_basic, slug_id
from ..sources.tables import table
from .catalog import register


@register(
    "dom_dose_amount_roundtrip",
    oracle="""
    SELECT p_partkey,
           'amount'                      AS kind,
           CAST(p_size AS DOUBLE)        AS strength,
           'mg'                          AS unit,
           CAST(p_size AS DOUBLE)        AS strength_mg,
           CAST(p_size AS VARCHAR) || 'MG' AS dose_norm
    FROM part
    """,
)
def dom_dose_amount_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant '<p_size> mg tablet' into free text; the native dose
    parser (F9/F10/F16) must recover kind/strength/unit/mg and the
    canonical dose string. The oracle computes expectations straight
    from the planted integers."""
    p = table(spark, sf_dir, "part")
    text = F.concat(F.col("p_name"), F.lit(" "), F.col("p_size").cast("string"), F.lit(" mg tablet"))
    d = parse_dose(text)
    return p.select(
        "p_partkey",
        d["kind"].alias("kind"),
        d["strength"].alias("strength"),
        d["unit"].alias("unit"),
        to_mg(d["strength"], d["unit"]).alias("strength_mg"),
        normalize_dose_string(text).alias("dose_norm"),
    )


@register(
    "dom_dose_ratio_roundtrip",
    oracle="""
    SELECT p_partkey,
           'ratio'                     AS kind,
           CAST(p_size AS DOUBLE)      AS strength_mg,
           5.0                         AS per_val,
           'ml'                        AS per_unit,
           -- same arithmetic shape as the Spark plan: (mg/per)*1e6 —
           -- floor((a/b)*c) ≠ floor(a*c/b) at repr boundaries (8.2!)
           CAST(floor((CAST(p_size AS DOUBLE) / 5.0) * 1000000.0) AS BIGINT) AS mg_per_ml_micros
    FROM part
    """,
)
def dom_dose_ratio_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant '<p_size> mg / 5 ml syrup'; parser must produce the ratio
    struct and mg/mL (floor-micros so the division never hits
    engine-specific rounding)."""
    p = table(spark, sf_dir, "part")
    text = F.concat(F.col("p_size").cast("string"), F.lit(" mg / 5 ml syrup"))
    d = parse_dose(text)
    mg = to_mg(d["strength"], d["unit"])
    return p.select(
        "p_partkey",
        d["kind"].alias("kind"),
        mg.alias("strength_mg"),
        d["per_val"].alias("per_val"),
        d["per_unit"].alias("per_unit"),
        F.floor(ratio_mg_per_ml(mg, d["per_val"]) * 1000000).cast("bigint").alias("mg_per_ml_micros"),
    )


@register(
    "dom_normalize_slug_roundtrip",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                                   AS norm_basic,
           regexp_replace(lower(p_name), ' ', '_', 'g')    AS slug
    FROM part
    """,
)
def dom_normalize_slug_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """normalize_basic (F2) and slug_id (F4) on already-clean inputs
    must be identity-up-to-separator — the oracle states the expected
    form directly."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        normalize_basic("p_name").alias("norm_basic"),
        slug_id("p_name").alias("slug"),
    )


@register(
    "dom_pct_dose_roundtrip",
    oracle="""
    SELECT p_partkey,
           'percent'                     AS kind,
           CAST(p_size AS DOUBLE) / 10   AS pct
    FROM part
    """,
)
def dom_pct_dose_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant '<p_size/10> % solution' (one decimal place); percent
    parse must recover it. p_size/10 in both engines is the same
    double."""
    p = table(spark, sf_dir, "part")
    text = F.concat((F.col("p_size") / 10).cast("string"), F.lit(" % solution"))
    d = parse_dose(text)
    return p.select("p_partkey", d["kind"].alias("kind"), d["pct"].alias("pct"))
