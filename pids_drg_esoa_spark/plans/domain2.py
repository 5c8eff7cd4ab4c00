"""Round-2 domain surface under the oracle: planted round-trips for
the F15 details extractor, the F34 dose-key cascade, F20 token
categorization, F23 combo-dose alignment, F29 singularization, and the
strict Part-4 bridge (dose∧form∧route gate + reason ladder).

Same self-checking-oracle pattern as plans/domain.py: synthesize
domain-shaped inputs from synthetic columns, run the REAL operators in
Spark, and have DuckDB compute the expected values straight from the
planted structure — the operator must recover exactly what was
planted, and the oracle never re-implements the parser."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.details import extract_drug_details
from ..functions.dosekey import format_combo_doses_py, parse_combo_doses_py
from ..functions.tokens import categorize_tokens_py
from ..sources.tables import table
from .bridge import bridge_to_drug_codes, parse_side
from .catalog import register
from .tagger import _singular_key


@register(
    "dom_details_extract_planted",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name)                                   AS generic_name,
           CASE WHEN p_partkey % 2 = 0 THEN 'MR' END       AS release_details,
           CASE WHEN p_partkey % 3 = 0 THEN 'SODIUM SALT' END AS salt_details,
           CAST(p_size AS DOUBLE)                          AS dose_value,
           'MG'                                            AS dose_unit
    FROM part
    """,
)
def dom_details_extract_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant '<name> <size> MG [MR] TABLET [( as SODIUM SALT)]'; the
    F15 extractor must recover the generic (dose/form tail stripped),
    the release modifier, the salt parenthetical, and the dose."""
    p = table(spark, sf_dir, "part")
    text = F.concat(
        F.col("p_name"),
        F.lit(" "),
        F.col("p_size").cast("string"),
        F.lit(" MG"),
        F.when(F.col("p_partkey") % 2 == 0, F.lit(" MR")).otherwise(F.lit("")),
        F.lit(" TABLET"),
        F.when(F.col("p_partkey") % 3 == 0, F.lit(" ( as SODIUM SALT)")).otherwise(F.lit("")),
    )
    d = extract_drug_details(text)
    return p.select(
        "p_partkey",
        d["generic_name"].alias("generic_name"),
        d["release_details"].alias("release_details"),
        d["salt_details"].alias("salt_details"),
        F.element_at(d["dose_values"], 1).alias("dose_value"),
        F.element_at(d["dose_units"], 1).alias("dose_unit"),
    )


@register(
    "dom_dosekey_planted",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_partkey % 4 = 3 THEN 'conc' ELSE 'mg' END AS kind,
           CASE WHEN p_partkey % 4 = 3 THEN NULL
                ELSE CAST(p_size AS DOUBLE) *
                     CASE WHEN p_partkey % 4 = 1 THEN 1000.0 ELSE 1.0 END
           END                                                   AS amount,
           CASE WHEN p_partkey % 4 = 3
                THEN CAST(p_size AS DOUBLE) / 5.0 END             AS conc,
           'TABLET'                                              AS form,
           'ORAL'                                                AS route
    FROM part
    """,
)
def dom_dosekey_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant '<size> MG|G TABLET' / '<size> MG/5 ML TABLET'; the F34
    key cascade must produce mg totals (unit-converted) or per-mL
    concentrations, and the form/route parse must canonicalize."""
    p = table(spark, sf_dir, "part")
    mod = F.col("p_partkey") % 4
    text = F.concat(
        F.col("p_size").cast("string"),
        F.when(mod == 1, F.lit(" G"))
        .when(mod == 3, F.lit(" MG/5 ML"))
        .otherwise(F.lit(" MG")),
        F.lit(" TABLET"),
    )
    parsed = parse_side(text, F.lit(None).cast("string"))
    return p.select(
        "p_partkey",
        parsed["dose"]["kind"].alias("kind"),
        parsed["dose"]["amount"].alias("amount"),
        parsed["dose"]["conc"].alias("conc"),
        parsed["form"].alias("form"),
        parsed["route"].alias("route"),
    )


_CAT_WORDS = ("zinc", "sulfate", "tablet", "oral", "mg", "10", "of", "**")
_CAT_EXPECTED = ("generic", "salt", "form", "route", "dose", "dose", "other", "other")


@F.pandas_udf(T.StringType())
def _category_of_single(word: pd.Series) -> pd.Series:
    def cat(w: str) -> str:
        cats = categorize_tokens_py([w])
        return next(k for k, v in cats.items() if v)

    return word.map(cat)


@register(
    "dom_categorize_planted",
    oracle=f"""
    SELECT p_partkey,
           CASE p_partkey % 8
                {' '.join(f"WHEN {i} THEN '{w}'" for i, w in enumerate(_CAT_WORDS))}
           END AS token,
           CASE p_partkey % 8
                {' '.join(f"WHEN {i} THEN '{c}'" for i, c in enumerate(_CAT_EXPECTED))}
           END AS category
    FROM part
    """,
)
def dom_categorize_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20: each planted token must land in its category (element-drug
    first-token rule puts 'zinc' under generic, not salt)."""
    p = table(spark, sf_dir, "part")
    mod = F.col("p_partkey") % 8
    token = F.lit(None).cast("string")
    for i, w in enumerate(_CAT_WORDS):
        token = F.when(mod == i, F.lit(w)).otherwise(token)
    return p.select(
        "p_partkey",
        token.alias("token"),
        _category_of_single(token).alias("category"),
    )


@F.pandas_udf(T.StringType())
def _combo_align(text: pd.Series) -> pd.Series:
    return text.map(
        lambda t: format_combo_doses_py(
            ["ALPHA", "BETA"], parse_combo_doses_py(t, ["ALPHA", "BETA"])
        )
    )


@register(
    "dom_combo_align_planted",
    oracle="""
    SELECT p_partkey,
           'ALPHA ' || CAST(p_size AS VARCHAR) || 'MG|BETA '
                    || CAST(p_size + 5 AS VARCHAR) || 'MG' AS aligned
    FROM part
    """,
)
def dom_combo_align_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F23: 'ALPHA + BETA aMG/bMG' aligns dose i with generic i."""
    p = table(spark, sf_dir, "part")
    text = F.concat(
        F.lit("ALPHA + BETA "),
        F.col("p_size").cast("string"),
        F.lit("MG/"),
        (F.col("p_size") + 5).cast("string"),
        F.lit("MG"),
    )
    return p.select("p_partkey", _combo_align(text).alias("aligned"))


@register(
    "dom_singularize_planted",
    oracle="""
    SELECT p_partkey, word,
           CASE
             WHEN word LIKE '%ies'
               THEN substr(word, 1, length(word) - 3) || 'y'
             WHEN word LIKE '%es' AND length(word) > 3
                  AND substr(word, length(word) - 2, 1) IN ('s','x','z','h')
               THEN substr(word, 1, length(word) - 2)
             WHEN word LIKE '%es' AND length(word) > 3
               THEN substr(word, 1, length(word) - 1)
             WHEN word LIKE '%s' AND word NOT LIKE '%ss'
               THEN substr(word, 1, length(word) - 1)
             ELSE word
           END AS singular
    FROM (SELECT p_partkey, split_part(p_name, ' ', 1) AS word FROM part)
    """,
)
def dom_singularize_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F29 native singularizer vs the rule spelled out in SQL."""
    p = table(spark, sf_dir, "part")
    word = F.element_at(F.split("p_name", " "), 1)
    return p.select(
        "p_partkey", word.alias("word"), _singular_key(word).alias("singular")
    )


_P4_ORACLE = """
WITH ks AS (SELECT DISTINCT p_partkey % 55 AS k FROM part)
SELECT
  CASE
    WHEN k < 30 THEN 'GEN' || k || ' ' || (100 + 10*k) || ' MG TABLET'
    WHEN k < 35 THEN 'GEN' || k || ' 500 MG IV'
    WHEN k < 40 THEN 'GEN' || k || ' 500 MG CREAM'
    WHEN k < 45 THEN 'GEN' || k || ' 500 MG TABLET'
    WHEN k < 50 THEN 'GEN' || k || ' TABLET'
    ELSE 'UNTAGGED ' || k
  END AS raw_text,
  CASE WHEN k < 50 THEN 'GEN' || k END AS generic_name,
  CASE WHEN k < 30 AND k % 3 = 0 THEN 'D' || k END AS drug_code,
  CASE
    WHEN k >= 50 THEN 'no_generic'
    WHEN k >= 45 THEN 'no_perfect_match:no_dose_in_esoa'
    WHEN k >= 40 THEN 'generic_not_in_annex'
    WHEN k >= 35 THEN 'no_perfect_match:form_mismatch'
    WHEN k >= 30 THEN 'no_perfect_match:route_mismatch'
    WHEN k % 3 = 0 THEN 'matched_perfect'
    ELSE 'no_perfect_match:dose_mismatch'
  END AS match_reason
FROM ks
"""


@register("p4_bridge_strict_planted", oracle=_P4_ORACLE)
def p4_bridge_strict_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end strict Part-4 bridge on planted relations: every
    reason in the ladder (dose ⊳ form ⊳ route ⊳ no-dose ⊳ not-in-annex
    ⊳ no-generic) is exercised and the oracle derives the expected
    label from the construction."""
    p = table(spark, sf_dir, "part")
    ks = p.select((F.col("p_partkey") % 55).alias("k")).distinct()
    k = F.col("k")
    gen = F.concat(F.lit("GEN"), k.cast("string"))
    esoa_dose = (100 + 10 * k).cast("string")
    tagged = ks.select(
        F.when(k < 30, F.concat(gen, F.lit(" "), esoa_dose, F.lit(" MG TABLET")))
        .when(k < 35, F.concat(gen, F.lit(" 500 MG IV")))
        .when(k < 40, F.concat(gen, F.lit(" 500 MG CREAM")))
        .when(k < 45, F.concat(gen, F.lit(" 500 MG TABLET")))
        .when(k < 50, F.concat(gen, F.lit(" TABLET")))
        .otherwise(F.concat(F.lit("UNTAGGED "), k.cast("string")))
        .alias("raw_text"),
        F.when(k < 50, gen).alias("generic_name"),
        (k < 50).alias("matched"),
    )
    annex_dose = F.when((k % 3 == 0) | (k >= 30), 100 + 10 * k).otherwise(200 + 10 * k)
    annex = (
        ks.filter((k < 40) | ((k >= 45) & (k < 50)))
        .select(
            F.concat(F.lit("D"), k.cast("string")).alias("drug_code"),
            F.concat(
                gen,
                F.lit(" "),
                F.when(k < 30, annex_dose.cast("string")).otherwise(F.lit("500")),
                F.when(k.between(30, 34), F.lit(" MG ORAL")).otherwise(F.lit(" MG TABLET")),
            ).alias("drug_description"),
        )
    )
    return bridge_to_drug_codes(tagged, annex).select(
        "raw_text", "generic_name", "drug_code", "match_reason"
    )


_F33_ORACLE = """
WITH ks AS (SELECT DISTINCT p_partkey % 40 AS k FROM part)
SELECT
  CASE k % 4
    WHEN 0 THEN 'GEN' || k || ' 500 MG TABLET'
    WHEN 1 THEN 'GEN' || k || ' + NOSUCHGEN' || k || ' 10 MG'
    WHEN 2 THEN 'GEN' || k || ' IN SODIUM CHLORIDE SOLUTION'
    ELSE 'NOSUCHACT' || k || ' IN SODIUM CHLORIDE SOLUTION'
  END AS raw_text,
  CASE WHEN k % 4 IN (0, 2) THEN 'GEN' || k END AS generic_name,
  CASE WHEN k % 4 IN (0, 2) THEN 'exact' END AS gm_reason,
  k % 4 IN (0, 2) AS matched
FROM ks
"""


@register("tagger_f33_gate_planted", oracle=_F33_ORACLE)
def tagger_f33_gate_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The F33 admission gate (scoring.py:234-310) under the oracle,
    four planted shapes per key: (0) plain single → exact; (1)
    combination with an unknown second component → the matched single
    is inadmissible (non-combo candidate under is_combination,
    scoring.py:268-271) → unmatched; (2) IV solution with known active
    → active wins over the vehicle and the synthesized combination
    (match_priority exact=0 < combo_match=1); (3) IV solution with
    unknown active → the vehicle-only candidate is skipped
    (scoring.py:249-266) → unmatched."""
    from .tagger import tag_descriptions

    p = table(spark, sf_dir, "part")
    ks = p.select((F.col("p_partkey") % 40).alias("k")).distinct()
    k = F.col("k")
    gen = F.concat(F.lit("GEN"), k.cast("string"))
    m = k % 4
    esoa = ks.select(
        F.when(m == 0, F.concat(gen, F.lit(" 500 MG TABLET")))
        .when(m == 1, F.concat(gen, F.lit(" + NOSUCHGEN"), k.cast("string"), F.lit(" 10 MG")))
        .when(m == 2, F.concat(gen, F.lit(" IN SODIUM CHLORIDE SOLUTION")))
        .otherwise(
            F.concat(F.lit("NOSUCHACT"), k.cast("string"), F.lit(" IN SODIUM CHLORIDE SOLUTION"))
        )
        .alias("raw_text")
    )
    generics = ks.filter(m != 3).select(gen.alias("generic_name")).union(
        spark.createDataFrame([("SODIUM CHLORIDE",)], "generic_name string")
    ).withColumn("drugbank_id", F.concat(F.lit("DB"), F.col("generic_name")))
    atc = spark.createDataFrame(
        [("ZZZNONE", "Z99ZZ99", False)],
        "generic_name string, atc_code string, is_combination_atc boolean",
    )
    return tag_descriptions(esoa, generics, atc).select(
        "raw_text", "generic_name", "gm_reason", "matched"
    )


_P4_BARE_ORACLE = """
WITH ks AS (SELECT DISTINCT p_partkey % 30 AS k FROM part)
SELECT
  'GEN' || k || ' ' || (100 + 10*k) || ' TABLET' AS raw_text,
  CASE WHEN k % 2 = 0 THEN 'D' || k END AS drug_code,
  CASE WHEN k % 2 = 0 THEN 'matched_perfect'
       ELSE 'no_perfect_match:dose_mismatch' END AS match_reason
FROM ks
"""


@register("p4_bare_number_dose_planted", oracle=_P4_BARE_ORACLE)
def p4_bare_number_dose_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-3c bridge parity (runners.py:628-650, ADVICE r3 medium):
    eSOA rows carrying a BARE numeric dose ('GEN3 130 TABLET' — no
    unit, the 'FLANAX 275' shape) must key as mg and bridge on dose:
    even keys match the Annex dose exactly (matched_perfect), odd keys
    meet a different Annex dose (dose_mismatch). Before the fix every
    one of these rows mislabeled as no_perfect_match:no_dose_in_esoa."""
    p = table(spark, sf_dir, "part")
    ks = p.select((F.col("p_partkey") % 30).alias("k")).distinct()
    k = F.col("k")
    gen = F.concat(F.lit("GEN"), k.cast("string"))
    esoa_dose = (100 + 10 * k).cast("string")
    tagged = ks.select(
        F.concat(gen, F.lit(" "), esoa_dose, F.lit(" TABLET")).alias("raw_text"),
        gen.alias("generic_name"),
        F.lit(True).alias("matched"),
    )
    annex_dose = F.when(k % 2 == 0, 100 + 10 * k).otherwise(300 + 10 * k)
    annex = ks.select(
        F.concat(F.lit("D"), k.cast("string")).alias("drug_code"),
        F.concat(gen, F.lit(" "), annex_dose.cast("string"), F.lit("|MG|TABLET")).alias(
            "drug_description"
        ),
    )
    return bridge_to_drug_codes(tagged, annex).select(
        "raw_text", "drug_code", "match_reason"
    )


_W3_ORACLE = """
WITH ks AS (SELECT DISTINCT p_partkey % 40 AS k FROM part)
SELECT
  'GEN' || k || ' 500 MG MR TABLET' AS raw_text,
  CASE WHEN k % 2 = 0 THEN 'B' || k ELSE 'A' || k END AS drug_code,
  'matched_perfect' AS match_reason
FROM ks
"""


@register("w3_details_tiebreak_planted", oracle=_W3_ORACLE)
def w3_details_tiebreak_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 tie-break under the oracle: every row has TWO valid
    candidates; for even k the 'B' candidate's description carries the
    eSOA's release modifier (details_score −10) and must win despite
    sorting after 'A'; for odd k neither does and the drug_code
    tie-break picks 'A'."""
    p = table(spark, sf_dir, "part")
    ks = p.select((F.col("p_partkey") % 40).alias("k")).distinct()
    k = F.col("k")
    gen = F.concat(F.lit("GEN"), k.cast("string"))
    tagged = ks.select(
        F.concat(gen, F.lit(" 500 MG MR TABLET")).alias("raw_text"),
        gen.alias("generic_name"),
        F.lit(True).alias("matched"),
    )
    a = ks.select(
        F.concat(F.lit("A"), k.cast("string")).alias("drug_code"),
        F.concat(gen, F.lit(" 500|MG|TABLET")).alias("drug_description"),
    )
    b = ks.select(
        F.concat(F.lit("B"), k.cast("string")).alias("drug_code"),
        F.concat(
            gen,
            F.when(k % 2 == 0, F.lit(" MR")).otherwise(F.lit("")),
            F.lit(" 500|MG|TABLET"),
        ).alias("drug_description"),
    )
    return bridge_to_drug_codes(tagged, a.unionByName(b)).select(
        "raw_text", "drug_code", "match_reason"
    )


@register(
    "dom_dose_similarity_planted",
    oracle="""
    WITH ks AS (SELECT DISTINCT p_partkey % 16 AS k FROM part)
    SELECT k,
           CAST(CASE WHEN k IN (0, 2, 4, 6, 12, 13, 14, 15)
                     THEN 1.0 ELSE 0.0 END AS DOUBLE) AS similarity
    FROM ks
    """,
)
def dom_dose_similarity_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 dose_similarity under the oracle (reference dose.py:200-259
    + the trimetazidine MR band dose.py:28-36). Each k plants an eSOA
    text and a PNF-side row; the REAL parse_dose + dose_similarity
    columns run in Spark and the oracle reads the expected score
    straight off the planted structure:

      k=0  '1 g' vs 1000 mg           -> 1 (exact after conversion)
      k=1  '450 mg' vs 500 mg         -> 0
      k=2  '500 mg/5 ml' vs 100 mg/ml -> 1 (ratio reduction)
      k=3  '500 mg/5 ml' vs 50 mg/ml  -> 0
      k=4  '0.9 %' vs 0.9 %           -> 1
      k=5  '5 %' vs 0.9 %             -> 0
      k=6  TRIMETAZIDINE 60 mg vs 35  -> 1 (MR band 55-90)
      k=7  TRIMETAZIDINE 100 mg vs 35 -> 0 (outside band)
      k=8  OTHER 60 mg vs 35          -> 0 (band is per-generic)
      k=9  esoa ratio vs PNF amount   -> 0 (kind mismatch)
      k=10 no dose in esoa            -> 0
      k=11 esoa percent vs PNF amount -> 0 (kind mismatch)
      k=12 TRIMETAZIDINE 55 mg vs 35  -> 1 (band lower edge)
      k=13 TRIMETAZIDINE 90 mg vs 35  -> 1 (band upper edge)
      k=14 TRIMETAZIDINE 35 mg vs 35  -> 1 (plain equality)
      k=15 '1 g/1 l' vs 1 mg/ml       -> 1 (L->mL on the per-side)
    """
    from ..functions.dose import dose_similarity, parse_dose

    p = table(spark, sf_dir, "part")
    ks = p.select((F.col("p_partkey") % 16).alias("k")).distinct()
    k = F.col("k")
    text = (
        F.when(k == 0, "GEN 1 g tablet")
        .when(k == 1, "GEN 450 mg")
        .when(k.isin(2, 3, 9), "GEN 500 mg/5 ml")
        .when(k.isin(4, 11), "GEN 0.9 %")
        .when(k == 5, "GEN 5 %")
        .when(k == 6, "TRIMETAZIDINE 60 mg mr capsule")
        .when(k == 7, "TRIMETAZIDINE 100 mg")
        .when(k == 8, "OTHER 60 mg")
        .when(k == 10, "GEN tablets")
        .when(k == 12, "TRIMETAZIDINE 55 mg")
        .when(k == 13, "TRIMETAZIDINE 90 mg")
        .when(k == 14, "TRIMETAZIDINE 35 mg")
        .otherwise(F.lit("GEN 1 g/1 l iv"))
    )
    pnf_kind = (
        F.when(k.isin(2, 3), "ratio").when(k.isin(4, 5), "percent").otherwise(F.lit("amount"))
    )
    pnf_kind = F.when(k == 15, "ratio").otherwise(pnf_kind)
    pnf_strength_mg = (
        F.when(k == 0, 1000.0)
        .when(k.isin(1, 10), 500.0)
        .when(k.isin(6, 7, 8, 12, 13, 14), 35.0)
        .when(k.isin(9, 11), 100.0)
        .otherwise(F.lit(None).cast("double"))
    )
    pnf_ratio = (
        F.when(k == 2, 100.0)
        .when(k == 3, 50.0)
        .when(k == 15, 1.0)
        .otherwise(F.lit(None).cast("double"))
    )
    pnf_pct = F.when(k.isin(4, 5), 0.9).otherwise(F.lit(None).cast("double"))
    pnf_gid = F.when(
        k.isin(6, 7, 12, 13, 14), "trimetazidine"
    ).when(k == 8, "other").otherwise(F.lit("gen"))

    planted = ks.select(
        "k",
        parse_dose(text).alias("d"),
        pnf_kind.alias("pnf_kind"),
        pnf_strength_mg.alias("pnf_strength_mg"),
        pnf_ratio.alias("pnf_ratio"),
        pnf_pct.alias("pnf_pct"),
        pnf_gid.alias("pnf_gid"),
    )
    return planted.select(
        "k",
        dose_similarity(
            F.col("d"),
            F.col("pnf_kind"),
            F.col("pnf_strength_mg"),
            F.col("pnf_ratio"),
            F.col("pnf_pct"),
            F.col("pnf_gid"),
        ).alias("similarity"),
    )


_W1_HEADLINE_ORACLE = """
WITH ks AS (
  SELECT k, translate(CAST(k % 485 AS VARCHAR), '0123456789', 'ABCDEFGHIJ') AS ka
  FROM (SELECT DISTINCT p_partkey AS k FROM part)
)
SELECT
  CASE WHEN k % 5 = 4 THEN 'GEN' || ka || ' + ZPART' || ka || ' ' || (k % 89 + 1) || ' MG'
       ELSE 'GEN' || k || ' 500 MG TABLET' END AS raw_text,
  CASE WHEN k % 5 = 4 THEN 'GEN' || ka || ' + ZPART' || ka
       ELSE 'GEN' || k END AS generic_name,
  CASE k % 5
    WHEN 0 THEN 'N02BE01|J01CR02'
    WHEN 1 THEN 'J01CR02'
    WHEN 2 THEN 'C09AA|N02BE01'
    WHEN 3 THEN NULL
    ELSE 'N02BE01|J01CR02' END AS atc_codes,
  CASE k % 5
    WHEN 0 THEN 'N02BE01'
    WHEN 1 THEN 'J01CR02'
    WHEN 2 THEN 'C09AA'
    WHEN 3 THEN NULL
    ELSE 'J01CR02' END AS atc_primary,
  TRUE AS matched
FROM ks
"""


@register("tagger_w1_rank_headline", oracle=_W1_HEADLINE_ORACLE)
def tagger_w1_rank_headline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 at bench-headline scale (r9, VERDICT #6): one text per
    p_partkey through the FULL tagger → ``w1_select_best`` path —
    the corpus grows with SF so the committed bench catches W1-plan
    regressions that the planted 40-key probes cannot see. Five ATC
    shapes per key (k%5): (0) {non-combo, combo} on a single input →
    primary is the non-combo (scoring.py:314-315); (1) combo-only →
    the combo wins by default; (2) two non-combos of different length
    → W2 payload orders length-first (scoring.py:55-70) while the
    primary is the LEXICAL min (the r8 fuzz-caught distinction);
    (3) no ATC rows but a drugbank_id → admitted with NULL atc_codes
    (tagger.py:845-870); (4) a combination input whose combo-named
    candidate carries {non-combo, combo} → combination inputs prefer
    the combo ATC (scoring.py:316-317, exercising pick_combo)."""
    from ..pipelines.runner import flag_combination_atc
    from .tagger import tag_descriptions

    p = table(spark, sf_dir, "part")
    # ONE scan+distinct of part, frozen as a leaf: esoa, the generics
    # dim, and the atc dim all derive from ks, and before the
    # checkpoint each union leg below re-derived the scan+distinct
    # (~10 sequential AQE stage-jobs during dim materialization).
    # r14: through the content-keyed registry — repeat invocations in
    # one session reuse ONE leaf (r13 ADVICE #1: the per-call eager
    # checkpoints were never released), and a stable ks leaf makes the
    # derived dims plan-equal across calls so _materialize_dim's
    # registry resolves them without re-materialization.
    from ..functions.exprcache import cached_checkpoint

    ks = cached_checkpoint(p.select(F.col("p_partkey").alias("k")).distinct())
    k = F.col("k")
    m = k % 5
    gen = F.concat(F.lit("GEN"), k.cast("string"))
    # combination names are DIGIT-FREE (r10): the reference's '+'
    # block stops collecting a part at its first digit-bearing word
    # (tokenizer.py:1252-1258), so a digit-suffixed synthetic name
    # would leave the combination with ONE input and rank as a single
    # (the extract twin reproduces this; the former approximation did
    # not, which is what this oracle used to encode)
    # ... and drawn from a BOUNDED 97-name pool (k % 485, of which
    # kp % 5 == 4 leaves 97 residues): the production corpus shape is
    # a Heaps-law vocabulary far smaller than the text volume, and a
    # per-key-unique combo name would make every text contribute ~6
    # novel combination-key VARIANTS (reversed/AND/space-joined) that
    # miss tier 0 and flood the fuzzy probe — the bench would measure
    # adversarial fuzzy probing, not the W1 rank plan. Texts stay
    # distinct through the k-varying dose (unique for k < 43,165 =
    # lcm(485, 89) — holds at every driver SF).
    kp = k % 485  # 485 = 5*97 -> kp%5==4 keeps 97 distinct combo ids
    ka = F.translate(kp.cast("string"), "0123456789", "ABCDEFGHIJ")
    gen4 = F.concat(F.lit("GEN"), ka)
    combo_name = F.concat(gen4, F.lit(" + ZPART"), ka)
    esoa = ks.select(
        F.when(m == 4, F.concat(combo_name, F.lit(" "), ((k % 89) + 1).cast("string"), F.lit(" MG")))
        .otherwise(F.concat(gen, F.lit(" 500 MG TABLET")))
        .alias("raw_text")
    )
    # the m==4 COMPONENT names ride along as plain generics (no ATC):
    # under a combination input they are inadmissible (scoring.py:
    # 268-271) so outputs are unchanged, but their tokens now resolve
    # in tier 0 — without these rows every component token would fall
    # through to the fuzzy probe, turning the bench into a measure of
    # fuzzy-probing 8K unique tokens instead of the W1 rank plan.
    # One tagged explode + one distinct builds the whole dim (the
    # former per-leg union-distinct shape re-aggregated ks 3×); the
    # row SET is identical — the main row and the two m==4 component
    # rows can never collide (component names are ' + '-free).
    def _g(name_col, id_col):
        return F.struct(name_col.alias("generic_name"), id_col.alias("drugbank_id"))

    generics = ks.select(
        F.explode(
            F.when(
                m == 4,
                F.array(
                    _g(combo_name, F.concat(F.lit("DB"), kp.cast("string"))),
                    _g(gen4, F.concat(F.lit("DBS"), kp.cast("string"))),
                    _g(F.concat(F.lit("ZPART"), ka), F.concat(F.lit("DBZ"), kp.cast("string"))),
                ),
            ).otherwise(F.array(_g(gen, F.concat(F.lit("DB"), k.cast("string")))))
        ).alias("t")
    ).select("t.generic_name", "t.drugbank_id").distinct()
    cname = F.when(m == 4, combo_name).otherwise(gen).alias("generic_name")
    # same collapse for the atc dim: the former 7-leg union (each leg
    # a filter + per-leg distinct over its own ks derivation) is one
    # explode of the per-residue code list + one distinct — the same
    # (generic_name, atc_code) set (m==3 rows explode an empty array)
    codes = (
        F.when(m.isin(0, 4), F.array(F.lit("N02BE01"), F.lit("J01CR02")))
        .when(m == 1, F.array(F.lit("J01CR02")))
        .when(m == 2, F.array(F.lit("C09AA"), F.lit("N02BE01")))
        .otherwise(F.array().cast("array<string>"))
    )
    atc = ks.select(cname, F.explode(codes).alias("atc_code")).distinct()
    return tag_descriptions(esoa, generics, flag_combination_atc(atc)).select(
        "raw_text", "generic_name", "atc_codes", "atc_primary", "matched"
    )


_COMBO_SUBSTR_ORACLE = """
WITH ks AS (SELECT DISTINCT p_partkey % 30 AS k FROM part),
c AS (
  SELECT k, k % 2 AS m,
    CASE k % 3
      WHEN 0 THEN 'CALCIUM CARBONATE + MAGNESIUM CARBONATE'
      WHEN 1 THEN 'ALUMINIUM HYDROXIDE + MAGNESIUM HYDROXIDE'
      ELSE 'FERROUS SULFATE + ZINC SULFATE'
    END AS combo,
    CASE k % 3 WHEN 0 THEN 'A02AC10' WHEN 1 THEN 'A02AD01' ELSE 'B03AE10' END AS atc
  FROM ks
)
SELECT
  CASE WHEN m = 0 THEN substr(combo, 1, 1) || combo
       ELSE substr(combo, 1, 3) || 'X' || substr(combo, 4) END
    || ' ' || (100 + 10 * k) || ' MG TABLET' AS raw_text,
  m = 0 AS matched,
  CASE WHEN m = 0 THEN combo END AS generic_matched,
  CASE WHEN m = 0 THEN atc END AS atc_primary
FROM c
"""


@register("tagger_combo_typo_substring_planted", oracle=_COMBO_SUBSTR_ORACLE)
def tagger_combo_typo_substring_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pins the r9 corpus-fuzz find (seeds 77/2024/99991, the one open
    PARITY.md divergence): the reference's multiword detection is
    BARE-SUBSTRING (tokenizer.py:1174 / normalize_tokens), so a
    combination text whose typo leaves the clean combination name
    intact as a substring (first letter duplicated: 'CCALCIUM
    CARBONATE + MAGNESIUM CARBONATE') still exact-resolves through the
    multiword pre-pass, rescued further by the PURE_SALT_COMPOUNDS
    re-add (tokenizer.py:1214-1231) which keeps the '+'-block from
    stripping the combination token. A typo that BREAKS the substring
    ('CALXCIUM …') stays unmatched — no fuzzy tier reaches it (all
    combo-key probes score < 85 against the combination name)."""
    from ..pipelines.runner import flag_combination_atc

    from .tagger import tag_descriptions

    p = table(spark, sf_dir, "part")
    ks = p.select((F.col("p_partkey") % 30).alias("k")).distinct()
    k = F.col("k")
    m = k % 2
    combo = (
        F.when(k % 3 == 0, F.lit("CALCIUM CARBONATE + MAGNESIUM CARBONATE"))
        .when(k % 3 == 1, F.lit("ALUMINIUM HYDROXIDE + MAGNESIUM HYDROXIDE"))
        .otherwise(F.lit("FERROUS SULFATE + ZINC SULFATE"))
    )
    atc_code = (
        F.when(k % 3 == 0, F.lit("A02AC10"))
        .when(k % 3 == 1, F.lit("A02AD01"))
        .otherwise(F.lit("B03AE10"))
    )
    rows = ks.select(k.alias("k"), combo.alias("combo_s"), atc_code.alias("atc_s"))
    esoa = rows.select(
        F.concat(
            F.when(
                F.col("k") % 2 == 0,
                F.concat(F.substring("combo_s", 1, 1), F.col("combo_s")),
            ).otherwise(
                F.concat(
                    F.substring("combo_s", 1, 3), F.lit("X"), F.expr("substring(combo_s, 4)")
                )
            ),
            F.lit(" "),
            (100 + 10 * F.col("k")).cast("string"),
            F.lit(" MG TABLET"),
        ).alias("raw_text")
    )
    generics = rows.select(F.col("combo_s").alias("generic_name")).distinct().withColumn(
        "drugbank_id", F.concat(F.lit("DBC"), F.substring("generic_name", 1, 3))
    )
    atc = rows.select(
        F.col("combo_s").alias("generic_name"), F.col("atc_s").alias("atc_code")
    ).distinct()
    return tag_descriptions(esoa, generics, flag_combination_atc(atc)).select(
        "raw_text",
        "matched",
        F.when(F.col("matched"), F.col("generic_name")).alias("generic_matched"),
        F.when(F.col("matched"), F.col("atc_primary")).alias("atc_primary"),
    )


_P1_PREPARE_ORACLE = """
WITH ks AS (SELECT DISTINCT p_partkey % 5 AS k FROM part WHERE p_partkey % 5 <> 2)
SELECT
  CASE k WHEN 0 THEN 'GENALPHA' WHEN 1 THEN 'GENBETA'
         WHEN 3 THEN 'GENGAMMA HYDROCHLORIDE'
         ELSE 'GENDELTA 10% SOLUTION' END                          AS raw_molecule,
  CASE k WHEN 0 THEN 'GENALPHA' WHEN 1 THEN 'GENBETA'
         WHEN 3 THEN 'GENGAMMA' ELSE 'GENDELTA' END                AS generic_normalized,
  CASE k WHEN 3 THEN 'HYDROCHLORIDE' ELSE '' END                   AS salt_form,
  CASE k WHEN 0 THEN 'N02BE01' WHEN 1 THEN 'n02be01'
         ELSE 'B05XA03' END                                        AS atc_code,
  CASE k WHEN 0 THEN 500.0 WHEN 1 THEN 0.0 WHEN 3 THEN 10.0 END    AS strength,
  CASE WHEN k IN (0, 1, 3) THEN 'mg' END                           AS unit,
  CASE k WHEN 0 THEN 500.0 WHEN 1 THEN 0.0 WHEN 3 THEN 10.0 END    AS strength_mg,
  CASE k WHEN 3 THEN 2.0 END                                       AS ratio_mg_per_ml,
  CASE WHEN k IN (0, 1) THEN 'oral' ELSE 'intravenous' END         AS route,
  CASE k WHEN 0 THEN 'tablet' WHEN 1 THEN 'sachet' WHEN 3 THEN 'vial' END AS form
FROM ks
"""


@register("p1_prepare_pnf_planted", oracle=_P1_PREPARE_ORACLE)
def p1_prepare_pnf_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pins the round-10 Part-1 fuzz finds under the driver's oracle
    gate (scripts/fuzz_part1_vs_reference.py vs live prepare.py):
    k=1 — atc_code is clean_atc (trim/NBSP, NEVER uppercased:
    ' n02be01 ' stays lowercase) and the dose parses from
    normalize_text(generic_normalized + ' ' + spec), so '1,000 mg'
    reads '000 mg' → strength 0.0, not comma-decimal 1.0;
    k=2 — a blank Molecule row is DROPPED (prepare.py:124-125);
    k=3 — F6 base/salt split + mg/5 mL ratio (10/5 = 2.0) + the IV:
    route-label expansion;
    k=4 — the parse source is the F6 BASE, so a dose-shaped molecule
    tail ('10% SOLUTION') contributes NOTHING when the spec is empty."""
    from ..pipelines.drugs import prepare_pnf

    ks = table(spark, sf_dir, "part").select(
        (F.col("p_partkey") % 5).alias("k")
    ).distinct()
    k = F.col("k")
    pnf = ks.select(
        F.when(k == 0, "GENALPHA").when(k == 1, "GENBETA").when(k == 2, "")
        .when(k == 3, "GENGAMMA HYDROCHLORIDE")
        .otherwise("GENDELTA 10% SOLUTION").alias("Molecule"),
        F.when(k.isin(0, 1, 2), "Oral:").otherwise("IV:").alias("Route"),
        F.when(k == 0, "N02BE01").when(k == 1, " n02be01 ")
        .when(k == 2, "Z99ZZ09").otherwise("B05XA03").alias("ATC Code"),
        F.when(k == 0, "500 mg tablet").when(k == 1, "1,000 mg sachet")
        .when(k == 2, "500 mg tablet").when(k == 3, "10 mg/5 mL vial")
        .otherwise("").alias("Technical Specifications"),
    )
    return prepare_pnf(pnf).select(
        "raw_molecule", "generic_normalized", "salt_form", "atc_code",
        "strength", "unit", "strength_mg", "ratio_mg_per_ml", "route", "form",
    )
