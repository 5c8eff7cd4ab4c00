"""Dose parsing & comparison — native Catalyst tier with Python twins.

Reference parity targets:
- parse_dose (F9, dose.py:10-100,138-189): regex bank with priority
  ratio > amount > percent; pack unmasking ("10 x 500 mg" → 500 mg);
  L→mL ×1000 on the per-side.
- to_mg (F10, dose.py:103-126): mass-unit factors.
- safe_ratio_mg_per_ml (F11, dose.py:129-135).
- dose_similarity (F12, dose.py:200-259): exact-after-conversion
  equality with isclose(rel 1e-12, abs 1e-9).
- normalize_dose_ratio / weight (F16, tokenizer.py:758-853):
  "500MG/5ML" → "100MG/ML", "1G" → "1000MG" canonical strings.

The dose value is a first-class StructType column — the reference
passes dicts in object columns (SURVEY §1.2).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from .constants import UNIT_TO_MG

NUM = r"([0-9]+(?:\.[0-9]+)?)"
MASS_UNITS = r"(mcg|ug|mg|g|gm|grams?|kg|iu|units?|meq|mmol)"
# Longest-first alternation; plural nouns and gtt included because the
# reference parses both "mg/tab" and "mg per 2 tabs" (dose.py:10-100).
PER_UNITS = (
    r"(ml|l|tablets|tablet|tabs|tab|capsules|capsule|caps|cap|sachets|sachet"
    r"|drops|drop|gtt|actuations|actuation|sprays|spray|puffs|puff|doses|dose)"
)
# Ratio separator: '/' or the word 'per' ("5 mg per 5 ml" ≡ "5 mg/5 ml").
_RATIO_SEP = r"(?:/|\bper\b)"

# Pack pattern first: "10 x 500 mg" — the trailing amount is the dose.
_PACK_RE = rf"[0-9]+\s*x\s*{NUM}\s*{MASS_UNITS}\b"
_RATIO_RE = rf"{NUM}\s*{MASS_UNITS}\s*{_RATIO_SEP}\s*{NUM}?\s*{PER_UNITS}\b"
_AMOUNT_RE = rf"{NUM}\s*{MASS_UNITS}\b"
_PCT_RE = rf"{NUM}\s*%"

DOSE_STRUCT_FIELDS = "kind string, strength double, unit string, per_val double, per_unit string, pct double"


@dataclass
class Dose:
    kind: str | None = None
    strength: float | None = None
    unit: str | None = None
    per_val: float | None = None
    per_unit: str | None = None
    pct: float | None = None


def _canon_unit(u: str | None) -> str | None:
    if u is None:
        return None
    u = u.lower()
    return {"gm": "g", "gram": "g", "grams": "g", "ug": "mcg", "unit": "iu", "units": "iu"}.get(u, u)


_PER_UNIT_CANON = {
    "tablets": "tab", "tablet": "tab", "tabs": "tab",
    "capsules": "cap", "capsule": "cap", "caps": "cap",
    "sachets": "sachet", "drops": "drop", "gtt": "drop",
    "actuations": "actuation", "sprays": "spray", "puffs": "puff",
    "doses": "dose",
}


def _canon_per_unit(u: str | None) -> str | None:
    if u is None:
        return None
    return _PER_UNIT_CANON.get(u, u)


def parse_dose_py(text: str | None) -> Dose:
    """Python twin: priority ratio > amount > percent; pack unmasking;
    L→mL on the per-side (×1000 into per_val)."""
    if not text:
        return Dose()
    s = text.lower()
    m = re.search(_RATIO_RE, s)
    if m:
        strength, unit = float(m.group(1)), _canon_unit(m.group(2))
        per_val = float(m.group(3)) if m.group(3) else 1.0
        per_unit = _canon_per_unit(m.group(4))
        if per_unit == "l":
            per_val, per_unit = per_val * 1000.0, "ml"
        return Dose("ratio", strength, unit, per_val, per_unit, None)
    m = re.search(_PACK_RE, s)
    if m:
        return Dose("amount", float(m.group(1)), _canon_unit(m.group(2)), None, None, None)
    m = re.search(_AMOUNT_RE, s)
    if m:
        return Dose("amount", float(m.group(1)), _canon_unit(m.group(2)), None, None, None)
    m = re.search(_PCT_RE, s)
    if m:
        return Dose("percent", None, None, None, None, float(m.group(1)))
    return Dose()


def _canon_unit_col(u: Column) -> Column:
    return (
        F.when(u.isin("gm", "gram", "grams"), "g")
        .when(u == "ug", "mcg")
        .when(u.isin("unit", "units"), "iu")
        .otherwise(u)
    )


def _canon_per_unit_col(u: Column) -> Column:
    expr = u
    for raw, canon in _PER_UNIT_CANON.items():
        expr = F.when(u == raw, canon).otherwise(expr)
    return expr


def parse_dose(col: Column | str) -> Column:
    """Native dose parser → struct(kind, strength, unit, per_val,
    per_unit, pct). Same regex bank and priority as the Python twin;
    all whole-stage-codegen."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)

    r_str = F.regexp_extract(c, _RATIO_RE, 1)
    r_unit = F.regexp_extract(c, _RATIO_RE, 2)
    r_pval = F.regexp_extract(c, _RATIO_RE, 3)
    r_punit = F.regexp_extract(c, _RATIO_RE, 4)
    pk_str = F.regexp_extract(c, _PACK_RE, 1)
    pk_unit = F.regexp_extract(c, _PACK_RE, 2)
    a_str = F.regexp_extract(c, _AMOUNT_RE, 1)
    a_unit = F.regexp_extract(c, _AMOUNT_RE, 2)
    p_str = F.regexp_extract(c, _PCT_RE, 1)

    per_val_raw = F.when(r_pval == "", F.lit(1.0)).otherwise(r_pval.cast("double"))
    per_val = F.when(r_punit == "l", per_val_raw * 1000.0).otherwise(per_val_raw)
    per_unit = F.when(r_punit == "l", F.lit("ml")).otherwise(_canon_per_unit_col(r_punit))

    has_ratio = r_str != ""
    has_pack = pk_str != ""
    has_amount = a_str != ""
    has_pct = p_str != ""

    kind = (
        F.when(has_ratio, "ratio")
        .when(has_pack | has_amount, "amount")
        .when(has_pct, "percent")
        .otherwise(F.lit(None).cast("string"))
    )
    strength = (
        F.when(has_ratio, r_str.cast("double"))
        .when(has_pack, pk_str.cast("double"))
        .when(has_amount, a_str.cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )
    unit = (
        F.when(has_ratio, _canon_unit_col(r_unit))
        .when(has_pack, _canon_unit_col(pk_unit))
        .when(has_amount, _canon_unit_col(a_unit))
        .otherwise(F.lit(None).cast("string"))
    )
    return F.struct(
        kind.alias("kind"),
        strength.alias("strength"),
        unit.alias("unit"),
        F.when(has_ratio, per_val).otherwise(F.lit(None).cast("double")).alias("per_val"),
        F.when(has_ratio, per_unit).otherwise(F.lit(None).cast("string")).alias("per_unit"),
        F.when(~has_ratio & ~has_pack & ~has_amount & has_pct, p_str.cast("double"))
        .otherwise(F.lit(None).cast("double"))
        .alias("pct"),
    )


def to_mg(strength: Column, unit: Column) -> Column:
    """F10: mass → mg via the factor map; NULL for non-mass units."""
    expr = F.lit(None).cast("double")
    for u, factor in UNIT_TO_MG.items():
        expr = F.when(unit == u, strength * factor).otherwise(expr)
    return expr


def to_mg_py(strength: float | None, unit: str | None) -> float | None:
    if strength is None or unit is None:
        return None
    f = UNIT_TO_MG.get(unit)
    return strength * f if f is not None else None


def ratio_mg_per_ml(strength_mg: Column, per_val: Column) -> Column:
    """F11: mg ÷ per_val with null/zero guards."""
    return F.when(
        strength_mg.isNull() | per_val.isNull() | (per_val == 0), F.lit(None).cast("double")
    ).otherwise(strength_mg / per_val)


def _isclose(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-9)


def dose_similarity_py(a: Dose, b: Dose) -> float:
    """F12: 1.0 iff equal after unit conversion, else 0.0.
    amounts compare in mg; ratios compare mg/ml; percents exact."""
    if a.kind is None or b.kind is None or a.kind != b.kind:
        return 0.0
    if a.kind == "amount":
        ma, mb = to_mg_py(a.strength, a.unit), to_mg_py(b.strength, b.unit)
        return 1.0 if ma is not None and mb is not None and _isclose(ma, mb) else 0.0
    if a.kind == "ratio":
        ma, mb = to_mg_py(a.strength, a.unit), to_mg_py(b.strength, b.unit)
        if ma is None or mb is None or not a.per_val or not b.per_val:
            return 0.0
        return 1.0 if _isclose(ma / a.per_val, mb / b.per_val) else 0.0
    if a.kind == "percent":
        return 1.0 if a.pct is not None and b.pct is not None and _isclose(a.pct, b.pct) else 0.0
    return 0.0


# F12 modified-release equivalence band (reference dose.py:28-36):
# trimetazidine MR capsules marketed at 55-90 mg correspond to the
# 35 mg base strength in the PNF.
_SPECIAL_AMOUNT_EQUIVALENCE: dict[str, tuple[float, float, float]] = {
    "trimetazidine": (35.0, 55.0, 90.0),  # (target_mg, min_mg, max_mg)
}


def _isclose_col(a: Column, b: Column) -> Column:
    """Column twin of math.isclose(rel_tol=1e-12, abs_tol=1e-9)."""
    return F.abs(a - b) <= F.greatest(
        1e-12 * F.greatest(F.abs(a), F.abs(b)), F.lit(1e-9)
    )


def dose_similarity(
    d: Column,
    pnf_dose_kind: Column,
    pnf_strength_mg: Column,
    pnf_ratio_mg_per_ml: Column,
    pnf_pct: Column,
    pnf_generic_id: Column,
) -> Column:
    """F12 native tier (reference dose.py:200-259): 1.0 iff the parsed
    eSOA dose ``d`` (parse_dose struct) equals the PNF row's dose after
    unit conversion, else 0.0.

    - amounts compare in mg vs ``strength_mg``; the trimetazidine MR
      band (PNF 35 mg base ∧ eSOA 55-90 mg ∧ amount-kind PNF row)
      also scores 1.0;
    - ratios require PNF dose_kind='ratio' and equal mg/mL;
    - percents require PNF dose_kind='percent' and exact pct.
    All comparisons via isclose(rel 1e-12, abs 1e-9); whole-stage
    codegen (no UDF)."""
    mg_esoa = to_mg(d["strength"], d["unit"])
    gid = F.lower(F.trim(pnf_generic_id))
    special = F.lit(False)
    for name, (target, lo, hi) in _SPECIAL_AMOUNT_EQUIVALENCE.items():
        special = special | (
            (gid == name)
            & (pnf_dose_kind == "amount")
            & _isclose_col(pnf_strength_mg, F.lit(target))
            & (mg_esoa >= lo)
            & (mg_esoa <= hi)
        )
    amount_sim = F.when(
        mg_esoa.isNull() | pnf_strength_mg.isNull(), 0.0
    ).when(_isclose_col(mg_esoa, pnf_strength_mg) | special, 1.0).otherwise(0.0)

    # per_val 0.0 must fall back to 1.0 exactly like the twin's
    # `(d.per_val or 1.0)` — coalesce alone passes 0 through and a
    # '/0 ml' dose string would DIVIDE_BY_ZERO under ANSI mode
    per_val_safe = F.when(
        d["per_val"].isNull() | (d["per_val"] == 0), F.lit(1.0)
    ).otherwise(d["per_val"])
    ratio_esoa = mg_esoa / per_val_safe
    ratio_sim = F.when(
        (pnf_dose_kind != "ratio")
        | mg_esoa.isNull()
        | pnf_ratio_mg_per_ml.isNull()
        | (pnf_ratio_mg_per_ml == 0),
        0.0,
    ).when(_isclose_col(ratio_esoa, pnf_ratio_mg_per_ml), 1.0).otherwise(0.0)

    pct_sim = F.when(
        (pnf_dose_kind != "percent") | d["pct"].isNull() | pnf_pct.isNull(), 0.0
    ).when(_isclose_col(d["pct"], pnf_pct), 1.0).otherwise(0.0)

    return (
        F.when(d["kind"].isNull() | pnf_dose_kind.isNull(), 0.0)
        .when(d["kind"] == "amount", amount_sim)
        .when(d["kind"] == "ratio", ratio_sim)
        .when(d["kind"] == "percent", pct_sim)
        .otherwise(0.0)
    )


def dose_similarity_pnf_py(
    d: Dose,
    pnf_dose_kind: str | None,
    pnf_strength_mg: float | None,
    pnf_ratio_mg_per_ml: float | None,
    pnf_pct: float | None,
    pnf_generic_id: str | None,
) -> float:
    """Python twin of dose_similarity (the reference's actual
    signature: parsed eSOA dose vs a PNF row)."""
    if d.kind is None or pnf_dose_kind is None:
        return 0.0
    if d.kind == "amount":
        mg = to_mg_py(d.strength, d.unit)
        if mg is None or pnf_strength_mg is None:
            return 0.0
        if _isclose(mg, pnf_strength_mg):
            return 1.0
        special = _SPECIAL_AMOUNT_EQUIVALENCE.get((pnf_generic_id or "").strip().lower())
        if special and pnf_dose_kind == "amount":
            target, lo, hi = special
            if _isclose(pnf_strength_mg, target) and lo <= mg <= hi:
                return 1.0
        return 0.0
    if d.kind == "ratio":
        if pnf_dose_kind != "ratio":
            return 0.0
        mg = to_mg_py(d.strength, d.unit)
        if mg is None or not pnf_ratio_mg_per_ml:
            return 0.0
        return 1.0 if _isclose(mg / (d.per_val or 1.0), pnf_ratio_mg_per_ml) else 0.0
    if d.kind == "percent":
        if pnf_dose_kind != "percent" or d.pct is None or pnf_pct is None:
            return 0.0
        return 1.0 if _isclose(d.pct, pnf_pct) else 0.0
    return 0.0


def normalize_dose_string(col: Column | str) -> Column:
    """F16: canonical dose string — amounts as mg ('1 g' → '1000MG'),
    ratios reduced to per-1-mL ('500mg/5ml' → '100MG/ML'). Non-doses
    → NULL. format_number-free: integral values print without '.0'."""
    d = parse_dose(col)
    mg = to_mg(d["strength"], d["unit"])

    def fmt(x: Column) -> Column:
        as_long = x.cast("long")
        return F.when(x == as_long.cast("double"), as_long.cast("string")).otherwise(
            x.cast("string")
        )

    per_ml = ratio_mg_per_ml(mg, d["per_val"])
    return (
        F.when((d["kind"] == "amount") & mg.isNotNull(), F.concat(fmt(mg), F.lit("MG")))
        .when(
            (d["kind"] == "ratio") & per_ml.isNotNull(),
            F.concat(fmt(per_ml), F.lit("MG/"), F.upper(d["per_unit"])),
        )
        .when(d["kind"] == "percent", F.concat(fmt(d["pct"]), F.lit("%")))
        .otherwise(F.lit(None).cast("string"))
    )
