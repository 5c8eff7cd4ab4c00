"""F15 master extractor: one text in, a wide details struct out.

Reference: ``extract_drug_details`` (tokenizer.py:330-744) plus its two
helpers ``parse_dose_components`` (F13, tokenizer.py:185-264) and
``calculate_iv_amounts`` (F14, tokenizer.py:267-327), and the
type/release/form detail extractors (tokenizer.py:63-149).

Every eSOA row flows through this once; the outputs feed the W1 tagger
tie-break (scoring.py:294-383) and the Part-4 W3 rank
(runners.py:959-1010). Spark-first shape: a single Arrow-batched
pandas_udf returning ONE struct column — callers project the fields
they need, so the Python boundary is crossed exactly once per row and
the struct is column-pruned by Catalyst after the UDF.

The regex cascade is irreducibly imperative (ordered, self-modifying
`working` string), so this is the documented Pandas-UDF slow path
(SURVEY §2.8); the hot tagger path still uses the native extraction
twin and only joins this struct in for tie-breaking.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- vocabulary (tokenizer.py:38-60) --------------------------------------

RELEASE_KEYWORDS: frozenset[str] = frozenset(
    {
        "EXTENDED RELEASE", "EXTENDED-RELEASE", "SUSTAINED RELEASE",
        "SUSTAINED-RELEASE", "MODIFIED RELEASE", "MODIFIED-RELEASE",
        "CONTROLLED RELEASE", "CONTROLLED-RELEASE", "DELAYED RELEASE",
        "DELAYED-RELEASE", "IMMEDIATE RELEASE", "IMMEDIATE-RELEASE",
        "LONG ACTING", "LONG-ACTING", "RETARD", "SLOW RELEASE",
    }
)
RELEASE_ABBREVS: frozenset[str] = frozenset({"ER", "XR", "XL", "SR", "CR", "DR", "IR", "MR", "LA"})
FORM_DETAIL_KEYWORDS: frozenset[str] = frozenset(
    {
        "FILM COATED", "FILM-COATED", "ENTERIC COATED", "ENTERIC-COATED",
        "SUGAR COATED", "SUGAR-COATED", "CHEWABLE", "DISPERSIBLE",
        "EFFERVESCENT", "SUBLINGUAL", "BUCCAL", "ORALLY DISINTEGRATING",
        "RECTAL", "VAGINAL",
    }
)
FORM_DETAIL_ABBREVS: frozenset[str] = frozenset({"FC", "EC", "ODT"})

_MASS_TO_MG = {
    "MG": 1.0, "G": 1000.0, "GM": 1000.0, "GR": 1000.0,
    "MCG": 0.001, "UG": 0.001, "ΜG": 0.001, "KG": 1_000_000.0,
}
_VOLUME_TO_ML = {"ML": 1.0, "L": 1000.0, "CC": 1.0, "DL": 100.0}

# --- F13: structured dose components (tokenizer.py:177-264) ----------------

_STRUCTURED_DOSE_RE = re.compile(
    r"(?P<value>\d+(?:[.,]\d+)?)\s*"
    r"(?P<unit>mg|g|gm|gr|mcg|ug|μg|kg|ml|l|cc|dl|iu|unit|units|%|pct)"
    r"(?:\s*/\s*(?P<per_value>\d+(?:[.,]\d+)?)\s*"
    r"(?P<per_unit>ml|l|cc|dl|tab|tablet|cap|capsule|dose|unit|5ml))?",
    re.IGNORECASE,
)


def parse_dose_components_py(text: str | None) -> dict:
    """F13: every dose token in the text, classified and converted.

    Returns {'doses': [...], 'total_volume_ml': float|None,
    'percentages': [...]}; each dose dict has value/unit/unit_type/
    value_mg/value_ml/concentration_mg_per_ml — the reference's
    structured dose contract, including the mg/5mL pediatric case.
    """
    out = {"doses": [], "total_volume_ml": None, "percentages": []}
    if not text:
        return out
    for m in _STRUCTURED_DOSE_RE.finditer(text.upper()):
        value = float(m.group("value").replace(",", "."))
        unit = m.group("unit").upper()
        dose = {
            "value": value,
            "unit": unit,
            "unit_type": None,
            "value_mg": None,
            "value_ml": None,
            "concentration_mg_per_ml": None,
        }
        if unit in ("%", "PCT"):
            dose["unit_type"] = "percentage"
            dose["unit"] = "%"
            out["percentages"].append(value)
        elif unit in _MASS_TO_MG:
            dose["unit_type"] = "mass"
            dose["value_mg"] = value * _MASS_TO_MG[unit]
        elif unit in _VOLUME_TO_ML:
            dose["unit_type"] = "volume"
            dose["value_ml"] = value * _VOLUME_TO_ML[unit]
            if out["total_volume_ml"] is None or dose["value_ml"] > out["total_volume_ml"]:
                out["total_volume_ml"] = dose["value_ml"]
        elif unit in ("IU", "UNIT", "UNITS"):
            dose["unit_type"] = "iu"
        per_value_str = m.group("per_value")
        per_unit = m.group("per_unit").upper() if m.group("per_unit") else None
        if per_value_str and per_unit:
            per_value = float(per_value_str.replace(",", "."))
            if per_unit == "5ML":  # '10 mg/5mL' writes the 5 into the unit
                per_value, per_unit = 5.0, "ML"
            if per_unit in _VOLUME_TO_ML and dose["value_mg"] is not None:
                per_ml = per_value * _VOLUME_TO_ML[per_unit]
                if per_ml > 0:
                    dose["concentration_mg_per_ml"] = dose["value_mg"] / per_ml
                    dose["unit_type"] = "concentration"
        out["doses"].append(dose)
    return out


def calculate_iv_amounts_py(
    drug_percentages: list[float],
    diluent_percentage: float | None,
    total_volume_ml: float | None,
) -> dict:
    """F14: w/v math — X% of V mL = X·V/100 grams (tokenizer.py:267-327)."""
    out = {
        "drug_amount_mg": None,
        "drug_amount_g": None,
        "diluent_amount_mg": None,
        "diluent_amount_g": None,
        "diluent_volume_ml": None,
        "concentration_mg_per_ml": None,
    }
    if total_volume_ml is None or not drug_percentages:
        return out
    pct = drug_percentages[0]
    drug_g = (pct / 100.0) * total_volume_ml
    out["drug_amount_g"] = round(drug_g, 3)
    out["drug_amount_mg"] = round(drug_g * 1000, 3)
    out["concentration_mg_per_ml"] = round((pct / 100.0) * 1000, 3)
    # dissolved solids occupy ~no volume: diluent volume ≈ total volume
    out["diluent_volume_ml"] = total_volume_ml
    if diluent_percentage is not None:
        dil_g = (diluent_percentage / 100.0) * total_volume_ml
        out["diluent_amount_g"] = round(dil_g, 3)
        out["diluent_amount_mg"] = round(dil_g * 1000, 3)
    return out


# --- type / release / form detail (tokenizer.py:63-149) --------------------

_COMMON_FORM_WORDS = ("TABLET", "CAPSULE", "SOLUTION", "SUSPENSION", "INJECTION", "CREAM", "OINTMENT")


def extract_type_detail_py(text: str) -> tuple[str, str | None]:
    """'VITAMIN A, HUMAN' → ('VITAMIN A', 'HUMAN'); comma tails that are
    release/form modifiers or form words are NOT type details."""
    if "," not in text:
        return text, None
    up = text.upper()
    if " + " in up or " AND " in up:
        return text, None
    base, _, tail = text.partition(",")
    base, tail = base.strip(), tail.strip()
    if not tail:
        return base, None
    tail_up = tail.upper()
    tail_words = set(tail_up.split())
    if any(kw in tail_up for kw in RELEASE_KEYWORDS):
        return text, None
    if any(kw in tail_up for kw in FORM_DETAIL_KEYWORDS):
        return text, None
    if tail_words & (FORM_DETAIL_ABBREVS | RELEASE_ABBREVS):
        return text, None
    if any(fw in tail_up for fw in _COMMON_FORM_WORDS):
        return text, None
    return base, tail


def _extract_keyword_detail(
    form_text: str, keywords: frozenset[str], abbrevs: frozenset[str]
) -> tuple[str, str | None]:
    """Shared shape of the release / form-detail extractors: comma tail
    first, then embedded keyword, then trailing / any abbreviation."""
    up = form_text.upper()
    words = up.split()
    if "," in form_text:
        base, _, tail = form_text.partition(",")
        tail = tail.strip()
        tail_up = tail.upper()
        if any(kw in tail_up for kw in keywords) or (set(tail_up.split()) & abbrevs):
            return base.strip(), tail
    for kw in keywords:
        if f" {kw}" in up or up.endswith(f" {kw}"):
            idx = up.find(kw)
            base = form_text[:idx].strip()
            if base:
                return base, form_text[idx:].strip()
    if len(words) >= 2 and words[-1] in abbrevs:
        return " ".join(form_text.split()[:-1]), words[-1]
    for w in words:
        if w in abbrevs:
            return form_text, w
    return form_text, None


# One-pass presence scans — a match is necessary for the keyword
# extractors to return a detail, so a miss skips the 30-odd substring
# probes on the (overwhelmingly common) plain texts.
_RELEASE_SCAN_RE = re.compile(
    "|".join(re.escape(k) for k in sorted(RELEASE_KEYWORDS, key=len, reverse=True))
    + r"|\b(?:" + "|".join(sorted(RELEASE_ABBREVS)) + r")\b",
    re.IGNORECASE,
)
_FORM_DETAIL_SCAN_RE = re.compile(
    "|".join(re.escape(k) for k in sorted(FORM_DETAIL_KEYWORDS, key=len, reverse=True))
    + r"|\b(?:" + "|".join(sorted(FORM_DETAIL_ABBREVS)) + r")\b",
    re.IGNORECASE,
)


def extract_release_detail_py(form_text: str) -> tuple[str, str | None]:
    if not _RELEASE_SCAN_RE.search(form_text):
        return form_text, None
    return _extract_keyword_detail(form_text, RELEASE_KEYWORDS, RELEASE_ABBREVS)


def extract_form_detail_py(form_text: str) -> tuple[str, str | None]:
    if not _FORM_DETAIL_SCAN_RE.search(form_text):
        return form_text, None
    return _extract_keyword_detail(form_text, FORM_DETAIL_KEYWORDS, FORM_DETAIL_ABBREVS)


# --- F15 master extractor (tokenizer.py:330-744) ---------------------------

_SALT_PAREN_RE = re.compile(r"\(\s*as\s+([^)]+)\)", re.IGNORECASE)
_INDICATION_RE = re.compile(
    r"\bfor\s+(\w+(?:\s+\w+){0,3}?)(?:\s+(?:failure|conditions?|patients?))?",
    re.IGNORECASE,
)
_INDICATION_MARKERS = ("HEPATIC", "RENAL", "INFANT", "PEDIATRIC", "IMMUNONUTRITION", "IMMUNOENHANCEMENT")

_IV_DILUENT_RE = re.compile(
    r"\bIN\s+"
    r"(?:(\d+(?:\.\d+)?\s*%)\s+)?"
    r"(WATER|SODIUM\s+CHLORIDE|LACTATED\s+RINGER[''`]?S?(?:\s+SOLUTION)?|"
    r"ACETATED\s+RINGER[''`]?S?(?:\s+SOLUTION)?|RINGER[''`]?S?\s+(?:SOLUTION|LACTATE))"
    r"(?:\s+SOLUTION)?",
    re.IGNORECASE,
)
_RINGER_FIX_RE = re.compile(r"RINGER[''`]?S?")

_DILUENT_KW = (
    r"diluent|solvent|reconstitution\s+fluid|sterile\s+water|"
    r"water\s+for\s+injection|w\.?f\.?i\.?"
)
_NUM = r"\d+(?:[.,]\d+)?"
# volume-capturing diluent patterns, tried in reference order
_DIL_VOL_RES = (
    # "+ X mL diluent"
    re.compile(rf"\+\s*({_NUM})\s*(m?L)\s*(?:{_DILUENT_KW})", re.IGNORECASE),
    # "+ X mL LYOPHILIZED POWDER + DILUENT"
    re.compile(
        rf"\+\s*({_NUM})\s*(m?L)\s+(?:LYOPHILIZED|FREEZE-?DRIED)\s+POWDER\s*\+\s*(?:{_DILUENT_KW})",
        re.IGNORECASE,
    ),
)
# "X mg/Y mL + Diluent" → Y is the diluent volume
_DIL_VOL_RATIO_RE = re.compile(
    rf"({_NUM})\s*(?:mg|g|mcg|iu)\s*/\s*({_NUM})\s*(m?L)\s*\+\s*(?:{_DILUENT_KW})",
    re.IGNORECASE,
)
_DIL_PRESENT_RES = (
    re.compile(rf"\+\s*(?:{_DILUENT_KW})", re.IGNORECASE),
    re.compile(rf"(?:LYOPHILIZED|FREEZE-?DRIED)\s+POWDER\s*\+\s*(?:{_DILUENT_KW})", re.IGNORECASE),
)
# Strip patterns, applied in reference order (tokenizer.py:480-591).
# DELIBERATELY BUG-COMPATIBLE: the reference splices the keyword
# alternation into several patterns WITHOUT a wrapping group, so regex
# alternation precedence makes the surrounding context (the '+ X mL'
# prefix, the '.*$' tail) bind only to the FIRST/LAST alternative —
# e.g. in pattern 1a3 a bare '+ diluent' matches via the first branch
# while a bare 'solvent' matches anywhere via a middle branch. Output
# parity requires reproducing that precedence, so these patterns are
# concatenated exactly as the reference concatenates them.
_STRIP_RES = (
    re.compile(rf"\s+(?:mono|multi)?dose\s+vial\s*\+\s*{_NUM}\s*m?L?\s*" + _DILUENT_KW + r".*$", re.IGNORECASE),
    re.compile(rf"\s+(?:LYOPHILIZED|FREEZE-?DRIED)\s+POWDER\s*\+\s*(?:{_DILUENT_KW}).*$", re.IGNORECASE),
    re.compile(
        rf"\s*\+\s*{_NUM}\s*m?L?\s+(?:LYOPHILIZED|FREEZE-?DRIED)\s+POWDER\s*\+\s*(?:{_DILUENT_KW}).*$",
        re.IGNORECASE,
    ),
    re.compile(rf"\s*\+\s*{_NUM}\s*m?L?\s+" + _DILUENT_KW, re.IGNORECASE),
)
_STRIP_DOSE_PLUS_DIL_RE = re.compile(
    rf"({_NUM}\s*(?:mg|g|mcg|iu|units?))\s*\+\s*{_NUM}\s*m?L?\s*" + _DILUENT_KW + r".*$",
    re.IGNORECASE,
)
_STRIP_TAIL_RES = (
    re.compile(
        r"\s*\+\s*" + _DILUENT_KW + r"\s+(?:SOLUTION|SUSPENSION|POWDER)?\s*(?:VIAL|AMPULE?|BOTTLE)?.*$",
        re.IGNORECASE,
    ),
    re.compile(r"\s*\+\s*" + _DILUENT_KW + r"(?:\s+(?:VIAL|AMPULE?|BOTTLE))?\s*", re.IGNORECASE),
    re.compile(rf"\s*\+\s*{_NUM}\s*m?L?\s*(?=\s|$)", re.IGNORECASE),
)
_VACCINE_POTENCY_RE = re.compile(
    rf"\s+{_NUM}\s*(?:DL|LD)(?:\s+\d+)?(?:\s+(?:mouse|mice))?\s*(?:min|minimum)?\s*",
    re.IGNORECASE,
)
_POTENCY_QUAL_RE = re.compile(rf"\s+not\s+less\s+than(?:\s+{_NUM}\s*(?:PFU)?)?\s*", re.IGNORECASE)
_FREEZE_DRIED_VIAL_RE = re.compile(
    r"\s+freeze-?dried\s+powder\s+(?:mono|multi)?dose\s+vial.*$", re.IGNORECASE
)
# Same unwrapped-alternation reproduction as _STRIP_RES above.
_PLUS_DILUENT_2_RE = re.compile(
    rf"\s*\+\s*(?:{_NUM}\s*(?:mL|g)\s+)?" + _DILUENT_KW, re.IGNORECASE
)
_DOSE_PLUS_DILUENT_3_RE = re.compile(
    rf"\b(?:\d+\s+)?dose\s*\+\s*(?:{_NUM}\s*m?L?\s+)?" + _DILUENT_KW, re.IGNORECASE
)
_SYRINGE_DILUENT_RE = re.compile(r"\s+(?:PRE-?FILLED\s+)?(?:SYRINGE\s+)?DILUENT\b", re.IGNORECASE)
_PACKAGING_RE = re.compile(
    r"\s+(?:mono|multi)?dose\s+(?:vial|ampoule?|syringe)(?:\s+SOLUTION\s+(?:VIAL|AMPOULE?|BOTTLE))?\s*$",
    re.IGNORECASE,
)
_TRAILING_FORM_RE = re.compile(
    r"\s+(?:SOLUTION|SUSPENSION|POWDER|FREEZE-?DRIED(?:\s+POWDER)?|LYOPHILIZED(?:\s+POWDER)?)"
    r"(?:\s+(?:VIAL|AMPOULE?|BOTTLE|DRUM|BAG))?\s*$",
    re.IGNORECASE,
)
_PCT_START_RE = re.compile(r"^(\d+(?:\.\d+)?)\s*%\s+(.+)$")
_SOLUTIONS_FOR_RE = re.compile(r"\bSOLUTIONS?\s+FOR\s+(\w+(?:\s+\w+){0,3})", re.IGNORECASE)
_DOSE_TAIL_RE = re.compile(r"\s+\d+(?:\.\d+)?\s*(?:MG|G|MCG|UG|IU|ML|L|UNITS?|%)", re.IGNORECASE)
_PAREN_RE = re.compile(r"\(([^)]+)\)")

TRAILING_SALT_SUFFIXES: tuple[str, ...] = (
    "SODIUM PHOSPHATE", "DISODIUM PHOSPHATE", "SODIUM SUCCINATE",
    "SODIUM SULFATE", "SODIUM CHLORIDE", "POTASSIUM PHOSPHATE",
    "CALCIUM PHOSPHATE", "MAGNESIUM SULFATE",
)


def _extract_iv_diluent(working: str) -> tuple[str | None, str | None]:
    m = _IV_DILUENT_RE.search(working)
    if not m:
        return None, None
    amount = m.group(1).strip() if m.group(1) else None
    dtype = _RINGER_FIX_RE.sub("RINGER'S", m.group(2).upper())
    if "SOLUTION" not in dtype and ("RINGER" in dtype or m.group(0).upper().endswith("SOLUTION")):
        if ("LACTATED" in dtype or "ACETATED" in dtype) and not dtype.endswith("SOLUTION"):
            dtype = dtype.rstrip() + " SOLUTION"
    return dtype.strip(), amount


def _extract_diluent_volumes(working: str) -> str | None:
    vols: list[str] = []
    for rx in _DIL_VOL_RES:
        for m in rx.finditer(working):
            v = m.group(1).replace(",", ".")
            vols.append(f"{v} L" if m.group(2).upper() == "L" else f"{v} mL")
    for m in _DIL_VOL_RATIO_RE.finditer(working):
        v = m.group(2).replace(",", ".")
        vols.append(f"{v} L" if m.group(3).upper() == "L" else f"{v} mL")
    if not vols and any(rx.search(working) for rx in _DIL_PRESENT_RES):
        vols.append("with diluent")
    return "|".join(vols) if vols else None


def _strip_noise(working: str) -> str:
    """The ordered strip cascade (tokenizer.py:480-591)."""
    for rx in _STRIP_RES[:3]:
        working = rx.sub("", working)
    working = _STRIP_RES[3].sub("", working)
    working = _STRIP_DOSE_PLUS_DIL_RE.sub(r"\1", working)
    for rx in _STRIP_TAIL_RES[:2]:
        working = rx.sub("", working)
    working = _STRIP_TAIL_RES[2].sub("", working)
    working = _VACCINE_POTENCY_RE.sub(" ", working)
    working = _POTENCY_QUAL_RE.sub(" ", working)
    working = _FREEZE_DRIED_VIAL_RE.sub("", working)
    working = _PLUS_DILUENT_2_RE.sub("", working)
    working = _DOSE_PLUS_DILUENT_3_RE.sub("", working)
    working = _SYRINGE_DILUENT_RE.sub("", working)
    working = _PACKAGING_RE.sub("", working)
    working = _TRAILING_FORM_RE.sub("", working)
    return working


_DETAIL_KEYS = (
    "generic_name", "salt_details", "brand_details", "indication_details",
    "alias_details", "type_details", "release_details", "form_details",
    "diluent_details", "iv_diluent_type", "iv_diluent_amount",
)

# Fast-path gate: one scan whose match is a NECESSARY condition for any
# of the expensive blocks (IV diluent, parens, diluent volumes, the
# strip cascade, indication, comma aliases) to change anything. A text
# like 'AMOXICILLIN 500 MG TABLET' — the overwhelmingly common shape —
# skips ~30 regex passes. False positives only cost the slow path;
# tests/fuzz pin that both paths agree with the reference.
# NB: the strip patterns inherit the reference's unwrapped-alternation
# precedence, so several keywords match as bare SUBSTRINGS — the
# trigger must be at least as permissive (substring alternation; word
# boundaries only where every consuming pattern has them).
_HOT_TRIGGER_RE = re.compile(
    r"[()+,%]"
    r"|diluent|solvent|reconstitution|sterile|wfi|w\.?f\.?i"
    r"|dose|vial|solution|suspension|powder|freeze|lyophil|ampoule|ampule"
    r"|dl|ld|not\s+less"
    r"|\b(?:in|for)\b",
    re.IGNORECASE,
)


def extract_drug_details_py(drug_name: str | None) -> dict:
    """F15: the full reference extraction (tokenizer.py:330-744)."""
    result: dict = {k: None for k in _DETAIL_KEYS}
    result.update(
        dose_values=None, dose_units=None, dose_types=None, total_volume_ml=None,
        drug_amount_mg=None, diluent_amount_mg=None, concentration_mg_per_ml=None,
    )
    if not drug_name or not drug_name.strip():
        result["generic_name"] = (drug_name or "").strip().upper()
        return result
    working = drug_name.strip()
    result["generic_name"] = working.upper()

    hot = bool(_HOT_TRIGGER_RE.search(working)) or working[:1].isdigit()
    if hot:
        result["iv_diluent_type"], result["iv_diluent_amount"] = _extract_iv_diluent(working)

        # leading percentage moves to dose position: '0.9% NaCl' → 'NaCl 0.9%'
        m = _PCT_START_RE.match(working)
        if m:
            working = f"{m.group(2)} {m.group(1)}%"

        working = re.sub(r"\(\s+", "(", working)
        working = re.sub(r"\s+\)", ")", working)

        result["diluent_details"] = _extract_diluent_volumes(working)
        working = _strip_noise(working)

        salt_hits = _SALT_PAREN_RE.findall(working)
        if salt_hits:
            result["salt_details"] = "|".join(s.strip().upper() for s in salt_hits)
            working = _SALT_PAREN_RE.sub("", working)

        ind = _INDICATION_RE.search(working)
        if ind:
            indication = ind.group(0).strip().upper()
            if any(mk in indication for mk in _INDICATION_MARKERS):
                result["indication_details"] = indication
                working = working[: ind.start()] + working[ind.end():]
        sol = _SOLUTIONS_FOR_RE.search(working)
        if sol and not result["indication_details"]:
            result["indication_details"] = sol.group(0).strip().upper()
            working = working[: sol.start()] + "SOLUTIONS" + working[sol.end():]

        aliases = []
        for paren in _PAREN_RE.findall(working):
            p = paren.strip().upper()
            if re.match(r"^\d+", p) or any(u in p for u in ("MG", "ML", "MCG", "IU", "%")):
                continue  # dose parenthetical
            if p.startswith("AS "):
                continue  # salt, already captured
            aliases.append(p)
        if aliases:
            result["alias_details"] = "|".join(aliases)
            for alias in aliases:
                working = re.sub(
                    r"\(\s*" + re.escape(alias) + r"\s*\)", "", working, flags=re.IGNORECASE
                )

        # comma tail = alias, unless it's a multi-ingredient list
        if "," in working and " + " not in working:
            first, _, rest = working.partition(",")
            is_multi = bool(re.search(r"\bAND\b", rest, re.IGNORECASE)) or "+" in rest
            if not is_multi:
                comma_details = [
                    p.strip().upper()
                    for p in rest.split(",")
                    if p.strip() and not re.match(r"^\d+", p.strip())
                ]
                if comma_details:
                    joined = "|".join(comma_details)
                    result["alias_details"] = (
                        result["alias_details"] + "|" + joined
                        if result["alias_details"]
                        else joined
                    )
                    working = first.strip()

    working = re.sub(r"\s+", " ", working).strip().upper()

    dose_tail = _DOSE_TAIL_RE.search(working)
    if dose_tail:
        working = working[: dose_tail.start()].strip()

    if result["indication_details"]:
        for suffix in (" SOLUTIONS", " SOLUTION"):
            if working.endswith(suffix):
                working = working[: -len(suffix)].strip()
                break

    for suffix in TRAILING_SALT_SUFFIXES:
        if working.endswith(" " + suffix):
            base = working[: -len(suffix) - 1].strip()
            if base and len(base) > 2:
                result["salt_details"] = (
                    result["salt_details"] + "|" + suffix if result["salt_details"] else suffix
                )
                working = base
                break

    if "+" in working and " + " not in working:
        working = re.sub(r"\s+", " ", re.sub(r"\+", " + ", working)).strip()

    result["generic_name"] = working if working else drug_name.strip().upper()

    # type / release / form details come from the ORIGINAL text
    _, result["type_details"] = extract_type_detail_py(drug_name)
    _, result["release_details"] = extract_release_detail_py(drug_name)
    if not result["release_details"]:
        _, result["form_details"] = extract_form_detail_py(drug_name)

    dose_info = parse_dose_components_py(drug_name)
    if dose_info["doses"]:
        result["dose_values"] = [d["value"] for d in dose_info["doses"]]
        result["dose_units"] = [d["unit"] for d in dose_info["doses"]]
        result["dose_types"] = [d["unit_type"] for d in dose_info["doses"]]
    if dose_info["total_volume_ml"]:
        result["total_volume_ml"] = dose_info["total_volume_ml"]

    if dose_info["percentages"] and dose_info["total_volume_ml"]:
        dil_pct = None
        if result["iv_diluent_amount"]:
            try:
                dil_pct = float(result["iv_diluent_amount"].replace("%", "").strip())
            except ValueError:
                pass
        iv = calculate_iv_amounts_py(
            dose_info["percentages"], dil_pct, dose_info["total_volume_ml"]
        )
        result["drug_amount_mg"] = iv["drug_amount_mg"]
        result["diluent_amount_mg"] = iv["diluent_amount_mg"]
        result["concentration_mg_per_ml"] = iv["concentration_mg_per_ml"]

    return result


DETAILS_SCHEMA = T.StructType(
    [
        T.StructField("generic_name", T.StringType()),
        T.StructField("salt_details", T.StringType()),
        T.StructField("brand_details", T.StringType()),
        T.StructField("indication_details", T.StringType()),
        T.StructField("alias_details", T.StringType()),
        T.StructField("type_details", T.StringType()),
        T.StructField("release_details", T.StringType()),
        T.StructField("form_details", T.StringType()),
        T.StructField("diluent_details", T.StringType()),
        T.StructField("iv_diluent_type", T.StringType()),
        T.StructField("iv_diluent_amount", T.StringType()),
        T.StructField("dose_values", T.ArrayType(T.DoubleType())),
        T.StructField("dose_units", T.ArrayType(T.StringType())),
        T.StructField("dose_types", T.ArrayType(T.StringType())),
        T.StructField("total_volume_ml", T.DoubleType()),
        T.StructField("drug_amount_mg", T.DoubleType()),
        T.StructField("diluent_amount_mg", T.DoubleType()),
        T.StructField("concentration_mg_per_ml", T.DoubleType()),
    ]
)


@F.pandas_udf(DETAILS_SCHEMA)
def extract_drug_details(s: pd.Series) -> pd.DataFrame:
    """Arrow-batched F15. One UDF crossing for the whole struct."""
    rows = [extract_drug_details_py(v) for v in s]
    return pd.DataFrame.from_records(rows, columns=[f.name for f in DETAILS_SCHEMA.fields])
