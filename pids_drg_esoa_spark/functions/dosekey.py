"""Part-4 typed dose keys (F34, reference runners.py:409-957).

The bridge compares doses by TYPED key, not raw text. Key kinds (the
reference's ``get_dose_key`` tuples, runners.py:725-790):

- ('mg',   amount)                 simple mass, converted to mg
- ('iu',   amount)                 international units
- ('conc', conc, vol, unit)        per-mL concentration; unit is the
                                   source type 'mg' | 'iu' | 'pct' |
                                   'combo' — iu-concentrations only
                                   match iu keys
- ('iv',   conc, vol, diluent)     IV solutions: concentration +
                                   normalized diluent class + volume,
                                   ZERO tolerance
- none                             no dose information

Inference heuristics (runners.py:764-790): plain NSS → 0.9 % (9
mg/mL), D5 → 5 % (50 mg/mL), D10 → 10 % (100 mg/mL), each only when
the text itself carries no '%'. The 9 %→0.9 % saline typo fix lives in
the percent branch of ``parse_dose_to_mg_py`` (runners.py:716-718).

Matching (``doses_match``, runners.py:792-957): iv↔iv exact on all
three parts; iu↔iu exact; mg↔mg with 0.5 mg abs / 1 % rel tolerance;
conc↔conc with 0.1 mg/mL abs / 1 % rel and unit-type compatibility;
mg↔conc and iu↔conc via conc·vol total (1 mL implied when no volume).

Structured columns come from the F15 details struct
(functions/details.py) exactly as the reference feeds
``extract_drug_details`` outputs into ``get_dose_key``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .details import extract_drug_details_py

UNIT_TO_MG: dict[str, float] = {
    "MG": 1.0,
    "G": 1000.0,
    "GM": 1000.0,
    "GRAM": 1000.0,
    "MCG": 0.001,
    "UG": 0.001,
    "MICROGRAM": 0.001,
    "KG": 1_000_000.0,
}


# Part-4 diluent classes (runners.py:382-414): EXACT lookup, raw
# uppercase string when unknown (never None — 'LACTATED RINGER'S
# SOLUTION' compares as itself on both sides). Water ≠ saline ≠
# half-saline; lactated ≠ acetated Ringer's.
DILUENT_EQUIVALENTS: dict[str, str] = {
    "WATER": "WATER",
    "WATER FOR INJECTION": "WATER",
    "STERILE WATER": "WATER",
    "WFI": "WATER",
    "SODIUM CHLORIDE": "NORMAL_SALINE",
    "NORMAL SALINE": "NORMAL_SALINE",
    "NS": "NORMAL_SALINE",
    "0.9% SODIUM CHLORIDE": "NORMAL_SALINE",
    "0.9% NACL": "NORMAL_SALINE",
    "0.45% SODIUM CHLORIDE": "HALF_SALINE",
    "0.45% NACL": "HALF_SALINE",
    "HALF NORMAL SALINE": "HALF_SALINE",
    "LACTATED RINGER'S": "LACTATED_RINGERS",
    "LACTATED RINGERS": "LACTATED_RINGERS",
    "LR": "LACTATED_RINGERS",
    "RL": "LACTATED_RINGERS",
    "ACETATED RINGER'S": "ACETATED_RINGERS",
    "ACETATED RINGERS": "ACETATED_RINGERS",
    "AR": "ACETATED_RINGERS",
}


def part4_normalize_diluent_py(diluent: str | None) -> str | None:
    if not diluent:
        return None
    d = str(diluent).upper().strip()
    return DILUENT_EQUIVALENTS.get(d, d)


@dataclass(frozen=True)
class DoseKey:
    kind: str  # 'mg' | 'iu' | 'conc' | 'iv' | 'none'
    amount: float | None = None  # mg or iu total ('mg'/'iu' kinds)
    conc: float | None = None  # per-mL value ('conc'/'iv' kinds)
    vol: float | None = None  # volume in mL
    unit: str | None = None  # conc source type: 'mg'|'iu'|'pct'|'combo'
    diluent: str | None = None  # normalized diluent class ('iv' kind)


NONE_KEY = DoseKey("none")

_NUM = r"\d+(?:\.\d+)?"
_CONC_SKIP_RE = re.compile(r"\d+\s*(MG|G|MCG)?\s*/\s*\d*\s*M?L\b")
_COMBO_PLUS_RE = re.compile(rf"({_NUM})\s*(MG|G|MCG)\s*\+\s*({_NUM})\s*(MG|G|MCG)?")
_COMBO_SLASH_RE = re.compile(rf"^({_NUM})\s*(MG|G|MCG)\s*/\s*({_NUM})\s*(MG|G|MCG)$")
_INT_RE = re.compile(rf"^{_NUM}$")


def parse_combo_dose_py(dose_str: str | None) -> tuple[list[float] | None, float | None, float | None]:
    """Combination doses: '500MG+125MG', '500MG/125MG', Annex pipe
    walks like '400|MG|57|ML|35' with the vial-size skip ('250|MG|1|G'
    is 250 mg in a 1 g vial, not a combo) — runners.py:428-544.

    Returns (component_mgs, total_mg, bottle_volume_ml) or Nones.
    """
    if not dose_str or not str(dose_str).strip():
        return None, None, None
    s = str(dose_str).upper().strip()

    # concentrations are not combos
    if _CONC_SKIP_RE.search(s):
        return None, None, None

    plus_hits = _COMBO_PLUS_RE.findall(s)
    if plus_hits:
        comps: list[float] = []
        for v1, u1, v2, u2 in plus_hits:
            comps.append(float(v1) * UNIT_TO_MG.get(u1, 1.0))
            comps.append(float(v2) * UNIT_TO_MG.get(u2 or u1, 1.0))
        if comps:
            return comps, sum(comps), None

    m = _COMBO_SLASH_RE.match(s)
    if m:
        a = float(m.group(1)) * UNIT_TO_MG.get(m.group(2), 1.0)
        b = float(m.group(3)) * UNIT_TO_MG.get(m.group(4), 1.0)
        return [a, b], a + b, None

    # Annex pipe walk: numbers classified by the token that follows
    parts = s.replace(" ", "").split("|")
    doses: list[float] = []
    bottle_vol: float | None = None
    last_was_dose = False
    last_unit: str | None = None
    i = 0
    while i < len(parts):
        part = parts[i]
        if _INT_RE.match(part):
            num = float(part)
            if i + 1 < len(parts):
                nxt = parts[i + 1]
                if nxt in ("MG", "G", "MCG"):
                    # '250|MG|1|G': a small G after an MG dose is the
                    # vial size, not a second component
                    if last_unit == "MG" and nxt == "G" and num <= 10:
                        i += 2
                        continue
                    doses.append(num * UNIT_TO_MG.get(nxt, 1.0))
                    last_was_dose = True
                    last_unit = nxt
                    i += 2
                    continue
                elif nxt == "ML":
                    # '400|MG|57|ML': 57 right after a dose is the
                    # second component (per-5mL suspension), not volume
                    if last_was_dose and num < 1000:
                        doses.append(num)
                        last_was_dose = True
                        i += 2
                        continue
                    bottle_vol = num
                    last_was_dose = False
                    i += 2
                    continue
            if i > 0 and parts[i - 1] in ("MG", "G", "MCG"):
                if i + 1 < len(parts) and parts[i + 1] == "G":
                    i += 2  # vial size
                    continue
                doses.append(num)
                last_was_dose = True
                i += 1
                continue
        else:
            last_was_dose = False
            last_unit = None
        i += 1

    if len(doses) >= 2:
        return doses, sum(doses), bottle_vol
    return None, None, None


_IU_CONC_RE = re.compile(rf"({_NUM})\s*I\.?U\.?\s*/\s*(ML|L)")
_IU_DOSE_VOL_RE = re.compile(rf"({_NUM})\s*I\.?U\.?\s*/\s*({_NUM})\s*(ML|L)")
_IU_SIMPLE_RE = re.compile(rf"({_NUM})\s*I\.?U\.?\b")
_CONC_RE = re.compile(rf"({_NUM})\s*(MG|G|MCG|UG)/\s*(ML|L)")
_DOSE_VOL_RE = re.compile(rf"({_NUM})\s*(MG|G|MCG|UG)\s*/\s*({_NUM})\s*(ML|L)")
_SIMPLE_RE = re.compile(rf"({_NUM})\s*(MG|G|GM|GRAM|MCG|UG|MICROGRAM)\b")
_ANNEX_SIMPLE_RE = re.compile(rf"^({_NUM})\s+(MG|G|MCG|UG)\s*$")
_BARE_NUM_RE = re.compile(rf"^({_NUM})\s*(?:$|[^A-Z0-9]|TAB|CAP|TABLET|CAPSULE)")
# Free-text Pattern 3c (runners.py:684-694): the reference receives an
# ISOLATED dose column ('FLANAX 275' arrives as '275'), so its
# start-anchored bare-number match fires; from full text the anchor
# never does. Lift the first standalone numeric token instead — not
# welded into a word ('GEN10' stays out via the lookbehind), not the
# numerator of a unit/ratio expression (those belong to the earlier
# cascade stages; the unit alternatives carry a word boundary so '275
# GENERIC' is not vetoed by the G-for-grams branch).
_BARE_TOKEN_RE = re.compile(
    rf"(?<![A-Z0-9.])({_NUM})"
    rf"(?!\s*(?:(?:MG|GM|GRAM|MCG|UG|MICROGRAM|ML|CC|G|L)\b|I\.?U|%|/|\d))"
    rf"\s*(?:$|TAB|CAP|[^A-Z0-9.])"
)
_VOL_RE = re.compile(rf"({_NUM})\s*(ML|L|CC)\b")
_PCT_RE = re.compile(r"(\d*\.?\d+)\s*%")


def parse_dose_to_mg_py(
    dose_str: str | None,
) -> tuple[float | None, float | None, float | None, str | None]:
    """The full normalization cascade (runners.py:546-723).

    Returns (total_dose_mg, concentration_mg_per_ml, volume_ml,
    unit_type) where unit_type ∈ {'mg','iu','pct','combo',None}.
    """
    if not dose_str or not str(dose_str).strip():
        return None, None, None, None
    s = str(dose_str).upper().strip()

    combo_comps, combo_total, combo_vol = parse_combo_dose_py(s)
    if combo_total is not None:
        return combo_total, None, combo_vol, "combo"

    s = s.replace("|", " ")
    s = re.sub(r"\s+", " ", s)
    # '200 000' → '200000'. The reference joins ANY digit pair (its
    # input is an isolated dose column); from full text that would glue
    # 'D5 500ML' or 'GEN10 200' into one number, so only digit runs NOT
    # attached to letters join — iterated to a fixpoint so
    # '1 000 000' still collapses fully.
    while True:
        joined = re.sub(r"(?<![A-Za-z0-9])(\d+)\s+(\d)", r"\1\2", s)
        if joined == s:
            break
        s = joined

    total_dose = concentration = volume_ml = None
    unit_type: str | None = None

    m = _IU_CONC_RE.search(s)
    if m:
        val = float(m.group(1))
        concentration = val / 1000.0 if m.group(2) == "L" else val
        unit_type = "iu"
    m = _IU_DOSE_VOL_RE.search(s)
    if m:
        total_dose = float(m.group(1))
        vol = float(m.group(2))
        volume_ml = vol * 1000.0 if m.group(3) == "L" else vol
        if volume_ml and volume_ml > 0:
            concentration = total_dose / volume_ml
        unit_type = "iu"
    if unit_type is None:
        m = _IU_SIMPLE_RE.search(s)
        if m:
            total_dose = float(m.group(1))
            unit_type = "iu"

    if unit_type is None:
        m = _CONC_RE.search(s)
        if m:
            mg_val = float(m.group(1)) * UNIT_TO_MG.get(m.group(2), 1.0)
            concentration = mg_val / 1000.0 if m.group(3) == "L" else mg_val
            unit_type = "mg"

    if unit_type is None or unit_type == "mg":
        m = _DOSE_VOL_RE.search(s)
        if m:
            total_dose = float(m.group(1)) * UNIT_TO_MG.get(m.group(2), 1.0)
            denom = float(m.group(3)) * (1000.0 if m.group(4) == "L" else 1.0)
            if denom > 0:
                concentration = total_dose / denom
            unit_type = "mg"
            # '250MG/5ML 60ML': a volume AFTER the ratio is the bottle
            tail = s[m.end():]
            bm = re.search(rf"({_NUM})\s*(ML|L)\b", tail)
            if bm:
                volume_ml = float(bm.group(1)) * (1000.0 if bm.group(2) == "L" else 1.0)
            else:
                volume_ml = denom

    if total_dose is None and concentration is None and unit_type is None:
        m = _SIMPLE_RE.search(s)
        if m:
            total_dose = float(m.group(1)) * UNIT_TO_MG.get(m.group(2), 1.0)
            unit_type = "mg"

    if total_dose is None and concentration is None and unit_type is None:
        m = _ANNEX_SIMPLE_RE.match(s)
        if m:
            total_dose = float(m.group(1)) * UNIT_TO_MG.get(m.group(2), 1.0)
            unit_type = "mg"

    if total_dose is None and concentration is None and unit_type is None:
        # exact reference shape on isolated dose strings, lifted-token
        # fallback on free text ('FLANAX 275'-style rows, Pattern 3c)
        m = _BARE_NUM_RE.match(s) or _BARE_TOKEN_RE.search(s)
        if m:
            val = float(m.group(1))
            if 0.1 <= val <= 10000:  # plausible tablet range ⇒ assume mg
                total_dose = val
                unit_type = "mg"

    if volume_ml is None:
        hits = list(_VOL_RE.finditer(s))
        if hits:
            last = hits[-1]  # last volume mention is the bottle size
            v = float(last.group(1))
            volume_ml = v * 1000.0 if last.group(2) == "L" else v

    if total_dose is None and concentration is None and unit_type is None:
        m = _PCT_RE.search(s)
        if m:
            pct = float(m.group(1))
            if pct == 9:
                pct = 0.9  # '.9%' mis-parsed as 9% — always saline
            concentration = pct * 10.0  # w/v: X% = X g/100 mL = 10·X mg/mL
            unit_type = "pct"

    return total_dose, concentration, volume_ml, unit_type


_NSS_KEYWORDS = ("PNSS", "NSS", "PLAIN NSS", "NORMAL SALINE", "N/S")
_D5_RE = re.compile(r"\bD5\b")
_D10_RE = re.compile(r"\bD10\b")

# The reference feeds get_dose_key a pre-extracted `dose` COLUMN (the
# Annex pipe format '400|MG|57'); we work from full description text,
# so lift the contiguous pipe-joined token run out first — the combo
# walk needs it isolated ('|'-splitting a whole sentence glues words
# onto the numbers).
_PIPE_RUN_RE = re.compile(r"[\w.%]+(?:\s*\|\s*[\w.%]+)+")

# F23 composition (parse_combo_doses, tokenizer.py:1438-1512): in the
# reference, '+'-separated dose tokens were already gathered into a
# dose column ('250MG+125MG') before get_dose_key ran; from free text
# ('AMOX 250 mg + CLAV 125 mg') we gather one mass token per
# '+'-separated segment — doses correspond to components in order.
_SEG_MASS_RE = re.compile(rf"({_NUM})\s*(MG|G|MCG|UG)\b")


def _segment_combo_total(text_upper: str) -> float | None:
    if "+" not in text_upper or _CONC_SKIP_RE.search(text_upper):
        return None
    seg_doses = [
        float(m.group(1)) * UNIT_TO_MG.get(m.group(2), 1.0)
        for seg in text_upper.split("+")
        if (m := _SEG_MASS_RE.search(seg))
    ]
    if len(seg_doses) >= 2:
        return sum(seg_doses)
    return None


def dose_key_py(
    text: str | None,
    generic: str | None = None,
    details: dict | None = None,
    desc: str | None = None,
) -> DoseKey:
    """``get_dose_key`` (runners.py:725-790): structured F15 columns
    first (IV w/v math), then the parse cascade, then NSS/D5/D10
    inference from description+generic context. Pass ``details`` when
    the caller already ran the F15 extractor — it is the expensive
    step and must not run twice per row.

    Two input modes, mirroring the reference:
    - column mode (``desc`` given): ``text`` is the Part-2/3 dose
      TOKEN STRING (pipe-joined, e.g. '10|50|MG') exactly as the
      reference's get_dose_key receives row['dose']; the parse cascade
      runs on it verbatim and the NSS/D5 context scans use ``desc``.
    - free-text mode (``desc`` None): ``text`` is a full description;
      the pipe run is lifted out and '+'-segment combo totals are
      gathered before the cascade (this repo's planted-oracle path)."""
    if not text and not (desc and details):
        return NONE_KEY
    det = details if details is not None else extract_drug_details_py(desc or text)

    if det["iv_diluent_type"]:
        return DoseKey(
            "iv",
            conc=det["concentration_mg_per_ml"],
            vol=det["total_volume_ml"],
            diluent=part4_normalize_diluent_py(det["iv_diluent_type"]),
        )
    if det["drug_amount_mg"]:
        if det["concentration_mg_per_ml"]:
            return DoseKey(
                "conc", conc=det["concentration_mg_per_ml"], vol=det["total_volume_ml"], unit="mg"
            )
        return DoseKey("mg", amount=det["drug_amount_mg"])

    if desc is not None:
        dose_str = text
        combo_total = None
    else:
        pipe_run = _PIPE_RUN_RE.search(text)
        dose_str = pipe_run.group(0) if pipe_run else text
        combo_total = None if pipe_run else _segment_combo_total(text.upper())
    if combo_total is not None:
        return DoseKey("mg", amount=combo_total)
    total, conc, vol, unit_type = parse_dose_to_mg_py(dose_str)
    if conc is not None:
        return DoseKey("conc", conc=conc, vol=vol, unit=unit_type)
    if total is not None:
        if unit_type == "iu":
            return DoseKey("iu", amount=total)
        return DoseKey("mg", amount=total)

    context = (desc if desc is not None else text or "").upper()
    gen = (generic or "").upper()
    if vol is not None and vol > 0:
        # the reference's %-veto looks at the DOSE STRING, not the
        # description (runners.py:774,781,787: `"%" not in dose_str`)
        no_pct = "%" not in (text or "")
        is_nss = any(kw in context for kw in _NSS_KEYWORDS) or (
            "SODIUM CHLORIDE" in gen and "DEXTROSE" not in gen
        )
        if is_nss and no_pct:
            return DoseKey("conc", conc=9.0, vol=vol, unit="pct")
        if (_D5_RE.search(context) or "5% DEXTROSE" in context) and "DEXTROSE" in gen and no_pct:
            return DoseKey("conc", conc=50.0, vol=vol, unit="pct")
        if (_D10_RE.search(context) or "10% DEXTROSE" in context) and "DEXTROSE" in gen and no_pct:
            return DoseKey("conc", conc=100.0, vol=vol, unit="pct")
    return NONE_KEY


def dose_keys_match_py(a: DoseKey, b: DoseKey) -> bool:
    """``doses_match`` (runners.py:792-957), branch for branch."""
    if a.kind == "none" or b.kind == "none":
        return False

    if a.kind == "iv" or b.kind == "iv":
        if a.kind != b.kind:
            return False
        if a.conc != b.conc:
            return False
        if a.diluent != b.diluent:
            return False
        if a.vol is not None and b.vol is not None and a.vol != b.vol:
            return False
        return True

    if a.kind == "iu" and b.kind == "iu":
        return a.amount == b.amount
    # a single 'iu' side falls through: iu↔conc is handled below,
    # iu↔mg falls off the end (no match)

    if a.kind == "mg" and b.kind == "mg":
        if a.amount is None or b.amount is None:
            return a.amount == b.amount
        diff = abs(a.amount - b.amount)
        return diff <= 0.5 or diff / max(a.amount, b.amount, 1.0) <= 0.01

    if a.kind == "conc" and b.kind == "conc":
        a_unit = a.unit or "mg"
        b_unit = b.unit or "mg"
        if (a_unit == "iu") != (b_unit == "iu"):
            return False
        if a.conc is None or b.conc is None:
            return a.conc == b.conc
        diff = abs(a.conc - b.conc)
        if diff > 0.1 and diff / max(a.conc, b.conc, 1.0) > 0.01:
            return False
        # volume is packaging, not identity: 5 mL and 10 mL vials of
        # 100 mg/mL are the same drug
        return True

    kinds = {a.kind, b.kind}
    if kinds == {"mg", "conc"}:
        mg_side, conc_side = (a, b) if a.kind == "mg" else (b, a)
        if (conc_side.unit or "mg") == "iu":
            return False
        if conc_side.vol is not None and conc_side.vol > 0:
            if abs(conc_side.conc * conc_side.vol - mg_side.amount) < 0.01:
                return True
        if abs(conc_side.conc - mg_side.amount) < 0.01:  # 1 mL implied
            return True
        return False

    if kinds == {"iu", "conc"}:
        iu_side, conc_side = (a, b) if a.kind == "iu" else (b, a)
        if conc_side.unit != "iu":
            return False
        if conc_side.vol is not None and conc_side.vol > 0:
            if abs(conc_side.conc * conc_side.vol - iu_side.amount) < 0.01:
                return True
        if abs(conc_side.conc - iu_side.amount) < 0.01:
            return True
        return False

    return False


# ---------------------------------------------------------------------------
# F23: combination dose ↔ generic alignment (reference
# parse_combo_doses / format_combo_doses, tokenizer.py:1438-1531).
# Doses separated by +, /, | correspond to the combination's generics
# in order; a trailing volume token is the bottle, not a component.
# ---------------------------------------------------------------------------

_ALIGN_DOSE_RE = re.compile(r"(\d+(?:[.,]\d+)?)\s*(MG|G|MCG|UG|IU|ML|%)")


def parse_combo_doses_py(text: str, generics: list[str]) -> dict[str, str]:
    if not generics:
        return {}
    up = text.upper()
    hits = list(_ALIGN_DOSE_RE.finditer(up))
    if not hits:
        return {}
    doses: list[str] = []
    prev_end = 0
    for m in hits:
        # a dose immediately feeding a '/... mL' tail is a
        # concentration denominator, not a component dose
        if prev_end > 0 and "/" in up[prev_end:m.start()] and "ML" in up[m.end():m.end() + 5]:
            continue
        doses.append(f"{m.group(1).replace(',', '.')}{m.group(2)}")
        prev_end = m.end()
    gens = [g.upper() for g in generics]
    if len(doses) == len(gens):
        return dict(zip(gens, doses))
    if len(doses) > len(gens):
        # dose/volume tail: the last token is the bottle volume
        if doses[-1].endswith("ML") or doses[-1].endswith("L"):
            return dict(zip(gens, doses[: len(gens)]))
    return {g: doses[i] for i, g in enumerate(gens) if i < len(doses)}


def format_combo_doses_py(generics: list[str], dose_map: dict[str, str]) -> str:
    if not dose_map:
        return ""
    parts = [f"{g.upper()} {dose_map[g.upper()]}" for g in generics if g.upper() in dose_map]
    return "|".join(parts)
