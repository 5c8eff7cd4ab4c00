"""Part-4 typed dose keys (F34, runners.py:428-790).

The bridge compares doses by TYPED key, not raw text:
- ('mg', v)        simple mass, converted to mg
- ('conc', v)      concentration in mg/mL (ratio or IV w/v math)
- ('iu', v)        international units
- ('pct', v)       percent w/v
- ('combo', [v..]) multi-component doses — the Annex pipe format
                   '250|MG|125' (runners.py:479-483) and eSOA
                   'A + B 250mg + 125mg' alignments
Cross-type compatibility (runners.py:843-851): mg↔conc/combo compare
by total-mg with 1%-relative / 0.5 mg-absolute tolerance; same-type
compares exactly (isclose).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from .constants import UNIT_TO_MG
from .dose import parse_dose_py


@dataclass(frozen=True)
class DoseKey:
    kind: str  # 'mg' | 'conc' | 'iu' | 'pct' | 'combo' | 'none'
    values: tuple[float, ...] = ()


NONE_KEY = DoseKey("none")

_PIPE_RE = re.compile(r"(\d+(?:\.\d+)?)\s*\|\s*([A-Za-z]+)(?:\s*\|\s*(\d+(?:\.\d+)?))?")
_IU_RE = re.compile(r"(\d+(?:\.\d+)?)\s*(?:iu|units?)\b", re.I)
_MULTI_MG_RE = re.compile(r"(\d+(?:\.\d+)?)\s*(mg|g|mcg)\b", re.I)


def parse_annex_pipe_dose_py(desc: str | None) -> DoseKey:
    """Annex 'CO-AMOXICLAV 400|MG|57' pipe format → combo/mg key
    (parse_combo_dose, runners.py:479-483)."""
    if not desc:
        return NONE_KEY
    m = _PIPE_RE.search(desc)
    if not m:
        return NONE_KEY
    unit = m.group(2).lower()
    factor = UNIT_TO_MG.get(unit)
    if factor is None:
        return NONE_KEY
    first = float(m.group(1)) * factor
    if m.group(3) is not None:
        return DoseKey("combo", (first, float(m.group(3)) * factor))
    return DoseKey("mg", (first,))


def dose_key_py(text: str | None) -> DoseKey:
    """get_dose_key (runners.py:700-790 cascade): combo (multiple mass
    tokens) ⊳ iu ⊳ conc ⊳ mg ⊳ pct ⊳ none."""
    if not text:
        return NONE_KEY
    pipe = parse_annex_pipe_dose_py(text)
    if pipe.kind != "none":
        return pipe
    masses = _MULTI_MG_RE.findall(text)
    if len(masses) >= 2:
        vals = tuple(float(v) * UNIT_TO_MG[u.lower()] for v, u in masses)
        return DoseKey("combo", vals)
    d = parse_dose_py(text)
    if d.kind == "ratio":
        mg = (d.strength or 0) * UNIT_TO_MG.get(d.unit or "", float("nan"))
        if d.per_val and not math.isnan(mg):
            return DoseKey("conc", (mg / d.per_val,))
        return NONE_KEY
    if d.kind == "amount":
        if d.unit == "iu":
            return DoseKey("iu", (d.strength,))
        f = UNIT_TO_MG.get(d.unit or "")
        if f is not None:
            return DoseKey("mg", (d.strength * f,))
        return NONE_KEY
    if d.kind == "percent":
        return DoseKey("pct", (d.pct,))
    m = _IU_RE.search(text)
    if m:
        return DoseKey("iu", (float(m.group(1)),))
    return NONE_KEY


def _isclose_exact(a: float, b: float) -> bool:
    return math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-9)


def _isclose_tol(a: float, b: float) -> bool:
    """Part-4 cross-type tolerance: 1% relative or 0.5 mg absolute
    (runners.py:843-851)."""
    return math.isclose(a, b, rel_tol=0.01, abs_tol=0.5)


def dose_keys_match_py(a: DoseKey, b: DoseKey) -> bool:
    """doses_match (runners.py:792-957): same-type exact; mg↔combo by
    total; mg↔conc by value with Part-4 tolerance."""
    if a.kind == "none" or b.kind == "none":
        return False
    if a.kind == b.kind:
        if len(a.values) != len(b.values):
            if {a.kind, b.kind} == {"combo"}:
                return _isclose_tol(sum(a.values), sum(b.values))
            return False
        return all(_isclose_exact(x, y) for x, y in zip(sorted(a.values), sorted(b.values)))
    kinds = {a.kind, b.kind}
    if kinds == {"mg", "combo"}:
        return _isclose_tol(sum(a.values), sum(b.values))
    if kinds == {"mg", "conc"}:
        return _isclose_tol(a.values[0], b.values[0])
    return False
