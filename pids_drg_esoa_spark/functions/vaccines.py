"""Vaccine canonicalization (F31) + IV/diluent classification (F35).

Reference parity targets:
- normalize_vaccine_name + acronym↔component bidirectional maps
  (unified_constants.py:1245-1707 — DTP family, PENTA/HEXA, MMR…)
- normalize_diluent (runners.py:382-414 F35 — WATER ≠ NORMAL_SALINE ≠
  HALF_SALINE ≠ RINGERS classes)
- input classification single/combination/iv_solution
  (tagger.py:915-920)

Vocabularies are data (representative WHO-style entries; grow by
edits). Python twins + broadcastable maps.
"""

from __future__ import annotations

import re

from .constants import DILUENT_CLASSES

# acronym → component list (lowercase), bidirectional lookups derive
# from this single table.
VACCINE_ACRONYMS: dict[str, tuple[str, ...]] = {
    "mmr": ("measles", "mumps", "rubella"),
    "dtp": ("diphtheria", "tetanus", "pertussis"),
    "dtap": ("diphtheria", "tetanus", "acellular pertussis"),
    "tdap": ("tetanus", "diphtheria", "acellular pertussis"),
    "dt": ("diphtheria", "tetanus"),
    "penta": ("diphtheria", "tetanus", "pertussis", "hepatitis b", "haemophilus influenzae type b"),
    "hexa": (
        "diphtheria", "tetanus", "pertussis", "hepatitis b",
        "haemophilus influenzae type b", "poliomyelitis",
    ),
    "bcg": ("bacillus calmette-guerin",),
    "hib": ("haemophilus influenzae type b",),
    "hpv": ("human papillomavirus",),
    "ipv": ("poliomyelitis inactivated",),
    "opv": ("poliomyelitis oral",),
    "pcv": ("pneumococcal conjugate",),
    "jev": ("japanese encephalitis",),
}

_VACCINE_MARKERS = ("vaccine", "vax", "immunization", "toxoid")

# pattern → canonical vaccine name (applied on normalized text)
VACCINE_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"\bmeasles\b.*\bmumps\b.*\brubella\b", "MEASLES + MUMPS + RUBELLA VACCINE"),
    (r"\bdiphtheria\b.*\btetanus\b.*\bpertussis\b", "DIPHTHERIA + TETANUS + PERTUSSIS VACCINE"),
    (r"\bhepatitis b\b", "HEPATITIS B VACCINE"),
    (r"\brabies\b", "RABIES VACCINE"),
    (r"\binfluenza\b", "INFLUENZA VACCINE"),
    (r"\bpneumococcal\b", "PNEUMOCOCCAL VACCINE"),
)


def is_vaccine_text_py(text: str | None) -> bool:
    if not text:
        return False
    s = text.lower()
    if any(m in s for m in _VACCINE_MARKERS):
        return True
    return bool(re.search(r"\b(" + "|".join(VACCINE_ACRONYMS) + r")\b", s))


def normalize_vaccine_name_py(text: str | None) -> str | None:
    """Canonical vaccine name: acronym expansion first, then component
    patterns; None when the text is not vaccine-like."""
    if not is_vaccine_text_py(text):
        return None
    s = text.lower()
    m = re.search(r"\b(" + "|".join(VACCINE_ACRONYMS) + r")\b", s)
    if m:
        comps = VACCINE_ACRONYMS[m.group(1)]
        return " + ".join(c.upper() for c in comps) + " VACCINE"
    for pat, canon in VACCINE_PATTERNS:
        if re.search(pat, s):
            return canon
    return text.upper().strip()


def vaccine_component_keys_py(text: str | None) -> list[str]:
    """Lookup keys for a vaccine text: the acronym AND its components
    (bidirectional — tagger.py key expansion stage)."""
    canon = normalize_vaccine_name_py(text)
    if canon is None:
        return []
    keys = [canon.lower()]
    base = canon.removesuffix(" VACCINE").lower()
    keys.extend(c for c in base.split(" + ") if c)
    for acr, comps in VACCINE_ACRONYMS.items():
        if tuple(base.split(" + ")) == comps:
            keys.append(acr)
    return keys


# ---------------------------------------------------------------------------
# F35 diluent classes + input classification
# ---------------------------------------------------------------------------
_DILUENT_PATTERNS = sorted(DILUENT_CLASSES.items(), key=lambda kv: -len(kv[0]))


def normalize_diluent_py(text: str | None) -> str | None:
    """F35: map a diluent mention to its canonical class. Longest
    pattern wins (so '0.45% sodium chloride' beats 'sodium chloride'
    → classes stay distinct, runners.py:382-414)."""
    if not text:
        return None
    s = re.sub(r"\s+", " ", text.lower()).strip()
    for pat, cls in _DILUENT_PATTERNS:
        if pat in s:
            return cls
    if re.search(r"\b\d+(\.\d+)?% sodium chloride\b", s):
        return "SALINE_OTHER"
    if re.search(r"\b\d+(\.\d+)?% dextrose\b", s):
        return "DEXTROSE_OTHER"
    return None


_IV_MARKERS = re.compile(
    r"\b(iv|intravenous|infusion|drip|bottle|bag)\b|\bd5|\bpnss\b|\bplain (nss|lr)\b", re.I
)


def classify_input_py(text: str | None, n_components: int) -> str:
    """Input classification (tagger.py:915-920): iv_solution ⊳
    combination ⊳ single — selection rules differ per class."""
    if text and (
        normalize_diluent_py(text) is not None
        or (
            _IV_MARKERS.search(text)
            and re.search(r"\b(dextrose|sodium chloride|ringers?|water)\b", text.lower())
        )
    ):
        return "iv_solution"
    if n_components >= 2:
        return "combination"
    return "single"
