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

# ---------------------------------------------------------------------------
# F31 vaccine vocabulary — data port of the reference's tables
# (unified_constants.py:1245-1707). Kept as data per SURVEY §7; the
# functions below reproduce the reference's EXACT semantics, including
# the substring component scan (normalize_vaccine_components at
# :1619-1636 uses plain `in` — so 'FLUCONAZOLE' matches the FLU →
# INFLUENZA keyword; behavior preserved for row-level parity).
# ---------------------------------------------------------------------------

# canonical name → match patterns (substring OR regex) for texts that
# contain VACCINE/TOXOID (unified_constants.py:1245-1379).
VACCINE_CANONICAL: dict[str, tuple[str, ...]] = {
    "BCG VACCINE": ("BCG VACCINE", "BACILLUS CALMETTE-GUERIN", "BACILLUS CALMETTE GUERIN"),
    "HEPATITIS A VACCINE": ("HEPATITIS A INACTIVATED VACCINE", "HEPATITIS A VACCINE"),
    "HEPATITIS B VACCINE": ("HEPATITIS B VACCINE", "HEPATITIS B RECOMBINANT"),
    "HEPATITIS A + B VACCINE": ("HEPATITIS A + B VACCINE", "HEPATITIS A AND B VACCINE"),
    "DTP VACCINE": (
        "DIPHTHERIA-TETANUS TOXOIDS AND PERTUSSIS VACCINE",
        "DIPHTHERIA-TETANUS TOXOIDS AND ACELLULAR PERTUSSIS VACCINE",
        "DIPHTHERIA, TETANUS, PERTUSSIS",
    ),
    "DT VACCINE": ("DIPHTHERIA-TETANUS TOXOIDS",),
    "DTP + HIB VACCINE": ("DTP + HIB", "DTAP + HIB", "DTP-HIB"),
    "DTP + HEPATITIS B VACCINE": ("DTP + HEPATITIS B VACCINE", "DTAP + HEPATITIS B"),
    "DTP + IPV VACCINE": ("DTP + INACTIVATED POLIO VACCINE", "DTP + IPV", "DTAP + IPV"),
    "DTP + IPV + HIB VACCINE": ("DTP + IPV + HIB", "DTAP + IPV + HIB"),
    "IPV VACCINE": ("INACTIVATED POLIOMYELITIS VACCINE", "INACTIVATED POLIO VACCINE", "IPV"),
    "OPV VACCINE": (
        "ORAL POLIO VACCINE", "LIVE ATTENUATED TRIVALENT ORAL POLIO VACCINE", "OPV",
    ),
    "MEASLES VACCINE": ("LIVE ATTENUATED MEASLES VACCINE", "MEASLES VACCINE"),
    "MUMPS VACCINE": ("LIVE ATTENUATED MUMPS VACCINE", "MUMPS VACCINE"),
    "RUBELLA VACCINE": ("LIVE ATTENUATED RUBELLA VACCINE", "RUBELLA VACCINE"),
    "MMR VACCINE": (
        "LIVE ATTENUATED MEASLES, MUMPS, AND RUBELLA", "MMR VACCINE",
        "MEASLES, MUMPS, AND RUBELLA VACCINE", "MMR",
    ),
    "VARICELLA VACCINE": (
        "LIVE ATTENUATED VARICELLA VACCINE", "VARICELLA VACCINE", "CHICKENPOX VACCINE",
    ),
    "PNEUMOCOCCAL VACCINE": (
        "PNEUMOCOCCAL CONJUGATE VACCINE", "PNEUMOCOCCAL POLYVALENT VACCINE",
        "PNEUMOCOCCAL POLYSACCHARIDE",
    ),
    "MENINGOCOCCAL VACCINE": (
        "MENINGOCOCCAL POLYSACCHARIDE", "MENINGOCOCCAL CONJUGATE", "NEISSERIA MENINGITIDIS",
    ),
    "HIB VACCINE": (
        "HEMOPHILUS INFLUENZAE TYPE B", "HIB CONJUGATED VACCINE", "HAEMOPHILUS INFLUENZAE",
    ),
    "INFLUENZA VACCINE": (
        "INFLUENZA VACCINE", "INFLUENZA POLYVALENT VACCINE", "SPLIT VIRION",
    ),
    "ROTAVIRUS VACCINE": ("LIVE ATTENUATED ROTAVIRUS", "ROTAVIRUS VACCINE"),
    "RABIES VACCINE": ("RABIES CHICK EMBRYO CELL", "RABIES VACCINE", "PURIFIED INACTIVATED"),
    "YELLOW FEVER VACCINE": ("YELLOW FEVER VACCINE",),
    "HPV VACCINE": (
        "HUMAN PAPILLOMAVIRUS", "HPV VACCINE", "QUADRIVALENT", "BIVALENT", "NONAVALENT",
    ),
    "TYPHOID VACCINE": ("TYPHOID VACCINE", "SALMONELLA TYPHI"),
    "JAPANESE ENCEPHALITIS VACCINE": ("JAPANESE ENCEPHALITIS VACCINE", "JE VACCINE"),
    "PENTAVALENT VACCINE": ("DIPHTHERIA, TETANUS, PERTUSSIS, HEPATITIS B.*HAEMOPHILUS",),
}

# acronym → component antigens (unified_constants.py:1449-1533)
VACCINE_ACRONYM_TO_COMPONENTS: dict[str, tuple[str, ...]] = {
    "BCG": ("BACILLUS CALMETTE-GUERIN",),
    "D": ("DIPHTHERIA",),
    "T": ("TETANUS",),
    "P": ("PERTUSSIS",),
    "AP": ("ACELLULAR PERTUSSIS",),
    "WP": ("WHOLE-CELL PERTUSSIS",),
    "HIB": ("HAEMOPHILUS INFLUENZAE TYPE B",),
    "HEPB": ("HEPATITIS B",),
    "HEPA": ("HEPATITIS A",),
    "IPV": ("INACTIVATED POLIO", "INACTIVATED POLIOVIRUS", "INACTIVATED POLIOMYELITIS"),
    "OPV": ("ORAL POLIO", "ORAL POLIOVIRUS", "LIVE ATTENUATED POLIO"),
    "MV": ("MEASLES",),
    "MR": ("MEASLES", "RUBELLA"),
    "MMR": ("MEASLES", "MUMPS", "RUBELLA"),
    "MMRV": ("MEASLES", "MUMPS", "RUBELLA", "VARICELLA"),
    "VAR": ("VARICELLA",),
    "VZV": ("VARICELLA", "VARICELLA-ZOSTER"),
    "RV": ("ROTAVIRUS",),
    "PCV": ("PNEUMOCOCCAL CONJUGATE",),
    "PPSV": ("PNEUMOCOCCAL POLYSACCHARIDE",),
    "FLU": ("INFLUENZA",),
    "IIV": ("INACTIVATED INFLUENZA",),
    "LAIV": ("LIVE ATTENUATED INFLUENZA",),
    "HPV": ("HUMAN PAPILLOMAVIRUS",),
    "YF": ("YELLOW FEVER",),
    "JE": ("JAPANESE ENCEPHALITIS",),
    "RAB": ("RABIES",),
    "TYP": ("TYPHOID",),
    "MEN": ("MENINGOCOCCAL",),
    "DT": ("DIPHTHERIA", "TETANUS"),
    "TD": ("TETANUS", "DIPHTHERIA"),
    "DP": ("DIPHTHERIA", "PERTUSSIS"),
    "TP": ("TETANUS", "PERTUSSIS"),
    "DTP": ("DIPHTHERIA", "TETANUS", "PERTUSSIS"),
    "DTAP": ("DIPHTHERIA", "TETANUS", "ACELLULAR PERTUSSIS"),
    "DTWP": ("DIPHTHERIA", "TETANUS", "WHOLE-CELL PERTUSSIS"),
    "TDAP": ("TETANUS", "DIPHTHERIA", "ACELLULAR PERTUSSIS"),
    "DTP-HIB": ("DIPHTHERIA", "TETANUS", "PERTUSSIS", "HAEMOPHILUS INFLUENZAE TYPE B"),
    "DTP-HEPB": ("DIPHTHERIA", "TETANUS", "PERTUSSIS", "HEPATITIS B"),
    "DTP-IPV": ("DIPHTHERIA", "TETANUS", "PERTUSSIS", "INACTIVATED POLIO"),
    "DTAP-HIB": (
        "DIPHTHERIA", "TETANUS", "ACELLULAR PERTUSSIS", "HAEMOPHILUS INFLUENZAE TYPE B",
    ),
    "DTAP-HEPB": ("DIPHTHERIA", "TETANUS", "ACELLULAR PERTUSSIS", "HEPATITIS B"),
    "DTAP-IPV": ("DIPHTHERIA", "TETANUS", "ACELLULAR PERTUSSIS", "INACTIVATED POLIO"),
    "PENTA": (
        "DIPHTHERIA", "TETANUS", "PERTUSSIS", "HEPATITIS B",
        "HAEMOPHILUS INFLUENZAE TYPE B",
    ),
    "DTP-HEPB-HIB": (
        "DIPHTHERIA", "TETANUS", "PERTUSSIS", "HEPATITIS B",
        "HAEMOPHILUS INFLUENZAE TYPE B",
    ),
    "DTP-IPV-HIB": (
        "DIPHTHERIA", "TETANUS", "PERTUSSIS", "INACTIVATED POLIO",
        "HAEMOPHILUS INFLUENZAE TYPE B",
    ),
    "DTAP-HEPB-HIB": (
        "DIPHTHERIA", "TETANUS", "ACELLULAR PERTUSSIS", "HEPATITIS B",
        "HAEMOPHILUS INFLUENZAE TYPE B",
    ),
    "DTAP-IPV-HIB": (
        "DIPHTHERIA", "TETANUS", "ACELLULAR PERTUSSIS", "INACTIVATED POLIO",
        "HAEMOPHILUS INFLUENZAE TYPE B",
    ),
    "HEXA": (
        "DIPHTHERIA", "TETANUS", "PERTUSSIS", "HEPATITIS B",
        "HAEMOPHILUS INFLUENZAE TYPE B", "INACTIVATED POLIO",
    ),
    "DTP-HEPB-HIB-IPV": (
        "DIPHTHERIA", "TETANUS", "PERTUSSIS", "HEPATITIS B",
        "HAEMOPHILUS INFLUENZAE TYPE B", "INACTIVATED POLIO",
    ),
    "DTAP-HEPB-HIB-IPV": (
        "DIPHTHERIA", "TETANUS", "ACELLULAR PERTUSSIS", "HEPATITIS B",
        "HAEMOPHILUS INFLUENZAE TYPE B", "INACTIVATED POLIO",
    ),
    "HEPA-HEPB": ("HEPATITIS A", "HEPATITIS B"),
    "TWINRIX": ("HEPATITIS A", "HEPATITIS B"),
    "MENACWY": (
        "MENINGOCOCCAL A", "MENINGOCOCCAL C", "MENINGOCOCCAL W", "MENINGOCOCCAL Y",
    ),
    "MENB": ("MENINGOCOCCAL B",),
    "MENABCWY": (
        "MENINGOCOCCAL A", "MENINGOCOCCAL B", "MENINGOCOCCAL C",
        "MENINGOCOCCAL W", "MENINGOCOCCAL Y",
    ),
    "PCV7": ("PNEUMOCOCCAL CONJUGATE 7-VALENT",),
    "PCV10": ("PNEUMOCOCCAL CONJUGATE 10-VALENT",),
    "PCV13": ("PNEUMOCOCCAL CONJUGATE 13-VALENT",),
    "PCV15": ("PNEUMOCOCCAL CONJUGATE 15-VALENT",),
    "PCV20": ("PNEUMOCOCCAL CONJUGATE 20-VALENT",),
    "PPSV23": ("PNEUMOCOCCAL POLYSACCHARIDE 23-VALENT",),
}

# component keyword → normalized component (unified_constants.py:1536-1607)
VACCINE_COMPONENT_KEYWORDS: dict[str, str] = {
    "DIPHTHERIA": "DIPHTHERIA",
    "DIPHTERIA": "DIPHTHERIA",
    "CORYNEBACTERIUM DIPHTHERIAE": "DIPHTHERIA",
    "TETANUS": "TETANUS",
    "CLOSTRIDIUM TETANI": "TETANUS",
    "PERTUSSIS": "PERTUSSIS",
    "WHOOPING COUGH": "PERTUSSIS",
    "BORDETELLA PERTUSSIS": "PERTUSSIS",
    "ACELLULAR PERTUSSIS": "ACELLULAR PERTUSSIS",
    "WHOLE-CELL PERTUSSIS": "WHOLE-CELL PERTUSSIS",
    "WHOLE CELL PERTUSSIS": "WHOLE-CELL PERTUSSIS",
    "HAEMOPHILUS INFLUENZAE TYPE B": "HAEMOPHILUS INFLUENZAE TYPE B",
    "HAEMOPHILUS INFLUENZAE B": "HAEMOPHILUS INFLUENZAE TYPE B",
    "H. INFLUENZAE TYPE B": "HAEMOPHILUS INFLUENZAE TYPE B",
    "HIB": "HAEMOPHILUS INFLUENZAE TYPE B",
    "HEPATITIS A": "HEPATITIS A",
    "HEPATITIS B": "HEPATITIS B",
    "HEP A": "HEPATITIS A",
    "HEP B": "HEPATITIS B",
    "POLIO": "POLIO",
    "POLIOVIRUS": "POLIO",
    "POLIOMYELITIS": "POLIO",
    "INACTIVATED POLIO": "INACTIVATED POLIO",
    "INACTIVATED POLIOVIRUS": "INACTIVATED POLIO",
    "INACTIVATED POLIOMYELITIS": "INACTIVATED POLIO",
    "ORAL POLIO": "ORAL POLIO",
    "LIVE ATTENUATED POLIO": "ORAL POLIO",
    "MEASLES": "MEASLES",
    "RUBEOLA": "MEASLES",
    "MUMPS": "MUMPS",
    "RUBELLA": "RUBELLA",
    "GERMAN MEASLES": "RUBELLA",
    "VARICELLA": "VARICELLA",
    "CHICKENPOX": "VARICELLA",
    "VARICELLA-ZOSTER": "VARICELLA",
    "VARICELLA ZOSTER": "VARICELLA",
    "ROTAVIRUS": "ROTAVIRUS",
    "INFLUENZA": "INFLUENZA",
    "FLU": "INFLUENZA",
    "PNEUMOCOCCAL": "PNEUMOCOCCAL",
    "MENINGOCOCCAL": "MENINGOCOCCAL",
    "HUMAN PAPILLOMAVIRUS": "HUMAN PAPILLOMAVIRUS",
    "HPV": "HUMAN PAPILLOMAVIRUS",
    "YELLOW FEVER": "YELLOW FEVER",
    "JAPANESE ENCEPHALITIS": "JAPANESE ENCEPHALITIS",
    "RABIES": "RABIES",
    "TYPHOID": "TYPHOID",
    "TUBERCULOSIS": "TUBERCULOSIS",
    "BCG": "TUBERCULOSIS",
    "BACILLUS CALMETTE-GUERIN": "TUBERCULOSIS",
    "BACILLUS CALMETTE GUERIN": "TUBERCULOSIS",
}


def _components_to_acronym() -> dict[str, str]:
    out: dict[str, str] = {}
    for acr, comps in VACCINE_ACRONYM_TO_COMPONENTS.items():
        key = " + ".join(sorted(c.upper() for c in comps))
        if key not in out or len(acr) < len(out[key]):
            out[key] = acr
    return out


VACCINE_COMPONENTS_TO_ACRONYM: dict[str, str] = _components_to_acronym()


def is_vaccine_text_py(text: str | None) -> bool:
    """Vaccine-ish marker — the reference's gating condition for
    normalize_vaccine_name (VACCINE/TOXOID) OR a match_vaccine_text
    hit."""
    if not text:
        return False
    return normalize_vaccine_name_py(text)[0] is not None or any(
        match_vaccine_text_py(text)
    )


def normalize_vaccine_name_py(text: str | None) -> tuple[str | None, str | None]:
    """Reference normalize_vaccine_name (unified_constants.py:1385-1446):
    (canonical_name, details) for texts containing VACCINE/TOXOID via
    the pattern registry; generic 'VACCINE' fallback; (None, None)
    otherwise. Details capture valency/types/serogroups/recombinant/
    attenuated/pediatric markers exactly as the reference does."""
    if not text:
        return None, None
    up = text.upper()
    if "VACCINE" not in up and "TOXOID" not in up:
        return None, None
    for canonical, patterns in VACCINE_CANONICAL.items():
        for pattern in patterns:
            try:
                hit = pattern in up or re.search(pattern, up, re.IGNORECASE)
            except re.error:
                hit = pattern in up
            if hit:
                details = []
                m = re.search(r"(\d+)-?VALENT", up)
                if m:
                    details.append(f"{m.group(1)}-valent")
                m = re.search(r"\(TYPE[S]?\s+([^)]+)\)", up)
                if m:
                    details.append(f"Type {m.group(1)}")
                m = re.search(r"(?:GROUP|SEROGROUP)\s+([A-Z,\s\+]+?)(?:\s|$|\))", up)
                if m:
                    details.append(f"Group {m.group(1).strip()}")
                if "RECOMBINANT" in up:
                    details.append("Recombinant")
                if "ATTENUATED" in up and "LIVE" in up:
                    details.append("Live attenuated")
                elif "INACTIVATED" in up:
                    details.append("Inactivated")
                if "PEDIATRIC" in up or "JUNIOR" in up:
                    details.append("Pediatric")
                elif "ADULT" in up:
                    details.append("Adult")
                return canonical, "; ".join(details) if details else None
    if "VACCINE" in up:
        return "VACCINE", up.replace("VACCINE", "").strip()
    return None, None


# r10 hot-path constants (these scans run once per text inside the
# doc-enrich crossing): the sorts and regex compilations are
# text-independent, so they happen once at import instead of per call.
_COMPONENT_KEYWORDS_SORTED = sorted(
    VACCINE_COMPONENT_KEYWORDS.items(), key=lambda kv: -len(kv[0])
)
_WORDRUN_RE = re.compile(r"[A-Za-z0-9_]+")
_ACRONYMS_SCAN = [
    (
        a,
        bool(re.fullmatch(r"[A-Za-z0-9_]+", a)),
        re.compile(rf"\b{re.escape(a)}\b"),
    )
    for a in sorted(VACCINE_ACRONYM_TO_COMPONENTS, key=len, reverse=True)
]


def normalize_vaccine_components_py(text: str | None) -> list[str]:
    """Reference normalize_vaccine_components (:1619-1636): SUBSTRING
    scan of component keywords, longest first, consuming matched spans.
    Deliberately not word-bounded — parity includes the FLU-inside-
    FLUCONAZOLE behavior."""
    if not text:
        return []
    up = text.upper()
    components: list[str] = []
    for keyword, normalized in _COMPONENT_KEYWORDS_SORTED:
        if keyword in up:
            if normalized not in components:
                components.append(normalized)
            up = up.replace(keyword, " ")
    return sorted(components)


def get_vaccine_acronym_py(components: list[str]) -> str | None:
    key = " + ".join(sorted(c.upper() for c in components))
    return VACCINE_COMPONENTS_TO_ACRONYM.get(key)


def match_vaccine_text_py(text: str | None) -> tuple[str | None, list[str] | None]:
    """Reference match_vaccine_text (:1678-1707): word-bounded acronym
    scan (longest acronym first), else component extraction + reverse
    acronym lookup.

    The short acronyms ('MR', 'DT', 'D'…) DO false-positive on
    ordinary drug texts ('35 MG MR TABLET' → MEASLES/RUBELLA) — that
    is the reference's own behavior, reproduced verbatim and pinned
    by the row-level differential (DIFF_REFERENCE.md's documented
    FLU/MR quirks); tightening the scan here would break parity."""
    if not text:
        return None, None
    up = text.upper()
    # r10 hot-path form of the same longest-first scan: for acronyms
    # that are pure word-characters, `\bACR\b` matches iff ACR is a
    # maximal word-char run of the text — one findall + set probes
    # instead of 62 regex searches per text. Non-wordlike acronyms
    # (the DTP-HIB hyphen family) keep their precompiled regex, gated
    # by the necessary substring condition.
    toks = frozenset(_WORDRUN_RE.findall(up))
    for acronym, wordlike, rx in _ACRONYMS_SCAN:
        if wordlike:
            if acronym in toks:
                return acronym, list(VACCINE_ACRONYM_TO_COMPONENTS[acronym])
        elif acronym in up and rx.search(up):
            return acronym, list(VACCINE_ACRONYM_TO_COMPONENTS[acronym])
    components = normalize_vaccine_components_py(text)
    if components:
        return get_vaccine_acronym_py(components), components
    return None, None


def vaccine_component_keys_py(text: str | None) -> list[str]:
    """Lookup-key expansion for vaccine texts (reference tagger.py
    :683-699): acronym, '<acronym> VACCINE', each component, the
    sorted combo key, and '<combo key> VACCINE'."""
    acronym, components = match_vaccine_text_py(text)
    keys: list[str] = []
    if acronym:
        keys.append(acronym.upper())
        keys.append(f"{acronym.upper()} VACCINE")
    if components:
        keys.extend(c.upper() for c in components)
        combo = " + ".join(sorted(c.upper() for c in components))
        keys.append(combo)
        keys.append(f"{combo} VACCINE")
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
