"""Form & route canonicalization and compatibility (F24-F27).

Reference parity targets:
- map_route_token         routes_forms.py:23-49  (F24)
- parse_form_from_text    routes_forms.py:51-78  (F25, longest-first)
- normalize_form/route    form_route_mapping.py:35-101 (F26)
- forms_are_equivalent    scoring.py:73-86 + FORM_EQUIVALENTS (F27)

Python twins drive the pandas_udf tier in the bridge; vocabularies
come from functions.constants (data, not code).
"""

from __future__ import annotations

import re

from .constants import (
    FORM_CANON,
    FORM_EQUIVALENCE_GROUPS,
    FORM_TO_ROUTES,
    ROUTE_CANON,
)

# longest-first so 'suspension' beats 'susp' etc. (reference F25)
_FORM_KEYS = sorted(FORM_CANON, key=len, reverse=True)
_FORM_RE = re.compile(r"\b(" + "|".join(re.escape(k) for k in _FORM_KEYS) + r")\b", re.I)
_ROUTE_KEYS = sorted(ROUTE_CANON, key=len, reverse=True)
_ROUTE_RE = re.compile(r"\b(" + "|".join(re.escape(k) for k in _ROUTE_KEYS) + r")\b", re.I)


def parse_form_py(text: str | None) -> str | None:
    """F25: first (longest-alternative) form keyword → canonical."""
    if not text:
        return None
    m = _FORM_RE.search(text)
    return FORM_CANON[m.group(1).lower()] if m else None


def parse_route_py(text: str | None) -> tuple[str | None, str]:
    """F25: explicit route alias, else imputed from form (evidence
    label says which — reference extract_route_and_form)."""
    if not text:
        return None, "none"
    m = _ROUTE_RE.search(text)
    if m:
        return ROUTE_CANON[m.group(1).lower()], "explicit"
    form = parse_form_py(text)
    if form:
        routes = FORM_TO_ROUTES.get(form)
        if routes:
            return routes[0], f"imputed_from_form:{form}"
    return None, "none"


def normalize_form_py(form: str | None) -> str | None:
    if not form:
        return None
    return FORM_CANON.get(form.strip().lower(), form.strip().lower())


def normalize_route_py(route: str | None) -> str | None:
    if not route:
        return None
    return ROUTE_CANON.get(route.strip().lower(), route.strip().lower())


def forms_are_equivalent_py(a: str | None, b: str | None) -> bool:
    """F27: equal canonical forms, same equivalence group, or any
    shared plausible route (scoring.py:73-86 'shared-route' clause)."""
    fa, fb = normalize_form_py(a), normalize_form_py(b)
    if fa is None or fb is None:
        return False
    if fa == fb:
        return True
    for group in FORM_EQUIVALENCE_GROUPS:
        if fa in group and fb in group:
            return True
    ra, rb = set(FORM_TO_ROUTES.get(fa, ())), set(FORM_TO_ROUTES.get(fb, ()))
    return bool(ra & rb)


def routes_match_py(a: str | None, b: str | None) -> bool:
    ra, rb = normalize_route_py(a), normalize_route_py(b)
    return ra is not None and ra == rb
