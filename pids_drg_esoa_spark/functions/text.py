"""Text normalization functions — native Catalyst tier.

Every function returns a Column built purely from JVM expressions
(whole-stage codegen, no Python in the hot path). Python twins
(`*_py`) exist for golden tests and for driver-side use; tests assert
Column ≡ Python on the reference's own test cases.

Reference parity targets:
- normalize_text       text_utils.py:49-65  (F1)
- normalize_basic      text_utils.py:37-41 / match_labs.py:18-26 (F2)
- normalize_compact    text_utils.py:117-119 (F3)
- slug_id              text_utils.py:121-124 (F4)
- clean_code           text_utils.py:126-130 (F5, NBSP-tolerant trim)
- serialize_salt_list  text_utils.py:206-216 (F7)
- parenthetical_phrases text_utils.py:143-165 (F8)
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F

def _strip_accents_py(s: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c)
    )


# Accent folding for the native tier: translate() over the Latin-1
# range covers the accents that occur in drug catalogs; anything
# beyond falls back to the pandas_udf tier.
_ACCENTED = "áàâäãåéèêëíìîïóòôöõúùûüýÿñçšžđ"
_PLAIN = "aaaaaaeeeeiiiiooooouuuuyynczsd"[: len(_ACCENTED)]
_ACCENTED_UPPER = _ACCENTED.upper()
_PLAIN_UPPER = _PLAIN.upper()


# F1 rewrite bank, in the reference's exact order (text_utils.py:49-65).
# Each entry is (is_regex, pattern, replacement): the reference mixes
# word-bounded regex rewrites with bare substring str.replace calls
# ("microgram" → "mcg" turns "micrograms" into "mcgs"; that quirk is
# parity, fuzz_dose_vs_reference.py pins it). "(?U)" makes Java regex
# classes unicode-aware like Python's (\w keeps μ/_ etc.).
_NORM_STEPS: tuple[tuple[bool, str, str], ...] = (
    (True, r"\biv\b", "intravenous"),
    (True, r"[^\w%/+.\- ]+", " "),
    (False, "microgram", "mcg"),
    (False, "μg", "mcg"),
    (False, "µg", "mcg"),
    (True, r"(?<![a-z])cc(?![a-z])", "ml"),
    (False, "milli litre", "ml"),
    (False, "milliliter", "ml"),
    (True, r"(?<![a-z])gms?(?![a-z])", "g"),
    (False, "milligram", "mg"),
    (False, "polymixin", "polymyxin"),
    (False, "hydrochlorde", "hydrochloride"),
)


def normalize_text(col: Column | str) -> Column:
    """F1 (text_utils.py:49-65): NFKD accent-fold → lower → iv →
    intravenous → strip punctuation (unicode \\w + the dose charset
    %/+.- survives) → unit-token rewrites (mcg/ml/g/mg spellings) →
    typo rewrites → collapse whitespace. The NFKD step is approximated
    by a Latin-accent translate (covers drug-catalog text); µ/μ are
    deliberately NOT in the translate table — the μg→mcg rewrite needs
    them intact."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(c, _ACCENTED + _ACCENTED_UPPER, _PLAIN + _PLAIN_UPPER)
    c = F.lower(c)
    for is_rx, pat, rep in _NORM_STEPS:
        # "(?U)" = Java UNICODE_CHARACTER_CLASS, matching Python's
        # default unicode \w/\s/\b semantics (Python rejects the
        # uppercase inline flag, so it is added only on this tier)
        c = F.regexp_replace(c, "(?U)" + (pat if is_rx else re.escape(pat)), rep)
    return F.trim(F.regexp_replace(c, r"(?U)\s+", " "))


def normalize_text_py(s: str) -> str:
    """Python twin of normalize_text — the reference's exact step
    order, incl. str.replace substring semantics (text_utils.py:49-65)."""
    s = _strip_accents_py(s).lower()
    for is_rx, pat, rep in _NORM_STEPS:
        s = re.sub(pat, rep, s) if is_rx else s.replace(pat, rep)
    return re.sub(r"\s+", " ", s).strip()


def normalize_basic(col: Column | str) -> Column:
    """F2: lower, non-alphanumeric → space, collapse — the labs join
    key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "), " +", " "))


def normalize_basic_py(s: str) -> str:
    return re.sub(r" +", " ", re.sub(r"[^a-z0-9]+", " ", s.lower())).strip()


def normalize_compact(col: Column | str) -> Column:
    """F3: normalize_text minus spaces and hyphens."""
    return F.regexp_replace(normalize_text(col), "[ \\-]+", "")


def slug_id(col: Column | str) -> Column:
    """F4 (text_utils.py:121-124): normalize_text → non-alnum runs →
    '_' → strip edge underscores. Chains the FULL normalize (so
    'IV SET' slugs to 'intravenous_set', 'GM' to 'g' — reference
    parity), not the basic lowercase pass."""
    c = normalize_text(col)
    return F.regexp_replace(F.regexp_replace(c, "[^a-z0-9]+", "_"), "^_+|_+$", "")


def slug_id_py(s: str) -> str:
    """Python twin of slug_id."""
    return re.sub(r"[^a-z0-9]+", "_", normalize_text_py(str(s))).strip("_")


def clean_atc(col: Column | str) -> Column:
    """F5 (text_utils.py:126-130): NBSP → space, trim. The reference
    does NOT uppercase — codes pass through in source casing."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, " ", " "))


def clean_atc_py(s) -> str:
    """Python twin of clean_atc (text_utils.py:126-130)."""
    if not isinstance(s, str):
        return ""
    return s.replace("\u00a0", " ").strip()


def clean_code(col: Column | str) -> Column:
    """F5: trim a code field tolerating NBSP and zero-width junk."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, "[\\u00a0\\u200b\\ufeff]", " "))


def serialize_salt_list(col: Column) -> Column:
    """F7 (text_utils.py:206-216): array<string> salts → trimmed,
    uppercased, FIRST-OCCURRENCE-ordered dedupe, ' + '-joined. The
    reference preserves encounter order — no sort."""
    up = F.filter(
        F.transform(col, lambda x: F.upper(F.trim(x))), lambda x: x != ""
    )
    empty = F.array().cast("array<string>")
    deduped = F.aggregate(
        up,
        empty,
        lambda acc, x: F.when(F.array_contains(acc, x), acc).otherwise(
            F.concat(acc, F.array(x))
        ),
    )
    return F.array_join(deduped, " + ")


def serialize_salt_list_py(salts) -> str:
    """Python twin of serialize_salt_list."""
    out: list[str] = []
    seen: set[str] = set()
    for s in salts or []:
        c = str(s).strip().upper()
        if c and c not in seen:
            seen.add(c)
            out.append(c)
    return " + ".join(out)


def parenthetical_phrases(col: Column | str) -> Column:
    """F8 (text_utils.py:143-165): every '(...)' span (regex
    \\(([^)]+)\\) — a nested '(' stays inside the span), stripped;
    skip empty, skip >60 chars post-strip, skip punctuation-only
    ([-/+\\s]+); inner whitespace collapsed; case-insensitive dedupe
    keeping the first occurrence's original casing."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.regexp_extract_all(c, F.lit(r"\(([^)]+)\)"), 1)
    # filter on the STRIPPED-but-uncollapsed span (the reference's
    # >60 check runs before its whitespace collapse), THEN collapse
    # full-whitespace strip (Python str.strip semantics, not just ' ')
    stripped = F.transform(
        raw, lambda x: F.regexp_replace(x, r"(?U)^\s+|\s+$", "")
    )
    kept = F.transform(
        F.filter(
            stripped,
            lambda x: (x != "")
            & (F.length(x) <= 60)
            & ~x.rlike(r"(?U)^[-/+\s]+$"),
        ),
        lambda x: F.regexp_replace(x, r"(?U)\s+", " "),
    )
    return F.aggregate(
        kept,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.array().cast("array<string>").alias("seen"),
        ),
        lambda acc, x: F.when(
            F.array_contains(acc["seen"], F.lower(x)), acc
        ).otherwise(
            F.struct(
                F.concat(acc["out"], F.array(x)).alias("out"),
                F.concat(acc["seen"], F.array(F.lower(x))).alias("seen"),
            )
        ),
        lambda acc: acc["out"],
    )


def parenthetical_phrases_py(s: str) -> list[str]:
    """Python twin of parenthetical_phrases (text_utils.py:143-165).
    Mirrors the reference's filter ORDER: strip → drop empty → drop
    >60 → drop punctuation-only → collapse inner whitespace →
    case-insensitive first-wins dedupe."""
    if not isinstance(s, str) or "(" not in s:
        return []
    items = [m.group(1).strip() for m in re.finditer(r"\(([^)]+)\)", s) if m.group(1).strip()]
    cleaned = []
    for it in items:
        if len(it) > 60:
            continue
        if re.fullmatch(r"[-/+\s]+", it):
            continue
        cleaned.append(re.sub(r"\s+", " ", it))
    out: list[str] = []
    seen: set[str] = set()
    for c in cleaned:
        k = c.lower()
        if k not in seen:
            seen.add(k)
            out.append(c)
    return out


def safe_to_float(col: Column | str) -> Column:
    """F38: comma-decimal tolerant numeric parse (text_utils.py:132-141)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), ",", ".").cast("double")
