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

from .constants import TEXT_CANON_REPLACEMENTS

_KEEP_CHARS = "a-z0-9%/+.\\- "


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


def normalize_text(col: Column | str) -> Column:
    """F1: accent-fold → lower → canonical unit/typo rewrites → strip
    punctuation (keep the dose charset %/+.-) → collapse whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.translate(c, _ACCENTED + _ACCENTED_UPPER, _PLAIN + _PLAIN_UPPER)
    c = F.lower(c)
    for pat, rep in TEXT_CANON_REPLACEMENTS:
        c = F.regexp_replace(c, pat, rep)
    c = F.regexp_replace(c, f"[^{_KEEP_CHARS}]+", " ")
    return F.trim(F.regexp_replace(c, " +", " "))


def normalize_text_py(s: str) -> str:
    """Python twin of normalize_text (golden-test anchor)."""
    s = _strip_accents_py(s).lower()
    for pat, rep in TEXT_CANON_REPLACEMENTS:
        s = re.sub(pat, rep, s)
    s = re.sub(r"[^a-z0-9%/+.\- ]+", " ", s)
    return re.sub(r" +", " ", s).strip()


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
    """F4: normalized text → lowercase underscore slug."""
    c = normalize_basic(col)
    return F.regexp_replace(F.regexp_replace(c, "[^a-z0-9]+", "_"), "^_+|_+$", "")


def clean_code(col: Column | str) -> Column:
    """F5: trim a code field tolerating NBSP and zero-width junk."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, "[\\u00a0\\u200b\\ufeff]", " "))


def serialize_salt_list(col: Column) -> Column:
    """F7: array<string> salts → deduped, uppercased, ' + '-joined."""
    up = F.transform(col, lambda x: F.upper(F.trim(x)))
    return F.array_join(F.array_sort(F.array_distinct(F.filter(up, lambda x: x != ""))), " + ")


def parenthetical_phrases(col: Column | str) -> Column:
    """F8: all parenthesized spans ≤ 60 chars, case-insensitively
    deduped, original casing of first occurrence preserved."""
    c = F.col(col) if isinstance(col, str) else col
    spans = F.regexp_extract_all(c, F.lit(r"\(([^()]{1,60})\)"), 1)
    # dedupe case-insensitively keeping first occurrence: tag each
    # span with its lower form, aggregate first-wins.
    return F.aggregate(
        spans,
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
    out: list[str] = []
    seen: set[str] = set()
    for m in re.finditer(r"\(([^()]{1,60})\)", s):
        span = m.group(1)
        if span.lower() not in seen:
            seen.add(span.lower())
            out.append(span)
    return out


def safe_to_float(col: Column | str) -> Column:
    """F38: comma-decimal tolerant numeric parse (text_utils.py:132-141)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), ",", ".").cast("double")
