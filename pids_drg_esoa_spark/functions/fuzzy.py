"""Fuzzy string similarity with rapidfuzz `fuzz.ratio` semantics.

The reference's fallback matcher is rapidfuzz `fuzz.ratio ≥ 85`
(lookup.py:164-220 J6). That score is normalized INDEL similarity:

    ratio = (1 - indel(a, b) / (len(a) + len(b))) * 100

where indel is edit distance with substitutions costing 2 (i.e. only
insert/delete). Reimplemented here exactly (pure-Python DP, no
external deps) with a vectorized pandas_udf for the join path.

Scale note: never all-pairs. The tagger blocks candidates (length
band + shared prefix/token) before scoring, as SURVEY §4 requires —
blocking must not change results for the ≥85 threshold, which a
length-band bound guarantees: ratio ≥ 85 ⇒ |len(a)−len(b)| ≤
0.15·(len(a)+len(b))."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T


def indel_distance_py(a: str, b: str) -> int:
    """Edit distance with substitution cost 2 (= LCS-based indel)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la + lb
    # indel(a,b) = la + lb - 2*LCS(a,b)
    prev = [0] * (lb + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b):
            if ca == cb:
                v = prev[j] + 1
            else:
                v = max(prev[j + 1], cur[j])
            cur.append(v)
        prev = cur
    return la + lb - 2 * prev[lb]


def fuzz_ratio_py(a: str | None, b: str | None) -> float:
    """rapidfuzz fuzz.ratio parity: 0-100 normalized indel similarity."""
    if a is None or b is None:
        return 0.0
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return (1.0 - indel_distance_py(a, b) / total) * 100.0


@F.pandas_udf(T.DoubleType())
def fuzz_ratio(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([fuzz_ratio_py(x, y) for x, y in zip(a, b)])


def length_band_filter(len_a, len_b, min_ratio: float = 85.0):
    """Catalyst pre-filter implied by the ratio threshold — prunes
    candidate pairs before the Python scorer runs (blocking that
    provably cannot change results)."""
    t = 1.0 - min_ratio / 100.0
    return (F.abs(len_a - len_b)) <= t * (len_a + len_b)
