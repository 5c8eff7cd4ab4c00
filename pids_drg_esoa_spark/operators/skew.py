"""Skew-aware joins: explicit salting for hot keys.

The domain has real key skew (SURVEY §7 step 10: PARACETAMOL-class
generics dominate the eSOA fact side). AQE's skew-join split handles
sort-merge cases at runtime; explicit salting is the belt-and-
suspenders for the worst keys and the only option when the skewed
side must aggregate (a hot groupBy key can't be runtime-split).

``salted_join``: replicate the dim row N ways, salt the fact key with
hash%N — each hot key spreads over N tasks. ``two_phase_agg``: salt →
partial agg → final agg, the same trick for skewed aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# joins where replicating the dim and salting the fact preserves
# semantics: every fact row carries exactly one salt, so each fact row
# matches/misses exactly as unsalted. right/full/*outer joins are NOT
# expressible this way — the n_salts-1 unmatched dim replicas would
# emit spurious null-fact rows (and keys absent from the fact side
# would appear n_salts times instead of once).
_SALTABLE_HOWS = frozenset(
    {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
     "left_anti", "leftanti", "semi", "anti", "cross"}
)


def _salt_col(n_salts: int) -> Column:
    # pmod, not abs(...)%n: abs(Long.MIN_VALUE) overflows back to
    # negative in Java, and Java % preserves sign — a (1-in-2^64)
    # silent row drop class
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on `key` with the dim side replicated
    n_salts× and the fact side salted by a stable hash — hot fact keys
    fan out over n_salts tasks instead of one straggler. Semantics
    identical to fact.join(dim, key, how) for fact-preserving joins
    (inner/left/semi/anti); right/full joins are rejected — replicated
    unmatched dim rows would fabricate output rows, so salt the other
    side or use a plain join there."""
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALTABLE_HOWS}:
        raise ValueError(
            f"salted_join cannot preserve {how!r} semantics: the replicated "
            "dim side would emit unmatched copies; salt the other side instead"
        )
    salted_fact = fact.withColumn("_salt", _salt_col(n_salts))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    replicated_dim = dim.select("*", salts)
    out = salted_fact.join(replicated_dim, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_exprs: dict[str, Column],
    n_salts: int = 8,
) -> DataFrame:
    """Skewed aggregation: groupBy(key, salt) partial → groupBy(key)
    final. ``agg_exprs`` maps output name → SUM-decomposable
    expression (sums/counts; extend per-need). The first shuffle
    spreads a hot key across n_salts reducers."""
    partial = (
        df.withColumn("_salt", _salt_col(n_salts))
        .groupBy(key, "_salt")
        .agg(*[expr.alias(name) for name, expr in agg_exprs.items()])
    )
    return partial.groupBy(key).agg(
        *[F.sum(name).alias(name) for name in agg_exprs]
    )
