"""Per-SparkContext memoization for expensive DRIVER-side plan
artifacts that are pure functions of static vocabulary constants:

- ``cached_column``: big Column expression trees (the native vocab
  twins build ~450-literal InSets and dozens of regexp stages — each
  literal is a py4j round trip, measured 0.6 s per rebuild of the
  combination normalizer at steady state). The unresolved Column is
  reusable across DataFrames within one JVM, so one build per
  SparkContext serves every tag() call.
- ``cached_broadcast``: driver→executor broadcasts of collected dim
  dicts. Every tag() call re-collects its dims and re-broadcasts the
  same content (the worker-side trie cache already fingerprints
  content for this reason — r10); keying the broadcast itself on a
  content fingerprint skips the per-call pickle + broadcast job and
  lets the worker caches hit their cheap id() tier.

Keys include ``sc.applicationId`` so a stopped-and-recreated session
never serves stale py4j object handles. Fingerprints hash the FULL
content (not a sample): dim dicts are broadcast-sized by contract, so
hashing them is microseconds against the pickle they replace.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark import SparkContext

_COLUMNS: dict[tuple, Any] = {}
_BROADCASTS: dict[tuple, Any] = {}


def _app_id() -> str:
    sc = SparkContext._active_spark_context
    return sc.applicationId if sc is not None else "<none>"


def cached_column(name: str, col_name: str, build: Callable[[], Any]):
    """Return the memoized Column for (builder name, input column
    name), building it once per SparkContext."""
    key = (_app_id(), name, col_name)
    col = _COLUMNS.get(key)
    if col is None:
        col = _COLUMNS[key] = build()
    return col


def _freeze(value: Any) -> Any:
    if isinstance(value, dict):
        return frozenset((k, _freeze(v)) for k, v in value.items())
    if isinstance(value, (list, tuple)):
        return tuple(_freeze(v) for v in value)
    if isinstance(value, (set, frozenset)):
        return frozenset(_freeze(v) for v in value)
    return value


_VALUES: dict[tuple, Any] = {}


def cached_value(name: str, key: tuple, build: Callable[[], Any]):
    """Generic per-SparkContext memo for driver-side plan artifacts
    (UDF objects, prepared relations) keyed on (builder name, caller
    key). Same contract as cached_column: the artifact must be a pure
    function of its key. Primary use: the tagger's per-call
    pandas-UDF wrappers — a FRESH UDF object per tag() call pickles
    into a distinct PythonUDF plan node, so the CacheManager saw
    every call's persisted tier relations as new plans and
    re-computed them; keying the UDF object on its broadcast inputs
    (stable via cached_broadcast) makes repeat plans CacheManager-
    equal, the same session-scoped dedup every other operator already
    gets from persist()."""
    k = (_app_id(), name, key)
    v = _VALUES.get(k)
    if v is None:
        v = _VALUES[k] = build()
    return v


_CHECKPOINTS: dict[str, list[tuple[Any, Any]]] = {}
# FIFO cap: evicted entries drop their strong ref so the checkpointed
# RDD becomes GC-reapable again (today's no-registry behavior). Bounds
# registry growth for callers that loop over many DISTINCT synthetic
# dims (fuzz harnesses) while comfortably holding every dim a real
# runner/tagger session resolves.
_CHECKPOINTS_MAX = 64


def cached_checkpoint(df, eager: bool = True):
    """Content-keyed eager ``localCheckpoint`` memo per SparkContext:
    a DataFrame whose ANALYZED plan is semantically equal to one
    already checkpointed this session (``plan.sameResult`` — the same
    equality the CacheManager uses to dedup persisted relations)
    returns the EXISTING checkpointed leaf instead of re-running the
    materialization job. This is plan-construction dedup with persist()
    semantics, NOT cross-run result caching: the registry is keyed on
    applicationId and dies with the process, exactly like a persisted
    relation (and like persist, a caller that mutates files underneath
    a semantically-equal plan mid-session reads the materialized
    snapshot — Spark's standard cached-relation behavior).

    Why: tag_descriptions re-materialized every dim on EVERY call
    (eager checkpoint job + plan analysis each time, ~1.5-2 s of the
    ~5 s warm build), and repeated headline invocations accumulated a
    fresh never-released checkpoint per call (r13 ADVICE #1); the
    registry resolves a semantically-equal dim to ONE leaf per
    session."""
    sc = df.sparkSession.sparkContext
    plan = df._jdf.queryExecution().analyzed()
    entries = _CHECKPOINTS.setdefault(sc.applicationId, [])
    for stored_plan, stored_df in list(entries):
        if plan.sameResult(stored_plan):
            return stored_df
    out = df.localCheckpoint(eager=eager)
    entries.append((plan, out))
    del entries[:-_CHECKPOINTS_MAX]
    return out


def cached_broadcast(sc: SparkContext, name: str, value: Any):
    """Broadcast ``value`` once per (SparkContext, content): repeat
    calls with equal content return the SAME Broadcast object."""
    # the FROZEN CONTENT is the key (not its hash): dict lookup
    # resolves hash collisions through __eq__, so a hit is exact
    # equality by construction; the retained frozen copy is
    # broadcast-sized by the same contract as the value itself
    key = (sc.applicationId, name, _freeze(value))
    b = _BROADCASTS.get(key)
    if b is None:
        b = _BROADCASTS[key] = sc.broadcast(value)
    return b
