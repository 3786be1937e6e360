"""Deterministic release of operator-persisted intermediates.

The pair generators (dedup), ANN builders (similarity), and streaming
serving paths persist shared intermediates because BOTH self-join
sides and the verify stage reference them — unpersisting inside the
operator would silently recompute the whole signature DAG per
reference. That leaves the blocks alive until the session ends, which
accumulates executor storage across repeated dedup/serving calls.

This registry is the middle path: every operator-persist goes through
:func:`persist_tracked`, and callers release exactly those blocks with
:func:`release_caches` — no global ``spark.catalog.clearCache()`` that
would also evict caches the caller created for other reasons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register the handle for deterministic
    release. The persist is still lazy; callers that need eager
    materialization (self-join race protection) count() afterwards as
    before."""
    handle = df.persist()
    _PERSISTED.append(handle)
    return handle


def release_caches() -> int:
    """Unpersist (best-effort) every intermediate registered by
    :func:`persist_tracked` and empty the registry. Returns how many
    handles were released. Safe after a session stop — dead handles
    are skipped."""
    n = 0
    while _PERSISTED:
        handle = _PERSISTED.pop()
        try:
            handle.unpersist()
            n += 1
        except Exception:
            pass  # session stopped; blocks already gone
    return n
