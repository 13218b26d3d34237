"""Tracked persist registry: every ``persist()`` a query takes goes
through :func:`tracked_persist`, so a long-lived harness (the 392-query
oracle sweep, ``bench.py``, a notebook session) can release ALL cached
blocks between queries with one :func:`release_cached` call instead of
leaning on LRU eviction.

Why not unpersist inside the query functions themselves: queries return
LAZY DataFrames — the caller collects later, and the persisted frames
are usually reachable from the returned plan, so an in-function
unpersist would forfeit the cache before its one consumer runs.
Releasing is therefore the harness's job, after it has consumed the
result. Unpersisting is always CORRECT (Spark recomputes from lineage);
this is purely a memory-accumulation discipline.

Iterative algorithms (BFS frontier rounds) additionally unpersist their
superseded per-round state eagerly — see ``queries/graph.py`` — since
those frames are consumed by the next round's materialization barrier
inside the function itself.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

_TRACKED: List[DataFrame] = []


def tracked_persist(df: DataFrame, level=None) -> DataFrame:
    """``df.persist()`` + registration for later :func:`release_cached`."""
    out = df.persist(level) if level is not None else df.persist()
    _TRACKED.append(out)
    return out


def untrack(df: DataFrame) -> None:
    """Drop a frame from the registry without unpersisting (used when a
    query releases its own superseded state eagerly)."""
    _TRACKED[:] = [d for d in _TRACKED if d is not df]


def release_cached(blocking: bool = False) -> int:
    """Unpersist every tracked frame (newest first); returns the count.
    Safe to call at any time — consumers recompute from lineage."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
        except Exception:  # a stopped session's frames are already gone
            pass
        n += 1
    return n
