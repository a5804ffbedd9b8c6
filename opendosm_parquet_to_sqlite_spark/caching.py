"""Tracked DataFrame persistence — the release valve for long-lived
sessions.

Several operators persist() intermediate frames whose lazy results are
returned to the caller (the shingle DAG in the capped Jaccard path, MinHash
probe sets, the permissive-parse split): the operator cannot unpersist them
itself, because the caller has not consumed the result yet. Untracked, those
handles accumulate cached blocks in a long-lived session until LRU eviction
pressure starts degrading OTHER cached data.

Every internal persist goes through persist_tracked(); session owners call
release_cached() once the results of a batch of operator calls have been
fully consumed (bench.py does this between queries; a service would do it
per request). StorageLevel stays MEMORY_AND_DISK (the persist default) so
tracked blocks spill rather than OOM in the meantime.

CONTRACT (since round 13): release_cached() is a pure performance hint for
plain persists (Spark recomputes lineage), but the ITERATIVE operators
(connected components, PageRank, LPA, k-core, the tokenizer trainers)
register loop-final localCheckpoint blocks here too, and those cannot
recompute — re-executing a DataFrame returned by an iterative operator
AFTER release_cached() fails with a checkpoint-block lookup error instead
of silently recomputing. Consume results fully, then release
(tests/test_caching.py::test_released_loop_result_fails_fast_not_wrong
pins the failure mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register the handle for a later release_cached()."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def track_unpersist(handle) -> None:
    """Register ANY object exposing .unpersist() for release_cached().

    Round-13 opt: the iterative operators (connected components,
    PageRank, LPA, k-core, the tokenizer trainers) return DataFrames
    backed by loop-final localCheckpoint blocks that df.unpersist()
    cannot reach — every call leaked one block set into the session
    (~hundreds over a bench suite, feeding exactly the in-session GC
    pressure earlier rounds diagnosed). The loops now register a small
    releaser here so release_cached() frees those blocks too. NOTE:
    unlike a persist, a released localCheckpoint CANNOT recompute —
    callers must have fully consumed the result before release_cached(),
    which is already release_cached()'s documented contract."""
    _TRACKED.append(handle)


def release_cached() -> int:
    """Unpersist every tracked handle; returns how many were released.

    Results already computed stay valid. Plain persists are performance
    hints (Spark recomputes lineage if a released block is referenced
    again); the loop-final localCheckpoint releasers (track_unpersist)
    are NOT recomputable — re-executing a DataFrame returned by an
    iterative operator after release_cached() fails rather than
    recomputes, so call this only between workloads, once results are
    consumed (the call pattern every in-repo consumer already follows).
    """
    released = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            released += 1
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED.clear()
    return released
