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
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register the handle for a later release_cached()."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_cached() -> int:
    """Unpersist every tracked handle; returns how many were released.

    Safe to call at any time: results already computed stay valid (the
    cache is a performance hint, not a correctness dependency — Spark
    recomputes lineage if a released block is referenced again).
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
