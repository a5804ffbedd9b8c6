"""Shared tombstone-delete machinery for persisted near-dup indexes.

The takedown/opt-out removal path the IVF/IVFADC index got in round 8
(similarity.delete_from_ivf_index) applies equally to the text MinHash
index (neardup) and the media fingerprint index (mediadedup): a deleted
document's shingles/fingerprints must never surface from a probe again,
WITHOUT rebuilding the index. Same design throughout:

- delete is O(ids): the id set appends to a tombstone parquet dir; no
  index row is touched.
- tombstones are SMALL by the maintenance contract (compaction clears
  them past a fraction cap), so probe-time anti-joins broadcast.
- compaction is threshold-gated and rewrites via write-then-swap with
  the incremental.recover_swap crash contract (two renames through an
  '.old' holding dir; loads self-heal a mid-swap crash).
- re-appending a deleted id RESURRECTS it: its old physical rows are
  rewritten out first, then the fresh rows land, then its tombstone
  clears — exactly one live copy, in that crash-safe order (a crash
  mid-sequence leaves the id deleted, never duplicated).

Unlike the IVF index (cell-partitioned; compaction rewrites only
affected cells) these two indexes are flat, so compaction rewrites the
whole row table — acceptable because index rows are fingerprint-sized
(tens of bytes), ~3 orders of magnitude smaller than the corpus bytes
they stand for, and the rewrite is gated on the dead fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .incremental import recover_swap


def load_tombstones(spark, tpath: str, id_col: str) -> DataFrame | None:
    """The tombstone set at `tpath` as a one-column (`id_col`)
    DataFrame, or None when nothing was ever deleted. Self-heals a
    crashed clear-swap first (recover_swap over the '__new' staging
    suffix), so a mid-swap crash can never silently un-delete."""
    import os

    recover_swap(tpath, ("__new",))
    if not os.path.exists(tpath):
        return None
    return (
        spark.read.parquet(tpath)
        .select(F.col("tomb_id").alias(id_col))
        .distinct()
    )


def apply_tombstones(df: DataFrame, tomb: DataFrame | None, id_col: str) -> DataFrame:
    """Hide tombstoned ids: broadcast anti-join (tombstones are small by
    the maintenance contract), or a no-op when nothing was deleted."""
    if tomb is None:
        return df
    return df.join(F.broadcast(tomb), id_col, "left_anti")


def append_tombstone_ids(
    spark, tpath: str, ids: DataFrame, live_ids: DataFrame
) -> int:
    """Tombstone `ids` (first column used): dedup against existing
    tombstones, keep only ids present in `live_ids` (foreign ids would
    inflate the compaction-trigger fraction forever), append. Returns
    the number of NEW tombstones written."""
    import os

    recover_swap(tpath, ("__new",))
    new_ids = ids.select(F.col(ids.columns[0]).alias("tomb_id")).distinct()
    if os.path.exists(tpath):
        existing = spark.read.parquet(tpath)
        new_ids = new_ids.join(existing, "tomb_id", "left_anti")
    new_ids = new_ids.join(
        live_ids.select(F.col(live_ids.columns[0]).alias("tomb_id")),
        "tomb_id",
        "left_semi",
    )
    n = new_ids.count()
    if n:
        new_ids.coalesce(1).write.mode("append").parquet(tpath)
    return n


def clear_tombstones_for(spark, tpath: str, ids: DataFrame, id_col: str) -> None:
    """Remove tombstones matching `ids` via the recover_swap two-rename
    contract: stage '__new', rename live → '.old', rename staging →
    live, drop '.old'. A crash in any window is recoverable by
    load_tombstones' recover_swap."""
    import os
    import shutil

    recover_swap(tpath, ("__new",))
    if not os.path.exists(tpath):
        return
    kept = spark.read.parquet(tpath).join(
        ids.select(F.col(id_col).alias("tomb_id")).distinct(),
        "tomb_id",
        "left_anti",
    )
    staging = tpath + "__new"
    kept.coalesce(1).write.mode("overwrite").parquet(staging)
    old = tpath + ".old"
    os.rename(tpath, old)
    os.rename(staging, tpath)
    shutil.rmtree(old)


def swap_rewrite_parquet(df: DataFrame, path: str) -> None:
    """Replace the parquet dataset at `path` with `df` (which may read
    FROM `path` — the staged write materializes before any rename) under
    the recover_swap crash contract. Readers must recover_swap(path,
    ('.next',)) before reading; all loads in this package do."""
    import os
    import shutil

    staging = path + ".next"
    df.write.mode("overwrite").parquet(staging)
    old = path + ".old"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
