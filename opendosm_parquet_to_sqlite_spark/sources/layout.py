"""Physical data layout for scale: partitioned writes + bucketed tables.

The reference's 'layout' is one parquet file per month selected by URL
template (/root/reference/src/main.rs:233-238) — partition pruning done by
hand in string formatting. The engine equivalents:

- write_partitioned_by_month / read_months: hive-style month=YYYY-MM
  directory layout. A month filter becomes a PartitionFilter at plan time:
  non-selected months are never listed, opened, or read. At 100 TB x
  years-of-months this is the difference between scanning one month and
  scanning everything (the reference's manual URL selection, generalized
  and pushed into the planner).
- write_bucketed / bucketed tables: pre-shuffle both sides of a recurring
  equi-join ONCE at write time (hash-bucketed by join key). Joins between
  tables bucketed on the same key with the same bucket count execute with
  ZERO exchanges — the shuffle is amortized into the layout. This is the
  at-scale answer when a dimension outgrows broadcast (SURVEY §2.3 note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MONTH_COL = "month"


def write_partitioned_by_month(
    df: DataFrame, path: str, ts_col: str, mode: str = "overwrite"
) -> None:
    """Write parquet hive-partitioned by month=YYYY-MM derived from ts_col."""
    (
        df.withColumn(MONTH_COL, F.date_format(F.col(ts_col), "yyyy-MM"))
        .write.mode(mode)
        .partitionBy(MONTH_COL)
        .parquet(path)
    )


def read_months(spark: SparkSession, path: str, months: list[str]) -> DataFrame:
    """Read only the named months — the filter lands as a PartitionFilter
    (verify with .explain: 'PartitionFilters: [month IN (...)]'), so
    unselected months cost zero IO and zero file listings beyond pruning."""
    df = spark.read.parquet(path)
    return df.filter(F.col(MONTH_COL).isin(months))


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist df as a bucketed (and optionally sorted) table on `key`.

    Subsequent equi-joins/aggregations on `key` between tables bucketed
    with the SAME key and bucket count need no exchange (and no sort, when
    sorted): the write paid the shuffle once for every future query.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def zvalue(a, b, bits: int = 21) -> "F.Column":
    """Morton (Z-order) interleave of two non-negative int columns into one
    long: bit i of `a` lands at position 2i, bit i of `b` at 2i+1 (21 bits
    each → 42-bit z-value, safely inside a long).

    Entirely native bit arithmetic (codegen'd): a sum of shifted masked
    bits per input. Columns must already be rank/scale-reduced to
    [0, 2^bits) — use ntile/width bucketing upstream for skewed domains.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(a.bitwiseAND(F.lit(1 << i)).cast("long"), i)
            + F.shiftleft(b.bitwiseAND(F.lit(1 << i)).cast("long"), i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 21,
    mode: str = "overwrite",
    target_file_rows: int | None = None,
) -> None:
    """Write parquet globally sorted by the Z-order of (col_a, col_b) —
    multi-dimensional data skipping: parquet row-group min/max stats on
    BOTH columns become selective simultaneously, so predicates on either
    (or both) columns prune row groups. The classic lakehouse layout for
    two-dimensional access patterns (e.g. premise_code x item_code, or
    time x key) where a single-column sort only skips on one axis.

    orderBy is Spark's distributed range sort (sample → range exchange →
    in-partition sort), so this scales like sort_date_desc."""
    out = df.withColumn("__z", zvalue(col_a, col_b, bits)).orderBy("__z")
    writer = out.drop("__z").write.mode(mode)
    if target_file_rows is not None:
        writer = writer.option("maxRecordsPerFile", target_file_rows)
    writer.parquet(path)


def dataset_file_report(spark: SparkSession, path: str) -> DataFrame:
    """Per-partition small-file audit of a parquet dataset: file count,
    bytes, min/avg/max file size — the "do we have a small-file problem"
    pre-flight for compact_dataset. Reads ONLY the file listing (driver
    metadata, no data IO); partition = the hive subdirectory relative to
    the root ('' for an unpartitioned dataset).
    """
    import os

    rows = []
    for dirpath, _dirnames, filenames in os.walk(path):
        rel = os.path.relpath(dirpath, path)
        part = "" if rel == "." else rel
        for fn in filenames:
            if fn.endswith(".parquet"):
                rows.append(
                    (part, os.path.getsize(os.path.join(dirpath, fn)))
                )
    df = spark.createDataFrame(rows, "partition string, bytes long")
    return df.groupBy("partition").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").alias("total_bytes"),
        F.min("bytes").alias("min_bytes"),
        F.round(F.avg("bytes"), 1).alias("avg_bytes"),
        F.max("bytes").alias("max_bytes"),
    )


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
) -> dict:
    """Rewrite a parquet dataset into ~target-size files — the
    maintenance pass that fixes the small-file problem streaming /
    incremental writers accumulate (every microbatch appends files; a
    year of 5-minute batches is 100k tiny files whose per-file
    open/footer cost dominates the scan).

    File count is sized from the dataset's ACTUAL bytes (driver file
    listing, no data pass): n = ceil(total/target). Partitioned datasets
    (`partition_col`) compact per partition via ONE shuffle keyed on
    (partition, bucket) — repartition(n, partition, bucket) + in-task
    sortWithinPartitions(partition) keeps each output file single-
    partition so partition pruning still skips whole files.
    Unpartitioned datasets repartition(n) round-robin (no key skew by
    construction).

    Write-then-swap (same contract as incremental.recover_swap): the
    compacted copy lands at `path + '.next'`, then two renames swap it
    in — a crash before the first rename leaves the original untouched,
    and recover_swap runs FIRST so a crash in the window BETWEEN the two
    renames (dataset stranded at '.old', nothing at `path`) self-heals
    on the next compact/maintenance call, matching
    maintain_state_dataset / merge_upsert_dataset.

    Returns {"files_before", "files_after", "total_bytes"} so callers
    can log/assert the compaction actually compacted.
    """
    import math
    import os
    import shutil

    from ..operators.incremental import recover_swap

    recover_swap(path, (".next",))

    sizes = []
    for dirpath, _d, filenames in os.walk(path):
        sizes += [
            os.path.getsize(os.path.join(dirpath, f))
            for f in filenames
            if f.endswith(".parquet")
        ]
    total = sum(sizes)
    n = max(1, math.ceil(total / max(1, int(target_file_bytes))))
    df = spark.read.parquet(path)
    nxt, old = path + ".next", path + ".old"
    if partition_col:
        # ceil-split per partition: a hot partition still gets multiple
        # files, but each file holds exactly one partition value
        (
            df.withColumn(
                "__bucket", F.spark_partition_id() % F.lit(max(1, n))
            )
            .repartition(n, F.col(partition_col), F.col("__bucket"))
            .sortWithinPartitions(partition_col)
            .drop("__bucket")
            .write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(nxt)
        )
    else:
        df.repartition(n).write.mode("overwrite").parquet(nxt)
    os.rename(path, old)
    os.rename(nxt, path)
    shutil.rmtree(old)
    after = sum(
        1
        for dirpath, _d, fns in os.walk(path)
        for f in fns
        if f.endswith(".parquet")
    )
    return {
        "files_before": len(sizes),
        "files_after": after,
        "total_bytes": total,
    }


def compact_if_needed(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    max_files_per_target: float = 4.0,
    partition_col: str | None = None,
) -> dict:
    """Threshold-gated maintenance wrapper around compact_dataset: skip
    (cheaply, from the driver file listing alone) unless the dataset
    holds more than `max_files_per_target` × the ideal file count — the
    policy a scheduled maintenance job wants, so steady-state runs cost
    one os.walk and touch no data (rewriting a healthy dataset every
    night wastes a full read+write of it; the reference's own
    freshness-skip pattern, applied to layout).

    Returns compact_dataset's stats dict with "skipped": bool added;
    on skip, files_before == files_after == the current count.
    """
    import math
    import os

    sizes = []
    for dirpath, _d, filenames in os.walk(path):
        sizes += [
            os.path.getsize(os.path.join(dirpath, f))
            for f in filenames
            if f.endswith(".parquet")
        ]
    ideal = max(1, math.ceil(sum(sizes) / max(1, int(target_file_bytes))))
    if len(sizes) <= ideal * float(max_files_per_target):
        return {
            "skipped": True,
            "files_before": len(sizes),
            "files_after": len(sizes),
            "total_bytes": sum(sizes),
        }
    out = compact_dataset(
        spark, path, target_file_bytes=target_file_bytes,
        partition_col=partition_col,
    )
    out["skipped"] = False
    return out
