"""Bucketed-table sink: pre-shuffled, co-located storage for repeated joins.

The 100 TB join problem is not one join — it is the SAME join key used by
every downstream query (fact × fact on the entity id, probe × index on the
doc id).  Spark's answer is bucketing: `bucketBy(n, key)` pre-partitions
the data into a fixed number of hash buckets AT WRITE TIME and records the
layout in the catalog, so every later equi-join or aggregation on that key
reads both sides bucket-aligned and skips the exchange entirely — the sort
(for SMJ) and shuffle costs are paid once at ingest instead of per query.

This is the disk-backed sibling of the in-session `repartition` co-location
the join operators already use, and the rebuild's answer to the reference's
SQLite indexes (src/main.rs:199-206): those exist so CONSUMER queries are
fast; bucketed layout is the Spark-native equivalent for the join/agg
surface.

Mechanics and constraints (all public Spark semantics):

- bucketBy requires `saveAsTable` (a catalog entry records bucket count +
  columns; a bare path write cannot carry that metadata).  Works with the
  default in-memory/native catalog — no Hive metastore needed.
- Exchange elision requires BOTH sides bucketed on the join key with the
  same bucket count (or one side's count a divisor, with
  spark.sql.bucketing.coalesceBucketsInJoin.enabled).  `sortBy` on the
  same key additionally pre-sorts each bucket file so sort-merge join
  skips its sort.
- One file per (task, bucket) is written; repartition on the bucket key
  first keeps it to one file per bucket — many small writers would
  otherwise produce writers × buckets files.
- Pick the bucket count for the TARGET scale: buckets are the parallelism
  floor for bucket-aligned reads, and each bucket should land well under
  executor memory (≈ table_size / buckets ≤ a few hundred MB at 100 TB
  means thousands of buckets; the number must be fixed at write time, so
  size it for the table's growth horizon, not its current size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a parquet catalog table bucketed (and by default
    sorted) on `bucket_col`.  The repartition keeps output to one file per
    bucket regardless of upstream parallelism."""
    writer = (
        df.repartition(int(n_buckets), bucket_col)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(int(n_buckets), bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key.  When both
    tables were written with write_bucketed on the same key and bucket
    count, the physical plan has NO Exchange on either side (pinned by
    tests/test_bucketed.py) — the join cost is the bucket-aligned scan.

    The AQE caveat: adaptive execution can coalesce the scan partitions
    and reintroduce an exchange if the bucket counts mismatch; matching
    counts side-step it.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
