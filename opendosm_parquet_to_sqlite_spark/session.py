"""SparkSession factory with scale-appropriate defaults.

The reference runs single-threaded with everything in RAM
(/root/reference/src/main.rs:191,253). Here every default is chosen for a
multi-executor cluster and merely *tested* on local[N]:

- AQE on: runtime coalescing of shuffle partitions + skew-join splitting,
  so the same plan survives sf0.001 and 100 TB.
- shuffle.partitions sized by env (32 locally; a real cluster overrides —
  AQE coalesces down, so oversizing is safe, undersizing is not).
- Arrow enabled for the (rare) pandas-UDF paths and driver interchange.
- Session timezone pinned to UTC so date formatting is deterministic and
  matches the DuckDB oracle byte-for-byte.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "opendosm-parquet-to-sqlite-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Any already-active session is reused as-is (the driver owns the session
    in verify runs); defaults only apply when we create the session.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's coalescing floor (Spark default 1m) sets the MINIMUM
        # post-shuffle partition size. With parallelismFirst=true (also
        # default) AQE targets max(shuffleBytes/parallelism, floor) — so
        # any shuffle under parallelism × 1 MB gets coalesced BELOW the
        # core count, and a compute-dense reduce stage (in-bucket pair
        # explosion, keyed RANGE windows, 63-accumulator folds) runs on
        # 1-4 cores while the rest idle. Measured at sf0.1 (round-13 opt):
        # dedup_ngram_jaccard 3.08→1.83 s, interpolate_linear 2.54→1.44,
        # link_prediction 3.73→2.47, triangle_count 2.97→2.04 with a 64k
        # floor; no query regressed beyond noise. 64k stays far above
        # per-task overhead (~ms) and the floor only binds when a stage's
        # TOTAL shuffle is under parallelism × 64k — at production scale
        # those stages are sub-second either way, while mis-coalescing a
        # compute-dense small shuffle serializes the cluster at any
        # scale. Env-overridable for clusters that want the 1m default.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Runtime bloom filters: for shuffle joins with a selective build
        # side (the dedup survivor anti-joins, index probes), inject a
        # bloom filter on the probe side so non-matching rows drop at the
        # scan instead of crossing the exchange — free at local scale,
        # material at 100 TB.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # 100 TB stance: bound per-task input so scans parallelize evenly.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # Dimensions in this workload are tiny; keep default 10m threshold,
        # broadcast() hints are applied explicitly at join sites anyway.
        # 16g: a long-lived session that runs hundreds of distinct query
        # plans in one JVM accumulates un-reaped broadcast blocks +
        # codegen classes between GCs; at 8g the ~190-query bench suite
        # ran the heap to its ceiling (committed 7.6g) and the first
        # allocation-heavy query after the suite paid a multi-second
        # GC/cleanup storm (round-7 contamination_bloom "4.28x" — 0.9x
        # isolated). Headroom keeps old-gen pressure off the timings; a
        # real cluster sizes the driver independently anyway.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def release_cached(spark: SparkSession) -> None:
    """Drop every cached/persisted block in the session.

    Some lazy operators persist shared sub-plans (hashed shingle sets in
    operators.neardup, the permissive-parse split in sources.text_formats)
    that can only be consumed AFTER the function returns, so they cannot
    unpersist themselves. MEMORY_AND_DISK + LRU keeps the footprint
    bounded, but a long-lived session that interleaves many such calls
    with its own cached data should call this between workloads to avoid
    eviction pressure on its own blocks."""
    spark.catalog.clearCache()
