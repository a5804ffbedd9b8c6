"""Scale-adaptive parallelism helpers (optimization round 13).

Two measured local-scale failure modes motivate this module, both of
which are *input-size* artifacts that vanish at 100 TB but serialize a
32-core box at bench scale — and both of whose fixes are no-ops (or
strictly correct) at cluster scale:

1. **Unsplittable tiny scans serialize map-side compute.** The test
   fixtures are single-row-group parquet files, so every scan is ONE
   task no matter what `spark.sql.files.maxPartitionBytes` says — and
   any compute-dense map chain sitting on the scan (a ×B explode with a
   per-row md5, a 63-accumulator SimHash fold, tokenize+shingle+hash)
   runs on one core while 31 idle. Measured: bootstrap_ci spent 8.1 s
   of an 8.5 s wall in ONE task. `fan_out()` round-robin-spreads the
   scan output across the cluster — but ONLY when the driver-side file
   listing proves the scan has fewer splits than the cluster has cores
   (guide §2.5 "input skew: one huge unsplittable file … repartition
   immediately after the read"). At 100 TB the scan has thousands of
   splits and fan_out is an exact no-op; the decision reads file
   metadata only (no Spark job).

2. **Iterative loops inherit a fixed exchange width.** The graph loops
   (connected components, PageRank, LPA, k-core) lay their edge lists
   out at `spark.sql.shuffle.partitions` so per-round joins are
   exchange-free — but a fixed width means a 3 000-edge near-dup graph
   pays 32-task stages every round (measured: event_pagerank = 3 628
   tasks for 4.8 MB of total shuffle). `loop_partitions()` derives the
   loop width from the MEASURED edge count (the loop materializes its
   edge list anyway, so the count is a cached-block aggregate, not an
   extra pass), clamped to [1, spark.sql.shuffle.partitions]: small
   graphs run 1-wide rounds, big graphs keep the configured cluster
   width. The clamp ceiling is the cluster-parameterized conf, so at
   100 TB behavior is IDENTICAL to the fixed-width layout.

Neither helper changes any result: round-robin repartition only moves
rows between tasks, and loop width only changes physical layout. (Float
aggregation order can move by ±1 ulp, exactly as it already does
between any two partitionings — the DuckDB oracle comparison, which
computes every sum in a different order anyway, is the regression gate
for that and stays green: verified for every touched query.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Target edge rows per loop partition: 2M rows of (long, long) pairs is
# ~100-200 MB in shuffle form — the guide §2.2 partition sweet spot.
# Override via get_spark/extra conf if a cluster wants a different
# density; the ceiling is always spark.sql.shuffle.partitions.
LOOP_ROWS_PER_PARTITION = 2_000_000


def _conf_bytes(spark: SparkSession, key: str, default: int) -> int:
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    mult = 1
    for suf, m in (("k", 1024), ("m", 1024**2), ("g", 1024**3)):
        if raw.endswith(suf + "b"):
            raw, mult = raw[:-2], m
            break
        if raw.endswith(suf):
            raw, mult = raw[:-1], m
            break
    try:
        return int(float(raw) * mult)
    except ValueError:
        return default


def scan_task_estimate(df: DataFrame) -> int | None:
    """Number of EFFECTIVE scan tasks Spark will give `df`'s file
    sources — driver-side metadata only (file listing + lengths +
    parquet footers), NO Spark job. None when the plan has no file scan
    (in-memory / RDD frames) or the FS refuses; callers treat None as
    "unknown" and leave the plan alone.

    Round-14 (closes the round-13 ADVICE gap): the estimate now mirrors
    Spark's actual split size — maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, totalBytes / defaultParallelism)) — instead of
    maxPartitionBytes alone, so a small-but-splittable scan that Spark
    already fans out to ~defaultParallelism tasks no longer triggers a
    redundant fan_out shuffle. And because a parquet byte-split only
    yields work when a row-group MIDPOINT falls inside it, the byte
    estimate is additionally capped by the files' total row-group count
    (read from the footers): a large single-row-group file — the exact
    unsplittable-scan failure mode fan_out exists for — now estimates 1
    task no matter what the byte math says."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        spark = df.sparkSession
        sc = spark.sparkContext
        jvm = sc._jvm
        conf = sc._jsc.hadoopConfiguration()
        mpb = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes", 128 * 1024**2)
        open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes", 4 * 1024**2)
        par = max(1, sc.defaultParallelism)
        total = 0
        for p in files:
            path = jvm.org.apache.hadoop.fs.Path(p)
            length = path.getFileSystem(conf).getFileStatus(path).getLen()
            total += length + open_cost
        max_split = min(mpb, max(open_cost, -(-total // par)))
        est = max(1, -(-total // max_split))
        if est > 1:
            rg = _total_row_groups(files)
            if rg is not None:
                est = min(est, max(1, rg))
        return est
    except Exception:  # noqa: BLE001 — a size probe must never fail a plan
        return None


def _total_row_groups(files: list[str]) -> int | None:
    """Total parquet row groups across `files` (footer metadata only) —
    None for non-parquet paths or when the footer read fails."""
    try:
        from urllib.parse import unquote, urlparse

        import pyarrow.parquet as pq

        total = 0
        for p in files:
            if not p.endswith(".parquet"):
                return None
            local = unquote(urlparse(p).path) if ":" in p else p
            total += pq.ParquetFile(local).metadata.num_row_groups
        return total
    except Exception:  # noqa: BLE001 — a size probe must never fail a plan
        return None


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a provably-small scan across the cluster before
    compute-dense map work (see module docstring, failure mode 1).

    No-op unless the driver-side estimate proves the scan has fewer
    splits than `defaultParallelism` — i.e. strictly a small-input
    rescue: at any real scale this returns `df` unchanged. Apply AFTER
    the narrow projection so the one round-robin exchange carries only
    the columns the compute needs (guide §2.3)."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    est = scan_task_estimate(df)
    if est is None or est >= par:
        return df
    return df.repartition(par)


def loop_partitions(spark: SparkSession, n_rows: int) -> int:
    """Exchange width for an iterative loop over a materialized edge/node
    table of `n_rows` rows: ceil(n_rows / LOOP_ROWS_PER_PARTITION)
    clamped to [1, spark.sql.shuffle.partitions] (see module docstring,
    failure mode 2)."""
    try:
        ceiling = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except ValueError:  # e.g. "auto"
        ceiling = 32
    want = max(1, -(-int(n_rows) // LOOP_ROWS_PER_PARTITION))
    return min(want, max(ceiling, 1))
