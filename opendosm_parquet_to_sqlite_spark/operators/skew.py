"""Skew remedies for keyed windows and keyed profiles — the operators the
rest of the tree points at with "salt upstream if one entity dominates"
(operators/temporal.py rolling_features, streaming/stateful.py profiles).

Two different skew problems, two different fixes:

1. Keyed AGGREGATES (batch_profile): Spark's hash aggregation already does
   map-side partial aggregation, so a hot key emits one partial row per
   input partition — the final exchange carries O(partitions) rows per key
   no matter how hot it is. salted_batch_profile makes that two-phase shape
   EXPLICIT (groupBy(key, salt) → merge) for the cases where the implicit
   partial combine is unavailable: planner fallbacks (e.g.
   spark.sql.aggregate.partialAggregationOptimization off-paths),
   ObjectHashAggregate spills on wide intermediate state, or engines/
   conformance modes that disable partial aggregation. Output is
   row-identical to batch_profile.

2. Keyed WINDOWS (rolling_features): a window function has NO partial
   phase — every row of a key lands in one task, sorts, and slides. A 90%
   hot key at 100 TB means one straggler task doing 90% of the sort.
   rolling_features_sliced exploits the TRAILING-window semantics: a row's
   frame reaches back only window_seconds, so time can be sliced into
   [k·slice, (k+1)·slice) chunks processed independently as long as each
   chunk also receives a replicated carry-in of the previous
   window_seconds of events. Partition key becomes (keys…, slice), the
   hot key's timeline spreads over ceil(span/slice) tasks, and each task's
   sort is O(slice_rows + carry_rows). Replication overhead is
   window/slice ≤ 1 extra copies of the boundary band only. Output is
   row-identical to rolling_features (same frame, same rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_batch_profile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    salt_factor: int = 16,
) -> DataFrame:
    """Two-phase (salted partial + merge) twin of
    streaming.stateful.batch_profile — identical output schema and values:
    (key, n_events, mean_value, m2_value, min_value, max_value, last_ts,
    last_value).

    Phase 1 groups by (key, salt) where salt = xxhash64(ts, value) %
    salt_factor — deterministic, no RNG — and computes mergeable partials
    (n, Σv, Σv², min, max, max ts, arg-max value + its order struct).
    Phase 2 merges the ≤ salt_factor partials per key. Every aggregate
    here is algebraic, so the merge is exact; the final mean/m2 rounding
    (6 dp) matches batch_profile's formula on the same totals.
    """
    if salt_factor < 1:
        raise ValueError(f"salt_factor must be >= 1, got {salt_factor}")
    v = F.col(value_col).cast("double")
    cols = [
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("long").alias("et"),
        v.alias("value"),
    ]
    if tiebreak_col:
        cols.append(F.col(tiebreak_col).alias("tb"))
        order = F.struct(F.col("et"), F.col("tb"))
    else:
        order = F.struct(F.col("et"))
    salt = F.pmod(
        F.xxhash64(F.col("et"), F.col("value")), F.lit(salt_factor)
    ).alias("__salt")
    partial = (
        df.select(*cols)
        .select("*", salt)
        .groupBy("key", "__salt")
        .agg(
            F.count(F.lit(1)).alias("p_n"),
            F.sum("value").alias("p_sum"),
            F.sum(F.col("value") * F.col("value")).alias("p_sum2"),
            F.min("value").alias("p_min"),
            F.max("value").alias("p_max"),
            F.max("et").alias("p_last_ts"),
            F.max(order).alias("p_last_order"),
            F.max_by("value", order).alias("p_last_value"),
        )
    )
    n = F.sum("p_n")
    s = F.sum("p_sum")
    avg = s / n
    return partial.groupBy("key").agg(
        n.alias("n_events"),
        F.round(avg, 6).alias("mean_value"),
        F.round(F.sum("p_sum2") - n * avg * avg, 6).alias("m2_value"),
        F.min("p_min").alias("min_value"),
        F.max("p_max").alias("max_value"),
        F.max("p_last_ts").alias("last_ts"),
        F.max_by("p_last_value", F.col("p_last_order")).alias("last_value"),
    )


def rolling_features_sliced(
    events: DataFrame,
    key_cols: list[str],
    ts_seconds_col: str,
    value_col: str,
    window_seconds: int,
    slice_seconds: int,
) -> DataFrame:
    """Row-identical twin of temporal.rolling_features that partitions by
    (keys…, time-slice) instead of keys alone — the hot-key remedy for
    trailing RANGE windows.

    slice_seconds must be >= window_seconds: then an owner row's frame
    [ts - window, ts] reaches at most one slice back, and every event in
    the final window_seconds band of a slice is replicated once into the
    next slice as carry-in history (it contributes to frames there but
    emits no output row of its own — the __owner filter drops it). Pick
    slice_seconds ~ hot-key span / desired parallelism, floored at
    window_seconds; replication cost is bounded by window/slice ≤ 1 extra
    copy of the boundary band.
    """
    win = int(window_seconds)
    sl = int(slice_seconds)
    if win <= 0:
        raise ValueError(f"window_seconds must be positive, got {win}")
    if sl < win:
        raise ValueError(
            f"slice_seconds ({sl}) must be >= window_seconds ({win}); a "
            "smaller slice cannot hold a full trailing window of history"
        )
    et = F.col(ts_seconds_col).cast("long")
    owner_slice = F.floor(et / F.lit(sl))
    # an event doubles as carry-in for the next slice iff some later ts
    # within window_seconds of it falls across the slice boundary
    carries = F.floor((et + F.lit(win)) / F.lit(sl)) > owner_slice
    sliced = events.select(
        "*",
        F.explode(
            F.when(
                carries, F.array(owner_slice, owner_slice + 1)
            ).otherwise(F.array(owner_slice))
        ).alias("__slice"),
    ).withColumn("__owner", F.col("__slice") == owner_slice)
    v = F.col(value_col).cast("double")
    w = (
        Window.partitionBy(*key_cols, "__slice")
        .orderBy(et)
        .rangeBetween(-win, 0)
    )
    return (
        sliced.select(
            "*",
            F.count(v).over(w).alias("roll_n"),
            F.round(F.sum(v).over(w), 6).alias("roll_sum"),
            F.round(F.avg(v).over(w), 6).alias("roll_mean"),
            F.round(F.min(v).over(w), 6).alias("roll_min"),
            F.round(F.max(v).over(w), 6).alias("roll_max"),
        )
        .filter(F.col("__owner"))
        .drop("__slice", "__owner")
    )
