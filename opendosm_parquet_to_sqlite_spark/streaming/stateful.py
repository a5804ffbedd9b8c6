"""Custom stateful streaming operator: per-key running feature state via
applyInPandasWithState — the feature-store maintenance pattern.

Built-in streaming aggregations cover max_by/count/window shapes
(incremental.py); this module is the CUSTOM-state escape hatch for
semantics they can't express: an entity profile that must update
incrementally per key with arbitrary merge logic (running moments for
z-scoring, last-seen carry-forward, event counts) and support TTL eviction
of dormant keys.

State per key is a fixed-size tuple (count, sum, sum of squares, min, max,
last_ts, last_value) — O(1) per entity, the only state shape that survives
unbounded streams. Each microbatch updates only the keys present in it and
emits their refreshed profiles (update-style: downstream upserts by key).
GroupStateTimeout evicts keys idle longer than `ttl_ms` (processing-time —
event-time TTL would need watermark plumbing; the profile emit is
idempotent so a re-created key after eviction simply restarts its counts,
the standard trade for bounded state).

Batch equivalence is the test contract: draining a parquet fixture through
the stream (in any microbatch split) produces exactly the per-key profile
the batch groupBy aggregate computes — float dust aside, which the 6 dp
round absorbs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = (
    "n long, s double, s2 double, mn double, mx double, "
    "last_ts long, last_v double"
)
OUTPUT_SCHEMA = (
    "key string, n_events long, mean_value double, m2_value double, "
    "min_value double, max_value double, last_ts long, last_value double"
)


def _update_profile(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this microbatch's rows for one key into its running tuple.

    Welford-free formulation: (n, Σv, Σv²) partial sums merge exactly and
    match the batch aggregate's algebra; m2 = Σv² − n·mean² is derived at
    emit time only."""
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        n, s, s2, mn, mx, last_ts, last_v = state.get
    else:
        n, s, s2 = 0, 0.0, 0.0
        mn, mx = float("inf"), float("-inf")
        last_ts, last_v = -1, 0.0
    for pdf in pdfs:
        vs = pdf["value"].astype("float64")
        ts = pdf["et"].astype("int64")
        n += len(pdf)
        s += float(vs.sum())
        s2 += float((vs * vs).sum())
        mn = min(mn, float(vs.min()))
        mx = max(mx, float(vs.max()))
        i = int(ts.idxmax())
        if int(ts.loc[i]) >= last_ts:
            last_ts, last_v = int(ts.loc[i]), float(vs.loc[i])
    state.update((n, s, s2, mn, mx, last_ts, last_v))
    mean = s / n
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_events": [n],
            "mean_value": [round(mean, 6)],
            "m2_value": [round(s2 - n * mean * mean, 6)],
            "min_value": [mn],
            "max_value": [mx],
            "last_ts": [last_ts],
            "last_value": [last_v],
        }
    )


def make_update_fn(ttl_ms: int | None):
    """The per-key update function, optionally TTL-armed. Module-level so
    the TTL path is unit-testable with a fake GroupState: a live-stream
    TTL test cannot terminate, because ProcessingTimeTimeout registers a
    timer the availableNow drain then waits out (observed: the drain
    blocks until the timer fires — a 60 s TTL hangs the suite)."""
    if ttl_ms is None:
        return _update_profile

    def with_ttl(key, pdfs, state):
        yield from _update_profile(key, pdfs, state)
        if not state.hasTimedOut:
            state.setTimeoutDuration(ttl_ms)

    return with_ttl


def running_profile_stream(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Continuously-maintained per-key value profile (count / mean / m2 /
    min / max / last): groupBy(key).applyInPandasWithState. Emits one
    refreshed profile row per key per microbatch it appears in.

    ttl_ms evicts state for keys idle that long (None = keep forever —
    only sane for bounded key universes)."""
    src = sdf.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("long").alias("et"),
        F.col(value_col).cast("double").alias("value"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy("key").applyInPandasWithState(
        make_update_fn(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def batch_profile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """The batch twin: same profile via one groupBy — the backfill path
    and the streaming operator's equivalence oracle. Hash aggregation
    partial-combines map-side, so hot keys are already fine here;
    operators.skew.salted_batch_profile is the row-identical explicit
    two-phase shape for planner modes without partial aggregation.

    tiebreak_col makes last_value deterministic when (key, ts) collides
    (the streaming operator's contract is unique ts per key; batch inputs
    with duplicate timestamps need an explicit total order)."""
    v = F.col(value_col).cast("double")
    order = (
        F.struct(F.col("et"), F.col("tb"))
        if tiebreak_col
        else F.struct(F.col("et"))
    )
    cols = [
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("long").alias("et"),
        v.alias("value"),
    ]
    if tiebreak_col:
        cols.append(F.col(tiebreak_col).alias("tb"))
    return (
        df.select(*cols)
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("mean_value"),
            F.round(
                F.sum(F.col("value") * F.col("value"))
                - F.count(F.lit(1)) * F.avg("value") * F.avg("value"),
                6,
            ).alias("m2_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.max("et").alias("last_ts"),
            F.max_by("value", order).alias("last_value"),
        )
    )


# --- streaming transition counts --------------------------------------------

TRANS_STATE_SCHEMA = "last_ev string, last_ts long"
TRANS_OUTPUT_SCHEMA = (
    "key string, from_event string, to_event string, n long"
)


def _update_transitions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Chain this microbatch's events for one user onto the carried
    (last_event, last_ts) state and emit the batch's transition DELTAS.

    Contract (same as the running profile): event time is unique and
    non-decreasing per user across microbatches — the append-stream
    assumption. Within a batch rows sort by event time, so any split of
    an ordered stream yields identical totals."""
    if state.hasTimedOut:
        state.remove()
        return
    last_ev, last_ts = state.get if state.exists else (None, -1)
    counts: dict[tuple, int] = {}
    for pdf in pdfs:
        pdf = pdf.sort_values("et")
        for ev, et in zip(pdf["ev"], pdf["et"]):
            if last_ev is not None:
                pair = (last_ev, ev)
                counts[pair] = counts.get(pair, 0) + 1
            last_ev, last_ts = ev, int(et)
    state.update((last_ev, last_ts))
    if counts:
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(counts),
                "from_event": [a for a, _ in counts],
                "to_event": [b for _, b in counts],
                "n": list(counts.values()),
            }
        )


def make_transition_update_fn(ttl_ms: int | None):
    """TTL-armed wrapper (see make_update_fn for why module-level)."""
    if ttl_ms is None:
        return _update_transitions

    def with_ttl(key, pdfs, state):
        yield from _update_transitions(key, pdfs, state)
        if not state.hasTimedOut:
            state.setTimeoutDuration(ttl_ms)

    return with_ttl


def transition_counts_stream(
    sdf: DataFrame,
    user_col: str,
    ts_col: str,
    event_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Continuously-maintained first-order transition counts: per-user
    O(1) state (just the last event seen), per-microbatch DELTA emission
    of (user, from, to, n) — downstream sums deltas by (from, to) to
    maintain the live transition matrix (operators.temporal.
    transition_matrix is the batch twin / backfill path; equivalence is
    the test contract).

    State is ONE event name per user regardless of stream length — the
    minimal-state formulation; a windowed variant would carry event
    history, this one never does. ttl_ms evicts dormant users (a user
    returning after eviction restarts the chain: its first new event
    emits no transition — the standard bounded-state trade, same as the
    running profile)."""
    src = sdf.select(
        F.col(user_col).cast("string").alias("key"),
        F.col(ts_col).cast("long").alias("et"),
        F.col(event_col).cast("string").alias("ev"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy("key").applyInPandasWithState(
        make_transition_update_fn(ttl_ms),
        outputStructType=TRANS_OUTPUT_SCHEMA,
        stateStructType=TRANS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


# --- streaming EWMA ----------------------------------------------------------

EWMA_STATE_SCHEMA = "s double, last_ts long"
EWMA_OUTPUT_SCHEMA = "key string, et long, value double, ewma double"


def make_ewma_update_fn(alpha: float, ttl_ms: int | None = None):
    """Per-key EWMA recurrence across microbatches: state is ONE double
    (the last smoothed value) + the last event time — O(1) per key, the
    smallest possible stateful footprint.  Rows within a microbatch are
    sorted by event time before folding; ordering ACROSS microbatches is
    the source's contract (same as every recurrence: a late row cannot be
    retro-folded — route late data through the batch twin instead).

    Module-level factory for the same reason as make_update_fn: the TTL
    path is unit-testable with a fake GroupState without arming a real
    processing-time timer."""
    a = float(alpha)

    def update(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            s, last_ts = state.get
        else:
            s, last_ts = None, -(1 << 62)
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            if state.exists:
                state.update((s, last_ts))
            return
        pdf = pd.concat(frames).sort_values(["et"], kind="mergesort")
        out_s = []
        for v in pdf["value"].astype("float64"):
            s = v if s is None else a * v + (1.0 - a) * s
            out_s.append(round(s, 6))
        last_ts = int(pdf["et"].iloc[-1])
        state.update((float(s), last_ts))
        yield pd.DataFrame(
            {
                "key": key[0],
                "et": pdf["et"].astype("int64").values,
                "value": pdf["value"].astype("float64").values,
                "ewma": out_s,
            }
        )

    if ttl_ms is None:
        return update

    def with_ttl(key, pdfs, state):
        yield from update(key, pdfs, state)
        if not state.hasTimedOut:
            state.setTimeoutDuration(ttl_ms)

    return with_ttl


def ewma_stream(
    sdf: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.2,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming twin of operators.temporal.ewma: emits every event with
    its smoothed value as it arrives (append semantics), carrying the
    recurrence across microbatches through one double of state per key.
    Draining an ordered split reproduces the batch fold EXACTLY
    (tests/test_stream_ewma.py) because both paths apply the same FP
    operations in the same event-time order."""
    src = sdf.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("long").alias("et"),
        F.col(value_col).cast("double").alias("value"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy("key").applyInPandasWithState(
        make_ewma_update_fn(alpha, ttl_ms),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
