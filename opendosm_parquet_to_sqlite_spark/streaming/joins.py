"""Stream-stream interval join: enrich a live event stream with another
live stream's recent rows — the click↔impression / trade↔quote shape.

The reference has no streaming at all (its cron loop re-runs a batch
binary, script.sh:2-4); batch-side the engine already covers equi joins
(operators/joins.py) and as-of joins (operators/temporal.py). This module
adds the STREAMING join: both sides unbounded, matches constrained to a
time interval so Spark can bound join state with watermarks.

Semantics (inner): left row L joins right row R when the keys match and
R.ts ∈ [L.ts - lookback_seconds, L.ts] — "the right row happened at or
before the left row, within the lookback". That interval condition is
what lets the state store evict: each side keeps only rows younger than
watermark + lookback, so state is O(rate × (watermark + lookback)), not
O(stream).

Batch twin: interval_join_batch — the same predicate on static frames —
is the backfill path and the drain-equivalence oracle (stream drained
with availableNow over complete sources == batch join; pinned in
tests/test_stream_join.py).

Scale: the stream-stream join shuffles both sides by key into the state
store; skew rules are the same as any keyed exchange. The time bound is
MANDATORY here by design — an unbounded stream-stream join's state grows
forever, so this API refuses to express one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_HOWS = ("inner", "left_outer", "right_outer", "full_outer")


def _check_how(how: str) -> None:
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}, got {how!r}")


def _out_cols(on: list[str], left_cols: list[str], right_cols: list[str]):
    """Join keys coalesced across sides (non-NULL in every outer mode),
    then l.* minus keys, then r.* minus keys."""
    return [
        *[
            F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k)
            for k in on
        ],
        *[F.col(f"l.{c}") for c in left_cols if c not in on],
        *[F.col(f"r.{c}") for c in right_cols if c not in on],
    ]


def _interval_cond(on: list[str], left_ts: str, right_ts: str, lookback: int):
    cond = None
    for k in on:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else cond & c
    lo = F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback} SECONDS")
    c = (F.col(f"r.{right_ts}") >= lo) & (
        F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")
    )
    return cond & c


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lookback_seconds: int,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join on `on` keys with
    R.ts ∈ [L.ts - lookback_seconds, L.ts].

    how: 'inner', 'left_outer', 'right_outer', or 'full_outer'. Outer
    modes are the orphan-detection shapes: a row with no match within the
    interval emits with NULL columns from the other side, but only once
    the watermark proves no match can still arrive — outer rows therefore
    trail the watermark by construction. All four modes keep bounded
    state: the interval condition `R.ts ∈ [L.ts - lookback, L.ts]` bounds
    the time gap in BOTH directions (0 ≤ L.ts - R.ts ≤ lookback), which
    is exactly what Spark's state store needs to evict either side — so
    full_outer is expressible here even though an unconstrained streaming
    full join would not be.

    Both inputs must be streaming DataFrames with event-time timestamp
    columns `left_ts` / `right_ts`. The watermark bounds how late either
    side may arrive; rows later than that can silently miss matches — the
    standard streaming-join trade, choose it from the source's real
    lateness. Column name collisions beyond the join keys must be
    resolved by the caller. Output contract: the join keys (coalesced
    across sides, so they are non-NULL in every outer mode), then l.*
    minus keys, then r.* minus keys.
    """
    _check_how(how)
    lb = int(lookback_seconds)
    if lb < 0:
        raise ValueError(f"lookback_seconds must be >= 0, got {lb}")
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    joined = l.join(r, _interval_cond(on, left_ts, right_ts, lb), how)
    return joined.select(*_out_cols(on, left.columns, right.columns))


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lookback_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """The batch twin (backfill + equivalence oracle). Same predicate; in
    batch Spark plans the equi-keys as a hash join with the interval as a
    post-filter — never a BNLJ, because the key equality is extractable."""
    _check_how(how)
    lb = int(lookback_seconds)
    if lb < 0:
        raise ValueError(f"lookback_seconds must be >= 0, got {lb}")
    l = left.alias("l")
    r = right.alias("r")
    return l.join(r, _interval_cond(on, left_ts, right_ts, lb), how).select(
        *_out_cols(on, left.columns, right.columns)
    )
