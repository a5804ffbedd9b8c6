"""applyInPandasWithState running profile: streaming == batch under any
microbatch split; state TTL wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.streaming.incremental import (
    read_stream_parquet,
    run_available_now,
)
from opendosm_parquet_to_sqlite_spark.streaming.stateful import (
    batch_profile,
    make_update_fn,
    running_profile_stream,
)

ROWS = [
    # (key, et, value) — unique et per key (the operator's tie contract)
    ("a", 10, 1.0), ("a", 20, 5.0), ("a", 30, 3.0),
    ("b", 11, -2.0), ("b", 25, 4.5),
    ("c", 7, 0.25),
]
SCHEMA = "k string, et long, value double"


def _drain(spark, tmp_path, parts: list[list[tuple]]) -> dict:
    src = tmp_path / "src"
    for i, part in enumerate(parts):
        spark.createDataFrame(part, schema=SCHEMA).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(src))
        # each write lands as new files; maxFilesPerTrigger=1 in the reader
        # would force per-file batches — availableNow already splits per
        # file-discovery here, and correctness must not depend on it
    sdf = read_stream_parquet(spark, str(src), SCHEMA)
    out = running_profile_stream(sdf, "k", "et", "value")
    got: dict[str, tuple] = {}

    def sink(df, _bid):
        for r in df.collect():
            got[r.key] = r  # update semantics: last emit per key wins

    run_available_now(out, str(tmp_path / "ckpt"), sink, output_mode="update")
    return got


def _expected(spark):
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    return {r.key: r for r in batch_profile(df, "k", "et", "value").collect()}


FIELDS = [
    "n_events", "mean_value", "m2_value",
    "min_value", "max_value", "last_ts", "last_value",
]


def test_streaming_profile_matches_batch(spark, tmp_path):
    got = _drain(spark, tmp_path, [ROWS])
    want = _expected(spark)
    assert set(got) == set(want)
    for k in want:
        for f in FIELDS:
            assert got[k][f] == pytest.approx(want[k][f], abs=1e-9), (k, f)


def test_streaming_profile_split_independent(spark, tmp_path):
    # different microbatch split -> same final profiles
    got = _drain(spark, tmp_path, [ROWS[:2], ROWS[2:5], ROWS[5:]])
    want = _expected(spark)
    assert set(got) == set(want)
    for k in want:
        for f in FIELDS:
            assert got[k][f] == pytest.approx(want[k][f], abs=1e-9), (k, f)


def test_last_value_tracks_event_time_not_arrival(spark, tmp_path):
    # key "a"'s latest-ts row arrives in the FIRST batch; a later batch
    # carries an older event — last_value must stay with the newer ts
    part1 = [("a", 100, 9.0)]
    part2 = [("a", 50, 1.0)]
    got = _drain(spark, tmp_path, [part1, part2])
    assert got["a"].last_ts == 100
    assert got["a"].last_value == 9.0
    assert got["a"].n_events == 2


class FakeState:
    """Minimal GroupState double for the TTL unit path (a live-stream TTL
    test can't terminate: the availableNow drain waits out the
    ProcessingTimeTimeout timer — see make_update_fn's docstring)."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_set_ms = ms


def test_ttl_update_arms_timer_and_emits():
    import pandas as pd

    fn = make_update_fn(ttl_ms=60_000)
    st = FakeState()
    pdf = pd.DataFrame({"value": [1.0, 5.0, 3.0], "et": [10, 20, 30]})
    out = list(fn(("a",), iter([pdf]), st))
    assert st.timeout_set_ms == 60_000
    assert len(out) == 1 and out[0]["n_events"].iloc[0] == 3
    assert out[0]["last_value"].iloc[0] == 3.0  # et=30 is newest


def test_ttl_timeout_evicts_without_emit():
    fn = make_update_fn(ttl_ms=60_000)
    st = FakeState(value=(2, 6.0, 20.0, 1.0, 5.0, 20, 5.0), timed_out=True)
    out = list(fn(("a",), iter([]), st))
    assert out == []
    assert st.removed
    assert st.timeout_set_ms is None  # no re-arm on the eviction call


def test_state_merge_resumes_from_existing_tuple():
    import pandas as pd

    fn = make_update_fn(ttl_ms=None)
    st = FakeState(value=(2, 6.0, 26.0, 1.0, 5.0, 20, 5.0))
    pdf = pd.DataFrame({"value": [3.0], "et": [30]})
    out = list(fn(("a",), iter([pdf]), st))
    assert st.get[0] == 3 and st.get[1] == 9.0  # n, sum merged
    assert out[0]["last_ts"].iloc[0] == 30


# --- hypothesis fuzz: random microbatch splits × TTL boundaries --------------
#
# Values are drawn as half-integers (i/2): sums and squares of halves are
# exact in float64 at these sizes, so stream-vs-batch comparison is exact
# equality, not approx — no 6-dp rounding flake under random sum order.

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EV = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=10_000),
        st.integers(min_value=-200, max_value=200).map(lambda i: i / 2),
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda t: (t[0], t[1]),  # unique et per key: the tie contract
)


def _profile_oracle(events):
    """NumPy-free exact oracle of the running profile for one key."""
    n = len(events)
    s = sum(v for _, v in events)
    s2 = sum(v * v for _, v in events)
    mean = s / n
    last_ts, last_v = max(events)
    return {
        "n_events": n,
        # round() tie-hazard audit (round-6 verdict): values are exact
        # halves and n <= 10, so exact means/m2 terminate within 6 dp
        # (denominators divide 32/40); inexact ones have 17-digit shortest
        # reprs, which can't sit exactly on a 1e-6 half boundary. Safe.
        "mean_value": round(mean, 6),
        "m2_value": round(s2 - n * mean * mean, 6),
        "min_value": min(v for _, v in events),
        "max_value": max(v for _, v in events),
        "last_ts": last_ts,
        "last_value": last_v,
    }


@settings(max_examples=50, deadline=None)
@given(data=st.data())
def test_update_fn_fuzz_any_batching_and_ttl(data):
    """One key's event stream, split into random pdf batches across random
    update calls, with TTL timeouts injected at random points: every emit
    must equal the exact oracle of all events since the last eviction, and
    each eviction must reset the running state."""
    import pandas as pd

    events = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10_000),
                st.integers(min_value=-200, max_value=200).map(
                    lambda i: i / 2
                ),
            ),
            min_size=1,
            max_size=12,
            unique_by=lambda t: t[0],
        )
    )
    fn = make_update_fn(ttl_ms=60_000)
    st_ = FakeState()
    seen_since_eviction: list[tuple] = []
    i = 0
    while i < len(events):
        if st_.exists and data.draw(st.booleans(), label=f"timeout@{i}"):
            # TTL boundary: the timer fired before this batch arrived
            st_.hasTimedOut = True
            assert list(fn(("k",), iter([]), st_)) == []
            assert st_.removed and not st_.exists
            st_ = FakeState()
            seen_since_eviction = []
        # a random consecutive chunk, itself split into 1-2 pdfs
        j = data.draw(
            st.integers(min_value=i + 1, max_value=len(events)),
            label=f"chunk@{i}",
        )
        chunk = events[i:j]
        cut = data.draw(
            st.integers(min_value=0, max_value=len(chunk)), label=f"cut@{i}"
        )
        pdfs = [
            pd.DataFrame({"et": [e for e, _ in part],
                          "value": [v for _, v in part]})
            for part in (chunk[:cut], chunk[cut:])
            if part
        ]
        out = list(fn(("k",), iter(pdfs), st_))
        seen_since_eviction += chunk
        assert len(out) == 1
        want = _profile_oracle(seen_since_eviction)
        got = out[0].iloc[0]
        for f, w in want.items():
            assert got[f] == w, (f, got[f], w)
        assert st_.timeout_set_ms == 60_000  # re-armed after every update
        i = j


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
@pytest.mark.slow
def test_streaming_profile_fuzz_split_matches_batch(spark, tmp_path, data):
    """Random multi-key event set, random arrival permutation, random
    microbatch split: the drained profiles must equal the batch twin
    EXACTLY (half-integer values make the algebra exact)."""
    rows = data.draw(_EV)
    perm = data.draw(st.permutations(rows))
    n_parts = data.draw(st.integers(min_value=1, max_value=3))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=len(perm)),
                min_size=n_parts - 1,
                max_size=n_parts - 1,
            )
        )
    )
    parts, prev = [], 0
    for c in cuts + [len(perm)]:
        parts.append(perm[prev:c])
        prev = c
    parts = [p for p in parts if p]
    d = tmp_path / uuid.uuid4().hex
    got = _drain(spark, d, parts)
    df = spark.createDataFrame(rows, schema=SCHEMA)
    want = {r.key: r for r in batch_profile(df, "k", "et", "value").collect()}
    assert set(got) == set(want)
    for k in want:
        for f in FIELDS:
            assert got[k][f] == want[k][f], (k, f)
