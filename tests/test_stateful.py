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
