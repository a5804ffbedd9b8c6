"""Streaming EWMA: drained ordered microbatch splits reproduce the batch
fold exactly — the recurrence carries across batch boundaries through one
double of per-key state."""

from __future__ import annotations

from opendosm_parquet_to_sqlite_spark.operators.temporal import ewma
from opendosm_parquet_to_sqlite_spark.streaming.incremental import (
    read_stream_parquet,
    run_available_now,
)
from opendosm_parquet_to_sqlite_spark.streaming.stateful import (
    ewma_stream,
    make_ewma_update_fn,
)

ROWS = [
    ("u1", 10, 5.0), ("u1", 20, 1.0), ("u1", 30, 9.0), ("u1", 40, 2.0),
    ("u2", 5, 100.0), ("u2", 15, 50.0), ("u2", 25, 0.0),
    ("u3", 7, -3.5),
]
SCHEMA = "u string, et long, value double"
ALPHA = 0.3


def _drain(spark, tmp_path, parts):
    src = tmp_path / "src"
    for i, part in enumerate(parts):
        spark.createDataFrame(part, schema=SCHEMA).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(src))
    sdf = read_stream_parquet(spark, str(src), SCHEMA)
    out = ewma_stream(sdf, "u", "et", "value", alpha=ALPHA)
    rows = []

    def sink(df, _bid):
        rows.extend(df.collect())

    run_available_now(out, str(tmp_path / "ckpt"), sink, output_mode="append")
    return sorted((r.key, r.et, r.ewma) for r in rows)


def _expected(spark):
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    out = ewma(df, "u", "et", "value", alpha=ALPHA)
    return sorted((r.u, r.et, r.ewma) for r in out.collect())


def test_stream_ewma_single_batch_matches_batch(spark, tmp_path):
    assert _drain(spark, tmp_path, [ROWS]) == _expected(spark)


def test_stream_ewma_split_mid_series_matches_batch(spark, tmp_path):
    by_time = sorted(ROWS, key=lambda r: r[1])
    parts = [by_time[:3], by_time[3:5], by_time[5:]]
    assert _drain(spark, tmp_path, parts) == _expected(spark)


def test_stream_ewma_per_row_split_matches_batch(spark, tmp_path):
    by_time = sorted(ROWS, key=lambda r: r[1])
    parts = [[r] for r in by_time]
    assert _drain(spark, tmp_path, parts) == _expected(spark)


class _FakeState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.removed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self.removed = True
        self._v = None


def test_ewma_update_fn_timeout_removes_state():
    fn = make_ewma_update_fn(0.3, ttl_ms=1000)
    st = _FakeState()
    st.hasTimedOut = True
    assert list(fn(("k",), iter([]), st)) == []
    assert st.removed


def test_ewma_update_fn_empty_batch_preserves_state():
    import pandas as pd

    fn = make_ewma_update_fn(0.3)
    st = _FakeState()
    st.update((4.2, 99))
    out = list(fn(("k",), iter([pd.DataFrame({"et": [], "value": []})]), st))
    assert out == []
    assert st.get == (4.2, 99)
