"""Streaming transition counts: delta emissions sum to the batch
transition matrix under any ordered microbatch split."""

from __future__ import annotations

from collections import defaultdict

from opendosm_parquet_to_sqlite_spark.operators.temporal import (
    transition_matrix,
)
from opendosm_parquet_to_sqlite_spark.streaming.incremental import (
    read_stream_parquet,
    run_available_now,
)
from opendosm_parquet_to_sqlite_spark.streaming.stateful import (
    transition_counts_stream,
)

ROWS = [
    # (user, et, ev) — unique, increasing et per user
    ("u1", 10, "A"), ("u1", 20, "B"), ("u1", 30, "A"), ("u1", 40, "C"),
    ("u2", 5, "B"), ("u2", 15, "B"), ("u2", 25, "A"),
    ("u3", 7, "C"),
]
SCHEMA = "u string, et long, ev string"


def _drain(spark, tmp_path, parts):
    src = tmp_path / "src"
    for i, part in enumerate(parts):
        spark.createDataFrame(part, schema=SCHEMA).write.mode(
            "append" if i else "overwrite"
        ).parquet(str(src))
    sdf = read_stream_parquet(spark, str(src), SCHEMA)
    out = transition_counts_stream(sdf, "u", "et", "ev")
    totals = defaultdict(int)

    def sink(df, _bid):
        for r in df.collect():
            totals[(r.from_event, r.to_event)] += r.n  # delta semantics

    run_available_now(out, str(tmp_path / "ckpt"), sink, output_mode="update")
    return dict(totals)


def _expected(spark):
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    return {
        (r["from_event"], r["to_event"]): r["n"]
        for r in transition_matrix(df, "u", "et", "ev").collect()
    }


def test_stream_transitions_match_batch_single_batch(spark, tmp_path):
    assert _drain(spark, tmp_path, [ROWS]) == _expected(spark)


def test_stream_transitions_match_batch_any_ordered_split(spark, tmp_path):
    # split mid-chain: u1's A->B crosses the batch boundary via state
    by_time = sorted(ROWS, key=lambda r: r[1])
    parts = [by_time[:3], by_time[3:6], by_time[6:]]
    assert _drain(spark, tmp_path, parts) == _expected(spark)


def test_stream_transitions_single_event_user_emits_nothing(spark, tmp_path):
    got = _drain(spark, tmp_path, [[("solo", 1, "A")]])
    assert got == {}
