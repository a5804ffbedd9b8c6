"""resample_ffill: grid alignment, forward-fill, per-key bounds."""

from __future__ import annotations

import pytest

from opendosm_parquet_to_sqlite_spark.operators.temporal import resample_ffill

# key "a": events at t=95, 210, 460; step 100 -> grid 100, 200, 300, 400
# key "b": single event at t=1000 -> grid 1000 (exactly on a multiple)
# key "c": event at t=1001 -> ceil-aligned start 1100 > max 1001 -> NO rows
EVENTS = [
    ("a", 95, 1.0),
    ("a", 210, 2.0),
    ("a", 460, 3.0),
    ("b", 1000, 9.0),
    ("c", 1001, 7.0),
]


@pytest.fixture(scope="module")
def out(spark):
    df = spark.createDataFrame(EVENTS, schema="k string, et long, v double")
    rows = resample_ffill(df, ["k"], "et", ["v"], step_seconds=100).collect()
    return {(r.k, r.grid_ts): r.asof_v for r in rows}


def test_grid_is_ceil_aligned_global_multiples(out):
    assert {ts for (k, ts) in out if k == "a"} == {100, 200, 300, 400}


def test_forward_fill_carries_latest_at_or_before(out):
    assert out[("a", 100)] == 1.0   # only t=95 precedes
    assert out[("a", 200)] == 1.0   # t=210 is after the tick
    assert out[("a", 300)] == 2.0
    assert out[("a", 400)] == 2.0   # t=460 is after the last tick


def test_exact_multiple_event_is_included(out):
    # tick at 1000 >= event at 1000: ties count as at-or-before
    assert out[("b", 1000)] == 9.0


def test_key_with_empty_grid_emits_nothing(out):
    assert not [k for (k, _) in out if k == "c"]


def test_no_leading_nulls_anywhere(out):
    assert all(v is not None for v in out.values())


def test_invalid_step_raises(spark):
    df = spark.createDataFrame(EVENTS, schema="k string, et long, v double")
    with pytest.raises(ValueError, match="positive"):
        resample_ffill(df, ["k"], "et", ["v"], step_seconds=0)


def test_next_event_examples_history_order_and_first_drop(spark):
    from opendosm_parquet_to_sqlite_spark.operators.temporal import (
        next_event_examples,
    )

    rows = [
        (1, 10, 100, "a"), (1, 20, 101, "b"), (1, 30, 102, "c"),
        (1, 40, 103, "d"), (1, 50, 104, "e"),
        (2, 10, 200, "x"),                      # lone event -> dropped
    ]
    df = spark.createDataFrame(
        rows, "u long, ts long, eid long, ev string"
    )
    out = {
        (r["u"], r["ts"]): (list(r["history"]), r["n_history"], r["label"])
        for r in next_event_examples(
            df, "u", "ts", "ev", history=3, tiebreak_cols=["eid"]
        ).collect()
    }
    assert (2, 10) not in out and (1, 10) not in out
    assert out[(1, 20)] == (["a"], 1, "b")
    assert out[(1, 30)] == (["a", "b"], 2, "c")
    assert out[(1, 40)] == (["a", "b", "c"], 3, "d")
    # window slides: oldest event falls OUT of the context
    assert out[(1, 50)] == (["b", "c", "d"], 3, "e")


def test_next_event_examples_tiebreak_determinism(spark):
    from opendosm_parquet_to_sqlite_spark.operators.temporal import (
        next_event_examples,
    )

    rows = [(1, 10, 2, "late"), (1, 10, 1, "early"), (1, 20, 3, "z")]
    df = spark.createDataFrame(rows, "u long, ts long, eid long, ev string")
    out = {r["label"]: list(r["history"]) for r in next_event_examples(
        df, "u", "ts", "ev", history=2, tiebreak_cols=["eid"]
    ).collect()}
    assert out["late"] == ["early"]
    assert out["z"] == ["early", "late"]
