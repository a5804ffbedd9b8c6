"""Stream-stream interval join: drained stream == batch twin; interval
boundary semantics."""

from __future__ import annotations

from datetime import datetime

import pytest

from opendosm_parquet_to_sqlite_spark.streaming.incremental import (
    read_stream_parquet,
    run_available_now,
)
from opendosm_parquet_to_sqlite_spark.streaming.joins import (
    interval_join_batch,
    interval_join_stream,
)

L_SCHEMA = "k int, lts timestamp, l_tag string"
R_SCHEMA = "k int, rts timestamp, r_tag string"


def _t(s):
    return datetime.fromisoformat(s)


LEFT = [
    (1, _t("2024-01-01T10:00:00"), "L1"),
    (1, _t("2024-01-01T12:00:00"), "L2"),
    (2, _t("2024-01-01T10:30:00"), "L3"),
]
RIGHT = [
    (1, _t("2024-01-01T09:00:00"), "R-old"),      # 3600s before L1: boundary
    (1, _t("2024-01-01T09:59:59"), "R-in"),       # inside L1's window
    (1, _t("2024-01-01T12:00:00"), "R-tie"),      # ties L2 exactly
    (1, _t("2024-01-01T12:00:01"), "R-future"),   # after L2: never matches
    (2, _t("2024-01-01T10:00:00"), "R-k2"),
    (3, _t("2024-01-01T10:00:00"), "R-nokey"),    # unseen key
]


def test_batch_interval_join_boundaries(spark):
    l = spark.createDataFrame(LEFT, L_SCHEMA)
    r = spark.createDataFrame(RIGHT, R_SCHEMA)
    out = interval_join_batch(l, r, ["k"], "lts", "rts", 3600)
    got = sorted((row.l_tag, row.r_tag) for row in out.collect())
    assert got == sorted(
        [
            ("L1", "R-old"),    # et-lookback boundary is inclusive
            ("L1", "R-in"),
            ("L2", "R-tie"),    # equal ts matches
            ("L3", "R-k2"),
        ]
    )


def test_stream_drain_matches_batch(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(LEFT, L_SCHEMA).write.parquet(lsrc)
    spark.createDataFrame(RIGHT, R_SCHEMA).write.parquet(rsrc)
    out = interval_join_stream(
        read_stream_parquet(spark, lsrc, L_SCHEMA),
        read_stream_parquet(spark, rsrc, R_SCHEMA),
        ["k"], "lts", "rts", 3600, watermark="5 minutes",
    )
    got: list[tuple] = []

    def sink(df, _bid):
        got.extend((r.l_tag, r.r_tag) for r in df.collect())

    run_available_now(out, str(tmp_path / "ck"), sink, output_mode="append")
    want = sorted(
        (r.l_tag, r.r_tag)
        for r in interval_join_batch(
            spark.createDataFrame(LEFT, L_SCHEMA),
            spark.createDataFrame(RIGHT, R_SCHEMA),
            ["k"], "lts", "rts", 3600,
        ).collect()
    )
    assert sorted(got) == want
    # exactly-once: no row emitted twice across microbatches
    assert len(got) == len(set(got))


def test_negative_lookback_rejected(spark):
    l = spark.createDataFrame(LEFT, L_SCHEMA)
    r = spark.createDataFrame(RIGHT, R_SCHEMA)
    with pytest.raises(ValueError):
        interval_join_batch(l, r, ["k"], "lts", "rts", -1)



@pytest.mark.parametrize("how", ["left_outer", "right_outer", "full_outer"])
@pytest.mark.slow
def test_outer_stream_drain_matches_batch(spark, tmp_path, how):
    """Outer rows only emit once the watermark proves no match can still
    arrive — far-future sentinels on BOTH sides advance both watermarks
    (the join's state eviction follows the min of the two) so every real
    row resolves before the drain stops."""
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    far = _t("2024-03-01T00:00:00")
    left = LEFT + [(4, _t("2024-01-01T10:00:00"), "L-orphan")]  # no match
    # one file per side for the real rows: multiple part files would let an
    # early file advance the watermark past a later file's events (genuine
    # lateness — correct streaming behavior, wrong test fixture)
    spark.createDataFrame(left, L_SCHEMA).coalesce(1).write.parquet(lsrc)
    spark.createDataFrame([(-999, far, "L-sent")], L_SCHEMA).write.mode(
        "append"
    ).parquet(lsrc)
    spark.createDataFrame(RIGHT, R_SCHEMA).coalesce(1).write.parquet(rsrc)
    spark.createDataFrame([(-999, far, "R-sent")], R_SCHEMA).write.mode(
        "append"
    ).parquet(rsrc)
    out = interval_join_stream(
        read_stream_parquet(spark, lsrc, L_SCHEMA, max_files_per_trigger=1),
        read_stream_parquet(spark, rsrc, R_SCHEMA, max_files_per_trigger=1),
        ["k"], "lts", "rts", 3600, watermark="5 minutes", how=how,
    )
    got: list[tuple] = []

    def sink(df, _bid):
        got.extend((r.k, r.l_tag, r.r_tag) for r in df.collect())

    run_available_now(out, str(tmp_path / "ck"), sink, output_mode="append")
    key = lambda t: tuple("" if v is None else str(v) for v in t)  # noqa: E731
    real = sorted((g for g in got if g[0] != -999), key=key)
    want = sorted(
        (
            (r.k, r.l_tag, r.r_tag)
            for r in interval_join_batch(
                spark.createDataFrame(left, L_SCHEMA),
                spark.createDataFrame(RIGHT, R_SCHEMA),
                ["k"], "lts", "rts", 3600, how=how,
            ).collect()
        ),
        key=key,
    )
    assert real == want
    # exactly-once across microbatches
    assert len(got) == len(set(got))
    if how in ("left_outer", "full_outer"):
        # unmatched-left rows present with NULL right columns
        assert any(r_tag is None for _, _, r_tag in real)
    if how in ("right_outer", "full_outer"):
        # unmatched-right rows present with NULL left columns, and the
        # coalesced key column is still populated from the right side
        orphans = [g for g in real if g[1] is None]
        assert orphans and all(k is not None for k, _, _ in orphans)


def test_batch_right_outer_key_coalesce(spark):
    l = spark.createDataFrame(LEFT, L_SCHEMA)
    r = spark.createDataFrame(RIGHT, R_SCHEMA)
    out = interval_join_batch(
        l, r, ["k"], "lts", "rts", 3600, how="right_outer"
    ).collect()
    # R-future / R-nokey have no left match; their key must survive
    unmatched = {row.r_tag for row in out if row.l_tag is None}
    assert {"R-future", "R-nokey"} <= unmatched
    assert all(row.k is not None for row in out)


def test_bad_how_rejected(spark):
    l = spark.createDataFrame(LEFT, L_SCHEMA)
    r = spark.createDataFrame(RIGHT, R_SCHEMA)
    with pytest.raises(ValueError):
        interval_join_batch(l, r, ["k"], "lts", "rts", 10, how="cross")


# --- hypothesis fuzz: random lateness vs the watermark -----------------------

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_TS = st.lists(
    st.integers(min_value=0, max_value=4000), min_size=1, max_size=4,
    unique=True,
)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
@pytest.mark.slow
def test_interval_join_fuzz_lateness(spark, tmp_path, data):
    """Random event times on both sides, arrival either ts-ordered
    (everything on time) or randomly permuted (rows may arrive later than
    the watermark allows). Soundness must hold unconditionally: every
    emitted pair is in the batch twin, exactly once. Completeness is only
    promised for on-time arrival — with ts-ordered files the drain must
    equal the batch twin exactly (the documented streaming-join trade:
    late rows MAY silently miss matches, never invent them)."""
    from datetime import datetime, timedelta

    lts = data.draw(_TS, label="left_ts")
    rts = data.draw(_TS, label="right_ts")
    ordered = data.draw(st.booleans(), label="ordered_arrival")
    base = datetime(2024, 1, 1)
    left = [(1, base + timedelta(seconds=t), f"L{t}") for t in lts]
    right = [(1, base + timedelta(seconds=t), f"R{t}") for t in rts]
    if ordered:
        larr, rarr = sorted(left, key=lambda r: r[1]), sorted(
            right, key=lambda r: r[1])
    else:
        larr = data.draw(st.permutations(left), label="left_arrival")
        rarr = data.draw(st.permutations(right), label="right_arrival")
    far = _t("2024-03-01T00:00:00")
    d = tmp_path / uuid.uuid4().hex
    lsrc, rsrc = str(d / "l"), str(d / "r")
    # one file per row → one microbatch per row under maxFilesPerTrigger=1
    for row in larr:
        spark.createDataFrame([row], L_SCHEMA).coalesce(1).write.mode(
            "append").parquet(lsrc)
    spark.createDataFrame([(-999, far, "L-sent")], L_SCHEMA).write.mode(
        "append").parquet(lsrc)
    for row in rarr:
        spark.createDataFrame([row], R_SCHEMA).coalesce(1).write.mode(
            "append").parquet(rsrc)
    spark.createDataFrame([(-999, far, "R-sent")], R_SCHEMA).write.mode(
        "append").parquet(rsrc)
    out = interval_join_stream(
        read_stream_parquet(spark, lsrc, L_SCHEMA, max_files_per_trigger=1),
        read_stream_parquet(spark, rsrc, R_SCHEMA, max_files_per_trigger=1),
        ["k"], "lts", "rts", 600, watermark="10 minutes",
    )
    got: list[tuple] = []

    def sink(df, _bid):
        got.extend((r.l_tag, r.r_tag) for r in df.collect())

    run_available_now(out, str(d / "ck"), sink, output_mode="append")
    real = [g for g in got if g[0] != "L-sent" and g[1] != "R-sent"]
    want = sorted(
        (r.l_tag, r.r_tag)
        for r in interval_join_batch(
            spark.createDataFrame(left, L_SCHEMA),
            spark.createDataFrame(right, R_SCHEMA),
            ["k"], "lts", "rts", 600,
        ).collect()
    )
    assert len(real) == len(set(real))          # exactly-once
    assert set(real) <= set(want)               # soundness, always
    if ordered:
        assert sorted(real) == want             # completeness when on time
