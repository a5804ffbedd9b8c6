"""Pins for operators/linkage.py — planted near-duplicates, the
missing-field weight renormalization, and the hot-block cap."""

from __future__ import annotations

import pytest

from opendosm_parquet_to_sqlite_spark.operators.linkage import record_linkage


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, blk string, name string, bal double"
    )


FIELDS = [("name", "string", 2.0), ("bal", "numeric", 1.0)]


def test_planted_duplicate_outscores_nonduplicate(spark):
    df = _df(
        spark,
        [
            (1, "b", "acme corp", 100.0),
            (2, "b", "acme corp.", 101.0),   # near-dup of 1
            (3, "b", "zzz widgets", 5000.0),  # unrelated
        ],
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in record_linkage(df, "id", ["blk"], FIELDS, 0.9).collect()
    }
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    dup, other = out[(1, 2)], out[(1, 3)]
    assert dup["score"] > other["score"]
    assert dup["matched"] is True and other["matched"] is False
    # hand-check the dup pair: lev("acme corp","acme corp.")=1, len 10
    assert dup["sim_name"] == pytest.approx(1 - 1 / 10, abs=1e-6)
    assert dup["sim_bal"] == pytest.approx(1 - 1.0 / 101.0, abs=1e-6)


def test_blocks_never_cross_and_null_block_never_pairs(spark):
    df = _df(
        spark,
        [
            (1, "b1", "same name", 1.0),
            (2, "b2", "same name", 1.0),  # other block: no pair
            (3, None, "same name", 1.0),  # NULL block: no pair
            (4, None, "same name", 1.0),
        ],
    )
    assert record_linkage(df, "id", ["blk"], FIELDS, 0.5).count() == 0


def test_missing_field_abstains_and_renormalizes(spark):
    df = _df(
        spark,
        [
            (1, "b", "acme", None),
            (2, "b", "acme", 50.0),   # bal missing on one side
            (3, "b", None, None),     # everything missing vs 1
        ],
    )
    out = {
        (r["id_a"], r["id_b"]): r
        for r in record_linkage(df, "id", ["blk"], FIELDS, 0.9).collect()
    }
    pair = out[(1, 2)]
    assert pair["sim_bal"] is None
    # score is the name sim alone (weight renormalized), not dragged to 2/3
    assert pair["score"] == pytest.approx(1.0)
    assert pair["matched"] is True
    allmiss = out[(1, 3)]
    assert allmiss["score"] is None and allmiss["matched"] is None


def test_exact_kind_and_zero_zero_numeric(spark):
    df = spark.createDataFrame(
        [(1, "b", "x", 0.0), (2, "b", "x", 0.0), (3, "b", "y", -1.0)],
        "id long, blk string, cat string, bal double",
    )
    fields = [("cat", "exact", 1.0), ("bal", "numeric", 1.0)]
    out = {
        (r["id_a"], r["id_b"]): r
        for r in record_linkage(df, "id", ["blk"], fields, 0.9).collect()
    }
    assert out[(1, 2)]["sim_cat"] == 1.0
    assert out[(1, 2)]["sim_bal"] == 1.0  # 0 vs 0 is identity, not 0/0
    assert out[(1, 3)]["sim_cat"] == 0.0


def test_max_block_cap_drops_hot_blocks(spark):
    rows = [(i, "hot", f"n{i}", 1.0) for i in range(10)] + [
        (100, "cold", "a", 1.0),
        (101, "cold", "b", 1.0),
    ]
    df = _df(spark, rows)
    out = record_linkage(df, "id", ["blk"], FIELDS, 0.5, max_block=5)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == {(100, 101)}  # the 10-row hot block is dropped entirely


def test_max_pairs_valve_trips_and_escape_hatch(spark):
    """The max_pairs valve: a planted hot block whose within-block pair
    volume exceeds the cap raises BEFORE any pair is built, with the
    steer to scaled_numeric_band / max_block; max_pairs=None is the
    explicit escape hatch; under-cap corpora are untouched."""
    rows = [(i, "hot", f"n{i}", 1.0) for i in range(20)]  # C(20,2)=190
    df = _df(spark, rows)
    with pytest.raises(ValueError, match="scaled_numeric_band"):
        record_linkage(df, "id", ["blk"], FIELDS, 0.5, max_pairs=100)
    assert (
        record_linkage(
            df, "id", ["blk"], FIELDS, 0.5, max_pairs=None
        ).count()
        == 190
    )
    assert (
        record_linkage(
            df, "id", ["blk"], FIELDS, 0.5, max_pairs=200
        ).count()
        == 190
    )


def test_max_pairs_valve_is_on_by_default(spark):
    """Round-11 verdict order 1: the quadratic candidate plan must be
    unreachable with DEFAULT arguments. One hot block of 12,000 rows →
    C(12000,2) ≈ 72M pairs, over the 50M default; the valve raises from
    the block-keyed count alone (no pair row is ever materialized, so
    the test stays cheap). NULL block keys don't count toward the
    estimate (they never pair), and max_block composes: capping the hot
    block away lets the same corpus through the default valve."""
    from opendosm_parquet_to_sqlite_spark.operators import linkage as L

    assert L.DEFAULT_MAX_PAIRS == 50_000_000
    hot = spark.range(12_000).selectExpr(
        "id",
        "'hot' AS blk",
        "concat('n', id) AS name",
        "cast(1.0 as double) AS bal",
    )
    with pytest.raises(ValueError, match="max_pairs"):
        record_linkage(hot, "id", ["blk"], FIELDS, 0.5)
    # same 12k rows but a NULL block key: never pair, valve stays quiet
    nullblk = hot.selectExpr(
        "id", "cast(NULL as string) AS blk", "name", "bal"
    )
    assert record_linkage(nullblk, "id", ["blk"], FIELDS, 0.5).count() == 0
    # max_block composes with the default valve: the hot block is dropped
    # before the estimate, so the plan builds (and emits nothing)
    assert (
        record_linkage(
            hot, "id", ["blk"], FIELDS, 0.5, max_block=100
        ).count()
        == 0
    )


def test_bad_kind_raises(spark):
    df = _df(spark, [(1, "b", "x", 1.0)])
    with pytest.raises(ValueError, match="kind"):
        record_linkage(df, "id", ["blk"], [("name", "fuzzy", 1.0)], 0.5)
    with pytest.raises(ValueError, match="non-empty"):
        record_linkage(df, "id", ["blk"], [], 0.5)


# --- scaled_numeric_band: the scale-safe banding derivation ------------------


def test_scaled_band_occupancy_stays_constant_as_n_grows(spark):
    """The whole point: 10× the rows → ~10× the bands, NOT 10× the
    occupancy. Uniform values over a fixed range (the fixed-width
    worst case)."""
    from opendosm_parquet_to_sqlite_spark.operators.linkage import (
        scaled_numeric_band,
    )

    def max_occupancy(n):
        rows = [(i, (i * 9973 % 100000) / 100.0) for i in range(n)]
        df = spark.createDataFrame(rows, "id long, bal double")
        banded = scaled_numeric_band(df, "bal", target_occupancy=64)
        per = banded.groupBy("band").count().collect()
        return max(r["count"] for r in per), len(per)

    occ_small, bands_small = max_occupancy(640)
    occ_big, bands_big = max_occupancy(6400)
    # expected occupancy is 64 in both; allow 3× slack for hash scatter
    assert occ_small <= 64 * 3 and occ_big <= 64 * 3
    # band count scales with n (the linearity witness)
    assert bands_big >= bands_small * 5


def test_scaled_band_null_and_tiny_inputs(spark):
    from opendosm_parquet_to_sqlite_spark.operators.linkage import (
        scaled_numeric_band,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 5.0)], "id long, bal double"
    )
    rows = {r["id"]: r["band"] for r in
            scaled_numeric_band(df, "bal").collect()}
    assert rows[2] is None          # NULL value → NULL band, never pairs
    assert rows[1] == rows[3] == 0  # tiny n → single band 0


def test_scaled_band_keeps_near_values_pairable(spark):
    """Near-duplicate balances land in the same or adjacent band —
    width ≥ 1 cent guarantees exact-equal values always co-band."""
    from opendosm_parquet_to_sqlite_spark.operators.linkage import (
        scaled_numeric_band,
    )

    rows = [(i, float(i)) for i in range(1000)] + [
        (5000, 123.0),
        (5001, 123.0),  # exact duplicate of 5000
    ]
    df = spark.createDataFrame(rows, "id long, bal double")
    got = {r["id"]: r["band"] for r in
           scaled_numeric_band(df, "bal").collect()}
    assert got[5000] == got[5001]


def test_max_pairs_valve_is_per_block_not_total(spark):
    """Round-13 sf10 lesson: an occupancy-bounded blocking's TOTAL pair
    volume is linear in n and legitimately grows past any fixed figure —
    record_linkage_scaled tripped the old total-volume valve at sf10
    with 74.7M diffuse pairs while every block held ~64 rows. The valve
    must measure the HOT-BLOCK property: many small blocks whose summed
    volume exceeds the cap pass; one block over the cap trips."""
    # 40 blocks x 5 rows: total = 40 * C(5,2) = 400 pairs, max block 10
    rows = [
        (b * 10 + i, f"blk{b}", f"n{b}_{i}", 1.0)
        for b in range(40)
        for i in range(5)
    ]
    df = _df(spark, rows)
    out = record_linkage(df, "id", ["blk"], FIELDS, 0.5, max_pairs=100)
    assert out.count() == 400  # diffuse 400 > 100 cap: passes per-block
    # same cap, one 20-row block: C(20,2)=190 > 100 in a SINGLE block
    hot = _df(spark, [(i, "hot", f"n{i}", 1.0) for i in range(20)])
    with pytest.raises(ValueError, match="hottest block"):
        record_linkage(hot, "id", ["blk"], FIELDS, 0.5, max_pairs=100)
