"""Round-13 wave 2: cluster-balanced corpus selection (the D4 recipe).

The op is rows-only at the driver (k-means cells are centroid-dependent);
these pin the contracts that make it trustworthy: exact output size via
water-filling, quota parity against a pure-Python reference, flattening
of the cell distribution, md5-rank determinism under repartitioning, and
NULL hygiene.
"""

from __future__ import annotations

import pytest

from opendosm_parquet_to_sqlite_spark.operators.similarity import (
    _water_fill_quotas,
    cluster_balanced_sample,
)


def _clustered_corpus(spark, sizes, dim=8):
    """`len(sizes)` tight clusters along distinct axes; cluster c has
    sizes[c] members — k-means with k=len(sizes) recovers them exactly."""
    rows, vid = [], 0
    for c, n in enumerate(sizes):
        for i in range(n):
            v = [0.0] * dim
            v[c] = 1.0
            v[(c + 1) % dim] = 0.001 * (i % 7)  # tiny within-cluster jitter
            rows.append((vid, v))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# --- water-filling ------------------------------------------------------------


def _ref_water_fill(counts, total):
    """Independent reference: raise a water level L; every cell
    contributes min(cap, L); find the largest integer level exactly via
    per-unit simulation (slow, obviously correct)."""
    total = min(total, sum(counts.values()))
    q = {c: 0 for c in counts}
    # repeatedly give one unit to the least-filled unsaturated cell
    # (ties: larger capacity first, then id) — water-filling one drop
    # at a time
    for _ in range(total):
        cand = [c for c in counts if q[c] < counts[c]]
        cand.sort(key=lambda c: (q[c], -counts[c], c))
        q[cand[0]] += 1
    return q


@pytest.mark.parametrize(
    "counts,total",
    [
        ({0: 10, 1: 10, 2: 10}, 15),
        ({0: 1, 1: 100, 2: 5}, 50),
        ({0: 3, 1: 3}, 100),        # total exceeds capacity
        ({0: 7}, 3),
        ({0: 2, 1: 9, 2: 9, 3: 1}, 13),
        ({0: 5, 1: 5, 2: 5, 3: 5}, 3),  # fewer units than cells
    ],
)
def test_water_fill_matches_reference(counts, total):
    got = _water_fill_quotas(dict(counts), total)
    ref = _ref_water_fill(dict(counts), total)
    assert sum(got.values()) == sum(ref.values()) == min(
        total, sum(counts.values())
    )
    for c in counts:
        assert got[c] <= counts[c]
    # same fill profile: the multiset of quotas per capacity matches the
    # drop-at-a-time reference (exact assignment may differ only between
    # equal-capacity cells, which are interchangeable)
    def profile(q):
        return sorted((counts[c], q[c]) for c in counts)

    assert profile(got) == profile(ref)


# --- the operator -------------------------------------------------------------


def test_balanced_sample_exact_size_and_flattening(spark):
    sizes = [60, 20, 10, 10]
    df = _clustered_corpus(spark, sizes)
    out = cluster_balanced_sample(
        df, total=40, n_centroids=4, train_sample=1000
    )
    rows = out.collect()
    assert len(rows) == 40
    per_cell = {}
    for r in rows:
        per_cell[r.cell] = per_cell.get(r.cell, 0) + 1
    # every recovered cluster contributes exactly its water-filled quota:
    # 40 over capacities {60,20,10,10} → {10,10,10,10}
    assert sorted(per_cell.values()) == [10, 10, 10, 10]
    # flattening: the dominant cluster's share drops from 0.6 to 0.25
    assert max(per_cell.values()) / 40 < 60 / 100


def test_balanced_sample_keeps_everything_when_total_exceeds_n(spark):
    df = _clustered_corpus(spark, [5, 5])
    out = cluster_balanced_sample(
        df, total=1000, n_centroids=2, train_sample=100
    )
    assert out.count() == 10


def test_balanced_sample_deterministic_under_repartition(spark):
    df = _clustered_corpus(spark, [30, 20, 15])
    a = {
        (r.vec_id, r.cell)
        for r in cluster_balanced_sample(
            df, total=25, n_centroids=3, train_sample=1000
        ).collect()
    }
    b = {
        (r.vec_id, r.cell)
        for r in cluster_balanced_sample(
            df.repartition(13), total=25, n_centroids=3, train_sample=1000
        ).collect()
    }
    assert a == b


def test_balanced_sample_null_hygiene_and_validation(spark):
    df = _clustered_corpus(spark, [8, 8]).union(
        spark.createDataFrame(
            [(None, [1.0] * 8), (99, None)],
            "vec_id long, embedding array<float>",
        )
    )
    out = cluster_balanced_sample(
        df, total=100, n_centroids=2, train_sample=100
    ).collect()
    ids = {r.vec_id for r in out}
    assert None not in ids and 99 not in ids
    assert len(out) == 16
    with pytest.raises(ValueError, match="total"):
        cluster_balanced_sample(df, total=0, n_centroids=2)


def test_balanced_sample_hot_cell_prefilter_exact(spark):
    """A cell big enough to trip the md5-prefix prefilter (n > 4q+256)
    must still return EXACTLY the lowest-md5 quota members — the prefix
    cut is downward-closed under the rank order. Expected membership is
    recomputed from the operator's own deterministic cell assignment, so
    the pin tests the SELECTION layer regardless of how k-means happens
    to carve this fixture."""
    import hashlib

    from pyspark.sql import functions as F
    from opendosm_parquet_to_sqlite_spark.operators.similarity import (
        _assign_cell_udf,
        _water_fill_quotas,
        train_ivf_centroids,
    )

    df = _clustered_corpus(spark, [2000, 50])
    total = 100
    out = cluster_balanced_sample(
        df, total=total, n_centroids=2, train_sample=5000
    ).collect()
    assert len(out) == total
    got = {}
    for r in out:
        got.setdefault(r.cell, set()).add(r.vec_id)
    # recompute the operator's deterministic assignment (same seed)
    cent = train_ivf_centroids(df, 2, 5000)
    assign = {
        r.vec_id: r.cell
        for r in df.select(
            "vec_id", _assign_cell_udf(cent)(F.col("embedding")).alias("cell")
        ).collect()
    }
    members = {}
    for vid, cell in assign.items():
        members.setdefault(cell, []).append(vid)
    quotas = _water_fill_quotas(
        {c: len(v) for c, v in members.items()}, total
    )
    assert any(
        len(members[c]) > 4 * quotas[c] + 256 for c in members
    ), "fixture must actually trip the prefilter"
    for c, ids in members.items():
        expect = set(
            sorted(
                ids,
                key=lambda i: (
                    hashlib.md5(str(i).encode()).hexdigest(), i
                ),
            )[: quotas[c]]
        )
        assert got.get(c, set()) == expect
