"""domain_mix: deterministic domain-reweighting semantics (up/down-sample,
partition independence, expectation mass)."""

from __future__ import annotations

import pytest

from opendosm_parquet_to_sqlite_spark.operators.sampling import domain_mix


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"d{i % 4}") for i in range(400)]  # 100 rows per domain
    return spark.createDataFrame(rows, schema="doc_id long, source string")


def test_exact_integer_rate_replicates_exactly(spark, corpus):
    # target 800 * 0.25 / 100 = rate 2.0 for every domain -> every doc
    # appears exactly twice (thresholds 2.0 and 1.0 both clear 2^32)
    out = domain_mix(
        corpus, "source", "doc_id",
        {"d0": 0.25, "d1": 0.25, "d2": 0.25, "d3": 0.25},
        target_rows=800,
    )
    assert out.count() == 800
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in per_doc)


def test_mass_close_to_target_for_fractional_rates(spark, corpus):
    out = domain_mix(
        corpus, "source", "doc_id",
        {"d0": 0.5, "d1": 0.3, "d2": 0.2},  # d3 excluded
        target_rows=150,
    ).collect()
    # rates: d0=0.75, d1=0.45, d2=0.3 — all Bernoulli; 4-sigma bound
    # on the binomial sum (sigma^2 = sum p(1-p) ~ 64) => +/- 33
    assert abs(len(out) - 150) < 35
    assert {r.source for r in out} <= {"d0", "d1", "d2"}


def test_deterministic_and_partition_independent(spark, corpus):
    w = {"d0": 0.6, "d1": 0.4}
    a = sorted(
        map(tuple, domain_mix(corpus, "source", "doc_id", w, 300).collect())
    )
    b = sorted(
        map(
            tuple,
            domain_mix(
                corpus.repartition(13, "doc_id"), "source", "doc_id", w, 300
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_copy_idx_bounds_and_distinctness(spark, corpus):
    out = domain_mix(
        corpus, "source", "doc_id", {"d0": 0.9, "d1": 0.1}, 500
    ).collect()
    # d0 rate 4.5 -> copy_idx in 0..4; d1 rate 0.5 -> only copy 0
    for r in out:
        hi = 5 if r.source == "d0" else 1
        assert 0 <= r.copy_idx < hi
    assert len(out) == len({(r.doc_id, r.copy_idx) for r in out})
    # copies below floor(rate) always survive: every d0 doc has copies 0-3
    d0 = [r for r in out if r.source == "d0"]
    by_doc: dict[int, set] = {}
    for r in d0:
        by_doc.setdefault(r.doc_id, set()).add(r.copy_idx)
    assert all({0, 1, 2, 3} <= c for c in by_doc.values())


def test_zero_weight_and_missing_domain_excluded(spark, corpus):
    out = domain_mix(
        corpus, "source", "doc_id",
        {"d0": 1.0, "d1": 0.0, "nonexistent": 0.0},
        target_rows=50,
    ).collect()
    assert {r.source for r in out} == {"d0"}


def test_validates_weight_sum_and_target(spark, corpus):
    with pytest.raises(ValueError, match="sum to 1"):
        domain_mix(corpus, "source", "doc_id", {"d0": 0.5}, 100)
    with pytest.raises(ValueError, match="positive"):
        domain_mix(corpus, "source", "doc_id", {"d0": 1.0}, 0)
