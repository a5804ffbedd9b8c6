"""Hashed-BoW logistic regression: exact NumPy-oracle parity of the GD
loop, plus end-to-end separation on a labeled fixture."""

from __future__ import annotations

import numpy as np
import pytest

from opendosm_parquet_to_sqlite_spark.operators import classifier

NB = 64

GOOD = [
    "clean informative prose with useful structured content and facts",
    "useful facts and clean structured prose for training language models",
    "informative structured content with facts and prose and clarity",
]
BAD = [
    "buy buy buy click click spam spam spam now now now",
    "spam click now buy spam click now buy spam click",
    "click spam buy now click spam buy now click spam",
]
DOCS = [(i, t, 1) for i, t in enumerate(GOOD)] + [
    (i + len(GOOD), t, 0) for i, t in enumerate(BAD)
] + [(99, "", 0)]  # empty doc: bias-only score


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string, y int")


def _numpy_feats(feats_rows) -> dict[int, dict[int, float]]:
    out: dict[int, dict[int, float]] = {}
    for r in feats_rows:
        out.setdefault(r.doc_id, {})[r.bucket] = r.x
    return out


def _numpy_gd(feats, labels, n_iters=6, lr=0.5, l2=1e-3):
    n = len(labels)
    w = np.zeros(NB)
    bias = 0.0
    for _ in range(n_iters):
        g = np.zeros(NB)
        g_bias = 0.0
        for d, y in labels.items():
            m = sum(x * w[b] for b, x in feats.get(d, {}).items()) + bias
            r = 1.0 / (1.0 + np.exp(-m)) - y
            for b, x in feats.get(d, {}).items():
                g[b] += x * r
            g_bias += r
        w -= lr * (g / n + l2 * w)
        bias -= lr * (g_bias / n)
    return w, bias


def test_features_are_log1p_counts(spark, frame):
    feats = classifier.hashed_features(frame, "text", "doc_id", NB).collect()
    assert all(0 <= r.bucket < NB for r in feats)
    # "buy" appears 3x in doc 3 -> some bucket has x == log1p(3)
    xs = {round(r.x, 9) for r in feats if r.doc_id == 3}
    assert round(float(np.log1p(3)), 9) in xs
    assert not [r for r in feats if r.doc_id == 99]  # empty doc: no rows


@pytest.mark.slow
def test_training_matches_numpy_oracle(spark, frame):
    feats_df = classifier.hashed_features(frame, "text", "doc_id", NB)
    labels_df = frame.select("doc_id", "y")
    w, bias = classifier.train_logreg(feats_df, labels_df, NB, n_iters=6)
    feats = _numpy_feats(feats_df.collect())
    labels = {r.doc_id: r.y for r in labels_df.collect()}
    ow, obias = _numpy_gd(feats, labels, n_iters=6)
    np.testing.assert_allclose(w, ow, atol=1e-9)
    assert bias == pytest.approx(obias, abs=1e-9)


@pytest.mark.slow
def test_distillation_separates_the_classes(spark, frame):
    out = {
        r.doc_id: r
        for r in classifier.distill_quality_gate(
            frame, "text", "doc_id", frame["y"] == 1, n_buckets=NB, n_iters=30
        ).collect()
    }
    for i in range(len(GOOD)):
        assert out[i].score > 0.5, (i, out[i].score)
    for i in range(len(GOOD), len(GOOD) + len(BAD)):
        assert out[i].score < 0.5, (i, out[i].score)
    # every input doc gets a score, including the empty one
    assert set(out) == {r[0] for r in DOCS}
    assert 0.0 < out[99].score < 1.0


def test_scores_partition_independent(spark, frame):
    w = np.linspace(-1, 1, NB)
    a = sorted(
        (r.doc_id, r.score)
        for r in classifier.score(frame, "text", "doc_id", w, 0.1).collect()
    )
    b = sorted(
        (r.doc_id, r.score)
        for r in classifier.score(
            frame.repartition(5), "text", "doc_id", w, 0.1
        ).collect()
    )
    assert a == b


def test_empty_labels_raise(spark, frame):
    empty = frame.filter("doc_id < 0").select("doc_id", "y")
    feats = classifier.hashed_features(frame, "text", "doc_id", NB)
    with pytest.raises(ValueError, match="no labeled rows"):
        classifier.train_logreg(feats, empty, NB)


def test_calibration_report_hand_example(spark):
    from opendosm_parquet_to_sqlite_spark.operators.classifier import (
        calibration_report,
    )

    # bin 0-: 4 rows score .1, 25% positive -> conf .1, acc .25
    # bin 9: 4 rows score .95, 100% positive -> conf .95, acc 1.0
    rows = (
        [(0.1, 1), (0.1, 0), (0.1, 0), (0.1, 0)]
        + [(0.95, 1)] * 4
    )
    df = spark.createDataFrame(rows, "s double, y int")
    out = {r["bin"]: r for r in
           calibration_report(df, "s", "y", n_bins=10).collect()}
    assert set(out) == {1, 9}
    assert out[1]["confidence"] == 0.1 and out[1]["accuracy"] == 0.25
    assert out[9]["confidence"] == 0.95 and out[9]["accuracy"] == 1.0
    # ece = (4/8)*|.25-.1| + (4/8)*|1-.95| = .075 + .025
    assert out[1]["ece"] == out[9]["ece"] == 0.1
    # score exactly 1.0 joins the top bin, not an 11th
    top = spark.createDataFrame([(1.0, 1)], "s double, y int")
    assert calibration_report(top, "s", "y").collect()[0]["bin"] == 9


def test_calibration_report_rejects_out_of_range(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from opendosm_parquet_to_sqlite_spark.operators.classifier import (
        calibration_report,
    )

    df = spark.createDataFrame([(1.5, 1)], "s double, y int")
    with _pytest.raises((Py4JJavaError, Exception)):
        calibration_report(df, "s", "y").collect()
