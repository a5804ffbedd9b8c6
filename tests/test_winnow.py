"""Winnowing (MOSS) fingerprints: the SIGMOD 2003 guarantee, density
bound, and the locality property Jaccard lacks. Oracle parity of the
full pair pipeline runs in tests/test_oracle_parity.py."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import neardup

K, W = 5, 4


def _words(rng, n, prefix):
    return [f"{prefix}{rng.randint(0, 10**9)}" for _ in range(n)]


def test_guarantee_shared_run_yields_shared_fingerprint(spark):
    """Any shared token run of length >= window+k-1 MUST produce at
    least one identical selected fingerprint in both docs."""
    rng = random.Random(11)
    shared = _words(rng, W + K - 1, "s")  # exactly the guarantee length
    rows = [
        (1, " ".join(_words(rng, 40, "a") + shared + _words(rng, 40, "b"))),
        (2, " ".join(_words(rng, 55, "c") + shared + _words(rng, 25, "d"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = neardup.winnow_fingerprints(df, "text", "doc_id", k=K, window=W)
    a = {r.fp for r in fps.filter(F.col("doc_id") == 1).collect()}
    b = {r.fp for r in fps.filter(F.col("doc_id") == 2).collect()}
    assert a & b, "guarantee violated: no shared fingerprint"


def test_disjoint_docs_share_nothing(spark):
    rng = random.Random(12)
    rows = [
        (1, " ".join(_words(rng, 80, "x"))),
        (2, " ".join(_words(rng, 80, "y"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = neardup.winnow_pairs(
        df, "text", "doc_id", k=K, window=W, min_shared=1
    )
    assert pairs.count() == 0


def test_density_bound(spark):
    """Selected fingerprints ~ 2/(window+1) of grams (the paper's
    expected density) — pinned loosely as < 2x that on random text."""
    rng = random.Random(13)
    n = 2000
    df = spark.createDataFrame(
        [(1, " ".join(_words(rng, n, "t")))], "doc_id long, text string"
    )
    n_fp = neardup.winnow_fingerprints(
        df, "text", "doc_id", k=K, window=W
    ).count()
    n_grams = n - K + 1
    assert n_fp <= 2 * (2.0 / (W + 1)) * n_grams
    assert n_fp >= n_grams / (W * 3)  # and not degenerate-sparse


def test_short_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None),
         (4, "w1 w2 w3 w4 w5 w6 w7")],  # 7 tokens = k+window-2: 3 grams < window
        "doc_id long, text string",
    )
    fps = neardup.winnow_fingerprints(df, "text", "doc_id", k=K, window=W)
    assert fps.count() == 0


def test_locality_beats_whole_doc_jaccard(spark):
    """One copied paragraph inside two long, otherwise-unrelated docs:
    whole-doc 3-gram Jaccard scores far below any sane threshold, while
    winnowing still pairs them — the copied-passage regime."""
    rng = random.Random(14)
    passage = _words(rng, 30, "p")
    rows = [
        (1, " ".join(_words(rng, 400, "a") + passage + _words(rng, 400, "b"))),
        (2, " ".join(_words(rng, 400, "c") + passage + _words(rng, 400, "d"))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    jac = neardup.ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.3)
    assert jac.count() == 0  # similarity ~ 28/1600 << 0.3
    win = neardup.winnow_pairs(
        df, "text", "doc_id", k=K, window=W, min_shared=2
    )
    got = win.collect()
    assert len(got) == 1 and (got[0].id_a, got[0].id_b) == (1, 2)
    assert got[0].n_shared >= 2


def test_fuzzy_decontamination_catches_paraphrased_leakage(spark):
    """A benchmark passage embedded in a rewritten doc: exact 5-gram
    collision on the FULL doc still fires only if a verbatim 5-gram
    survives — here the copied run is intact, so both methods flag it;
    the discriminating case is the broadcast-side size and the
    guarantee: shared run == window+k-1 tokens is SUFFICIENT for the
    fuzzy flag."""
    import random

    from opendosm_parquet_to_sqlite_spark.operators import contamination

    rng = random.Random(41)
    passage = _words(rng, W + K - 1, "bench")  # minimal guaranteed run
    bench = spark.createDataFrame(
        [(1000, " ".join(_words(rng, 20, "q") + passage))],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contaminated: the passage verbatim inside fresh text
            (1, " ".join(_words(rng, 60, "a") + passage + _words(rng, 60, "b"))),
            # clean: disjoint vocabulary
            (2, " ".join(_words(rng, 120, "c"))),
            # too-short overlap: only k tokens of the passage (< w+k-1)
            (3, " ".join(_words(rng, 60, "d") + passage[:K] + _words(rng, 60, "e"))),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.contaminated
        for r in contamination.winnow_overlap(
            corpus, bench, "text", "doc_id", k=K, window=W
        ).collect()
    }
    assert out[1] == 1  # the guarantee
    assert out[2] == 0
    # doc 3 MAY collide (a k-gram can be selected on both sides) but the
    # guarantee only promises detection at >= w+k-1; assert it exists
    assert out[3] in (0, 1)
