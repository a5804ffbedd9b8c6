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


# --- exact_span_pairs: the precise rung above the shingle approximation ------


def _lcs_tokens(a: list[str], b: list[str]) -> tuple[int, int, int]:
    """Pure-Python longest common substring over token lists (O(n·m) DP);
    ties resolved to smallest (start_a, start_b) — the operator's
    deterministic tie rule. Returns (start_a, start_b, length)."""
    best = (0, 0, 0)
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                cand = (i - cur[j], j - cur[j], cur[j])
                if cur[j] > best[2] or (
                    cur[j] == best[2]
                    and (cand[0], cand[1]) < (best[0], best[1])
                ):
                    best = cand
        prev = cur
    return best


def test_exact_span_planted_passage_exact_offsets(spark):
    """Winnow guarantee -> exact refinement: a planted shared passage of
    16 tokens surfaces the pair AND comes back with its exact offsets
    and length."""
    rng = random.Random(7)
    passage = _words(rng, 16, "s")
    pre_a, pre_b = _words(rng, 30, "a"), _words(rng, 45, "b")
    rows = [
        (1, " ".join(pre_a + passage + _words(rng, 20, "c"))),
        (2, " ".join(pre_b + passage + _words(rng, 10, "d"))),
        (3, " ".join(_words(rng, 80, "e"))),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = neardup.exact_span_pairs(
        df, "text", "doc_id", min_len=8, k=K, window=W, min_shared=1
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert (r.start_a, r.start_b, r.span_len) == (30, 45, 16)


def test_exact_span_matches_dp_reference_fuzz(spark):
    """Random doc pairs with planted overlaps: the reported span equals
    the O(n·m) DP longest-common-substring reference, including the
    deterministic tie rule."""
    rng = random.Random(23)
    rows = []
    tok_lists = {}
    vocab = [f"w{i}" for i in range(25)]  # small vocab -> natural repeats
    for d in range(8):
        toks = [rng.choice(vocab) for _ in range(rng.randint(20, 60))]
        if d % 2 == 1:  # plant a long overlap with the previous doc
            src = tok_lists[d - 1]
            start = rng.randint(0, max(0, len(src) - 14))
            toks[3 : 3 + 14] = src[start : start + 14]
        tok_lists[d] = toks
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): (r.start_a, r.start_b, r.span_len)
        for r in neardup.exact_span_pairs(
            df, "text", "doc_id", min_len=8, k=K, window=W, min_shared=1,
            max_doc_freq=None, max_token_freq=None,
        ).collect()
    }
    for (ia, ib), span in got.items():
        ref = _lcs_tokens(tok_lists[ia], tok_lists[ib])
        assert span == ref, (ia, ib, span, ref)
    # every planted pair long enough for the guarantee must surface
    for d in range(1, 8, 2):
        ref = _lcs_tokens(tok_lists[d - 1], tok_lists[d])
        if ref[2] >= 14:
            assert (d - 1, d) in got


def test_exact_span_token_freq_cap_bounds_fanout(spark):
    """A token repeated beyond max_token_freq in a doc is dropped from the
    position join (boilerplate guard): a 'span' made ONLY of that token
    cannot be reported, while real mixed spans survive."""
    passage = [f"p{i}" for i in range(12)]
    boiler = ["the"] * 100
    rows = [
        (1, " ".join(passage + boiler)),
        (2, " ".join(boiler + passage)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = neardup.exact_span_pairs(
        df, "text", "doc_id", min_len=8, k=K, window=W, min_shared=1,
        max_token_freq=64,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.span_len == 12  # the real passage, not the 100-token boiler run
    assert (r.start_a, r.start_b) == (0, 100)
