"""WordPiece tokenizer trainer: exact parity of the distributed
likelihood-gain merge loop against a pure-Python reference of the
identical algorithm, divergence-from-BPE proof, and greedy
longest-match segmenter pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import wordpiece as W

# --- pure-Python reference of the identical algorithm -----------------------


def _ref_syms(word):
    return [word[0]] + [W.CONT + c for c in word[1:]]


def _ref_apply(syms, left, right, merged):
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(texts, n_merges, min_pair_freq=2):
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    syms = {w: _ref_syms(w) for w in freqs}
    rules = []
    for rank in range(1, n_merges + 1):
        pair_n: dict[tuple, int] = {}
        sym_n: dict[str, int] = {}
        for w, f in freqs.items():
            s = syms[w]
            for x in s:
                sym_n[x] = sym_n.get(x, 0) + f
            for a, b in zip(s, s[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + f
        cands = [
            (n / (sym_n[a] * sym_n[b]), n, a, b)
            for (a, b), n in pair_n.items()
            if n >= min_pair_freq
        ]
        if not cands:
            break
        cands.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
        score, n, left, right = cands[0]
        merged = W._merge_text(left, right)
        rules.append((rank, left, right, merged, n, round(score, 12)))
        syms = {
            w: _ref_apply(s, left, right, merged) for w, s in syms.items()
        }
    return rules


CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a cat and a mat and a hat",
    "hats and mats and cats",
    "the hat sat flat",
    "flat mats flat hats",
]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_wordpiece_train_matches_pure_python_reference(spark):
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["n_pair"],
         r["score"])
        for r in W.wordpiece_train(
            _docs(spark, CORPUS), "text", n_merges=8
        ).orderBy("rank").collect()
    ]
    want = _ref_train(CORPUS, n_merges=8)
    assert [g[:5] for g in got] == [w[:5] for w in want]
    for g, w in zip(got, want):
        assert g[5] == pytest.approx(w[5], abs=1e-9)


def test_wordpiece_score_diverges_from_bpe_frequency():
    """The likelihood-gain criterion picks a rarer-but-exclusive pair
    over the raw-frequency winner: 'xy' x10 gives pair (x, ##y) n=10,
    score 10/(10*10)=0.1; 'ab' x3 gives (a, ##b) n=3, score
    3/(3*3)=0.333 — BPE would merge (x, ##y) first, WordPiece must
    merge (a, ##b)."""
    texts = ["xy"] * 10 + ["ab"] * 3
    rules = _ref_train(texts, n_merges=1)
    assert (rules[0][1], rules[0][2]) == ("a", "##b")


def test_wordpiece_spark_score_divergence(spark):
    texts = ["xy"] * 10 + ["ab"] * 3
    rows = W.wordpiece_train(
        _docs(spark, texts), "text", n_merges=2
    ).orderBy("rank").collect()
    assert (rows[0]["left"], rows[0]["right"]) == ("a", "##b")
    assert rows[0]["merged"] == "ab"
    assert (rows[1]["left"], rows[1]["right"]) == ("x", "##y")


def test_wordpiece_min_pair_freq_stops_early(spark):
    rows = W.wordpiece_train(
        _docs(spark, ["ab", "cd"]), "text", n_merges=5, min_pair_freq=2
    ).collect()
    assert rows == []


def test_merge_text_strips_continuation():
    assert W._merge_text("h", "##e") == "he"
    assert W._merge_text("##l", "##l") == "##ll"
    assert W._merge_text("he", "##llo") == "hello"


def test_vocab_from_rules():
    vocab = W.vocab_from_rules(
        ["a", "b", "##a", "##b"], [("a", "##b"), ("ab", "##a")]
    )
    assert vocab == sorted({"a", "b", "##a", "##b", "ab", "aba"})


def test_greedy_word_longest_match_and_unk():
    vocab = {"un", "##aff", "##able", "##ffa", "aff", "a"}
    # longest-first: un + ##aff + ##able
    assert W._greedy_word("unaffable", vocab, 100, "[UNK]") == [
        "un", "##aff", "##able",
    ]
    # unmatchable position -> whole word UNK
    assert W._greedy_word("unz", vocab, 100, "[UNK]") == ["[UNK]"]
    # over-length word -> UNK
    assert W._greedy_word("unaffable", vocab, 5, "[UNK]") == ["[UNK]"]


def test_wordpiece_segment_end_to_end(spark):
    docs = _docs(spark, CORPUS)
    rules = [
        (r["left"], r["right"])
        for r in W.wordpiece_train(docs, "text", n_merges=8)
        .orderBy("rank").collect()
    ]
    chars = sorted(
        {s for w in " ".join(CORPUS).lower().split() for s in _ref_syms(w)}
    )
    vocab = W.vocab_from_rules(chars, rules)
    out = W.wordpiece_segment(docs, "text", vocab)
    rows = out.orderBy("doc_id").collect()
    # every word round-trips: pieces re-concatenate to the token stream
    for r in rows:
        rebuilt = "".join(
            u[len(W.CONT):] if u.startswith(W.CONT) else " " + u
            for u in r["wordpiece_units"]
        ).strip()
        assert rebuilt == " ".join(r["text"].lower().split())
    # determinism: second run identical
    rows2 = W.wordpiece_segment(docs, "text", vocab).orderBy(
        "doc_id"
    ).collect()
    assert [r["wordpiece_units"] for r in rows] == [
        r["wordpiece_units"] for r in rows2
    ]


def test_wordpiece_segment_unk_and_empty(spark):
    docs = spark.createDataFrame(
        [(0, "cat zzz"), (1, ""), (2, None)], "doc_id long, text string"
    )
    vocab = ["c", "##a", "##t", "cat"]
    rows = W.wordpiece_segment(docs, "text", vocab).orderBy(
        "doc_id"
    ).collect()
    assert rows[0]["wordpiece_units"] == ["cat", "[UNK]"]
    assert rows[1]["wordpiece_units"] == []
    assert rows[2]["wordpiece_units"] == []


def test_wordpiece_segment_requires_vocab(spark):
    with pytest.raises(ValueError, match="non-empty"):
        W.wordpiece_segment(_docs(spark, ["x"]), "text", [])
