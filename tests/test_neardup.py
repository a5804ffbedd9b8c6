"""Property tests for near-dup operators (MinHash/SimHash are rows-only in
the driver gate, so their semantics are pinned here)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import neardup
from opendosm_parquet_to_sqlite_spark.sources.parquet import load_table

from .conftest import SF0001


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF0001, "documents")


def test_shingles_basic(spark):
    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    sh = neardup.with_shingles(df, "text", "doc_id", 3).first()["sh"]
    assert sorted(sh) == ["a b c", "b c d"]


def test_shingles_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "   ")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r["sh"] for r in
            neardup.with_shingles(df, "text", "doc_id", 3).collect()}
    assert rows[1] == [] and rows[2] == [] and rows[3] == []


def test_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w"), (3, "totally different words here")],
        ["doc_id", "text"],
    )
    out = neardup.ngram_jaccard_pairs(df, "text", "doc_id", 3, 0.5).collect()
    assert len(out) == 1
    assert (out[0]["id_a"], out[0]["id_b"], out[0]["jaccard"]) == (1, 2, 1.0)


def test_jaccard_symmetric_ordering(spark, docs):
    out = neardup.ngram_jaccard_pairs(docs, "text", "doc_id", 3, 0.3)
    assert out.filter(F.col("id_a") >= F.col("id_b")).count() == 0


def test_minhash_lsh_recall_against_exact(spark, docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in neardup.ngram_jaccard_pairs(docs, "text", "doc_id", 3, 0.3).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in neardup.minhash_lsh_pairs(
            docs, "text", "doc_id", 3, num_hashes=32, bands=8, threshold=0.3
        ).collect()
    }
    # verified LSH output is a subset of exact; recall on planted dups ≥ 0.9
    assert lsh <= exact
    assert len(lsh) >= 0.9 * len(exact)


def test_minhash_no_false_positives_above_threshold(spark, docs):
    out = neardup.minhash_lsh_pairs(docs, "text", "doc_id", 3, threshold=0.3)
    assert out.filter(F.col("jaccard") < 0.3).count() == 0


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "p q r s t u v w"), (2, "p q r s t u v w")], ["doc_id", "text"]
    )
    out = neardup.simhash_pairs(df, "text", "doc_id", max_hamming=0).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in out] == [(1, 2, 0)]


def test_neardup_index_probe_roundtrip(spark, docs, tmp_path):
    """Index the corpus once; probing perturbed copies finds their sources
    (and unrelated probes find nothing) — including through a parquet
    save/reload of the index, the incremental-ingest deployment shape."""
    bands_df, sets_df = neardup.build_neardup_index(docs, "text", "doc_id")
    bands_df.write.parquet(str(tmp_path / "bands"))
    sets_df.write.parquet(str(tmp_path / "sets"))
    bands_r = spark.read.parquet(str(tmp_path / "bands"))
    sets_r = spark.read.parquet(str(tmp_path / "sets"))

    base = {r["doc_id"]: r["text"] for r in docs.limit(8).collect()}
    probes = [(10_000 + i, t + " tiny suffix")
              for i, t in enumerate(base.values())]
    probes.append((99_999, "completely unrelated probe text about nothing "
                   "that matches the corpus vocabulary whatsoever xyzzy"))
    new_docs = spark.createDataFrame(probes, ["doc_id", "text"])

    hits = neardup.probe_neardup_index(
        new_docs, bands_r, sets_r, "text", "doc_id", threshold=0.3
    ).collect()
    matched_new = {r["new_id"] for r in hits}
    by_new = {r["new_id"]: r for r in hits}
    src_ids = list(base)
    # most perturbed probes find their source (LSH recall on ~identical
    # docs is near 1); the unrelated probe finds nothing
    assert 99_999 not in matched_new
    found = [10_000 + i for i in range(len(src_ids)) if 10_000 + i in matched_new]
    assert len(found) >= 7
    for nid in found:
        assert by_new[nid]["jaccard"] >= 0.3
    # every hit pairs a probe with an INDEXED doc, never probe-vs-probe
    assert all(r["index_id"] < 10_000 for r in hits)

    # parameter mismatch is an ERROR, not a silent recall collapse —
    # the build params ride the schema metadata through parquet
    import pytest as _pytest

    with _pytest.raises(ValueError, match="parameters must match"):
        neardup.probe_neardup_index(
            new_docs, bands_r, sets_r, "text", "doc_id",
            num_hashes=16, bands=4, threshold=0.3,
        )


@pytest.mark.slow
def test_simhash_banding_pigeonhole_complete(spark, docs):
    """Pigeonhole guarantee: EVERY pair within max_hamming shares at least
    one identical chunk, so the banded join must find exactly the pairs a
    brute-force fingerprint comparison finds."""
    sub = docs.limit(120)
    fps = {r["doc_id"]: r["simhash"]
           for r in neardup.simhash(sub, "text", "doc_id", n=1).collect()}
    ids = sorted(fps)
    brute = {
        (a, b)
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(fps[a] ^ fps[b]).count("1") <= 8
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in neardup.simhash_pairs(sub, "text", "doc_id",
                                       max_hamming=8, n=1).collect()
    }
    assert banded == brute


def test_cap_semantics_filtered_universe(spark):
    """With a cap, Jaccard is exact over the filtered shingle universe:
    hot shingles leave the intersections AND the set sizes."""
    df = spark.createDataFrame(
        [(0, "hot x y"), (1, "hot x y"), (2, "hot z w")], ["doc_id", "text"]
    )
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in neardup.ngram_jaccard_pairs(
            df, "text", "doc_id", n=1, threshold=0.1, max_doc_freq=2
        ).collect()
    }
    # 'hot' (df=3 > 2) is dropped: sets become {x,y},{x,y},{z,w}
    assert capped == {(0, 1): 1.0}
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in neardup.ngram_jaccard_pairs(
            df, "text", "doc_id", n=1, threshold=0.1
        ).collect()
    }
    assert uncapped == {(0, 1): 1.0, (0, 2): 0.2, (1, 2): 0.2}


def test_hot_shingle_cap_drops_pairs(spark):
    # 4 docs all sharing one hot shingle; cap at 3 removes it entirely
    df = spark.createDataFrame(
        [(i, "common shingle here") for i in range(4)], ["doc_id", "text"]
    )
    uncapped = neardup.ngram_jaccard_pairs(df, "text", "doc_id", 3, 0.5)
    capped = neardup.ngram_jaccard_pairs(
        df, "text", "doc_id", 3, 0.5, max_doc_freq=3
    )
    assert uncapped.count() == 6  # C(4,2)
    assert capped.count() == 0


def test_minhash_oversized_bucket_cap(spark):
    """A mass-duplicate cluster collapses into one band bucket; the cap
    drops it before any member list materializes (exact dedup owns those),
    while normal-size buckets are untouched."""
    from opendosm_parquet_to_sqlite_spark.operators.neardup import (
        minhash_lsh_pairs,
    )

    rows = [(i, "mass duplicate text body repeated verbatim") for i in range(30)]
    rows += [(100, "a unique pair first half match"), (101, "a unique pair first half match")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_lsh_pairs(
        df, "text", "doc_id", n=2, threshold=0.5, max_bucket_size=10
    ).collect()
    ids = {(r.id_a, r.id_b) for r in capped}
    assert (100, 101) in ids                      # normal bucket survives
    assert not any(a < 30 and b < 30 for a, b in ids)  # mass cluster dropped
    uncapped = minhash_lsh_pairs(
        df, "text", "doc_id", n=2, threshold=0.5, max_bucket_size=None
    ).count()
    assert uncapped > len(ids)  # the cap is what removed the m^2 pairs
