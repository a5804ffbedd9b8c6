"""Tombstone-delete paths for the persisted MinHash (text) and media
fingerprint indexes — the round-8 verdict item 5: the takedown/opt-out
story IVF got in round 8, mirrored (O(ids) delete, probe-side broadcast
anti-join, threshold-gated compaction, crash-safe swaps,
resurrect-on-append with physical rewrite)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import mediadedup as M
from opendosm_parquet_to_sqlite_spark.operators import neardup


# --- media fingerprint index --------------------------------------------------


def _media_index(spark, tmp_path, n=12):
    path = str(tmp_path / "fpidx")
    ids = spark.range(n).withColumnRenamed("id", "doc_id")
    corpus = M.synth_png_corpus(ids, "doc_id", n_bases=n)
    M.build_media_fp_index(corpus, "payload", "doc_id", path)
    # a probe payload that collides with base 3 (a re-encode)
    probe = spark.createDataFrame(
        [(900, M.encode_png_gray(M._base_gray(3, 24), level=0))],
        "doc_id long, payload binary",
    )
    return path, probe


@pytest.mark.slow
def test_media_delete_never_surfaces_and_is_o_ids(spark, tmp_path):
    path, probe = _media_index(spark, tmp_path)
    hit = {
        r.index_id
        for r in M.probe_media_fp_index(
            spark, path, probe, "payload", "doc_id"
        ).collect()
    }
    assert hit == {3}
    rows_before = spark.read.parquet(path).count()
    n = M.delete_from_media_fp_index(
        spark, path, spark.createDataFrame([(3,)], "id long")
    )
    assert n == 1
    # idempotent + foreign ids are no-ops
    assert M.delete_from_media_fp_index(
        spark, path, spark.createDataFrame([(3,), (12345,)], "id long")
    ) == 0
    assert (
        M.probe_media_fp_index(
            spark, path, probe, "payload", "doc_id"
        ).count() == 0
    )
    # delete is O(ids): index rows untouched pre-compaction
    assert spark.read.parquet(path).count() == rows_before


def test_media_compaction_gc_and_threshold(spark, tmp_path):
    path, probe = _media_index(spark, tmp_path)
    M.delete_from_media_fp_index(
        spark, path, spark.createDataFrame([(3,), (4,)], "id long")
    )
    total = spark.read.parquet(path).count()
    # below threshold: counted no-op, tombstones stay
    res = M.compact_media_fp_tombstones(
        spark, path, max_tombstone_fraction=0.99
    )
    assert res["skipped"] and res["n_tombstoned"] > 0
    assert os.path.exists(M._media_tombstone_path(path))
    # above threshold: dead rows gone, tombstones cleared, probe same
    res = M.compact_media_fp_tombstones(
        spark, path, max_tombstone_fraction=0.01
    )
    assert not res["skipped"]
    assert spark.read.parquet(path).count() == total - res["n_tombstoned"]
    assert not os.path.exists(M._media_tombstone_path(path))
    assert (
        M.probe_media_fp_index(
            spark, path, probe, "payload", "doc_id"
        ).count() == 0
    )
    assert spark.read.parquet(path).filter(
        F.col("doc_id").isin(3, 4)
    ).count() == 0
    with pytest.raises(ValueError):
        M.compact_media_fp_tombstones(spark, path, max_tombstone_fraction=0)


@pytest.mark.slow
def test_media_append_resurrects_single_copy(spark, tmp_path):
    path, probe = _media_index(spark, tmp_path)
    M.delete_from_media_fp_index(
        spark, path, spark.createDataFrame([(3,)], "id long")
    )
    assert (
        M.probe_media_fp_index(
            spark, path, probe, "payload", "doc_id"
        ).count() == 0
    )
    # re-append id 3's payload: tombstone clears, old rows rewritten out
    ids3 = spark.createDataFrame([(3,)], "doc_id long")
    again = M.synth_png_corpus(ids3, "doc_id", n_bases=12)
    M.append_media_fp_index(again, "payload", "doc_id", path)
    hits = M.probe_media_fp_index(
        spark, path, probe, "payload", "doc_id"
    ).collect()
    assert {r.index_id for r in hits} == {3}
    # physically single: exactly one row per (chunk, key) for id 3
    per = (
        spark.read.parquet(path)
        .filter(F.col("doc_id") == 3)
        .groupBy("chunk", "key")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per == 1


def test_media_tombstone_swap_crash_recovers(spark, tmp_path):
    import shutil

    path, probe = _media_index(spark, tmp_path)
    M.delete_from_media_fp_index(
        spark, path, spark.createDataFrame([(3,)], "id long")
    )
    tpath = M._media_tombstone_path(path)
    # simulate the mid-swap crash of a tombstone clear
    shutil.copytree(tpath, tpath + "__new")
    os.rename(tpath, tpath + ".old")
    assert (
        M.probe_media_fp_index(
            spark, path, probe, "payload", "doc_id"
        ).count() == 0
    )
    assert os.path.exists(tpath)
    assert not os.path.exists(tpath + ".old")
    assert not os.path.exists(tpath + "__new")


# --- MinHash neardup index ----------------------------------------------------


def _text_corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog near the quiet river "
        "bank while autumn leaves drift slowly downstream past the mill"
    )
    rows = [(i, f"{base} unique tail {i} " + " ".join(
        f"w{i}x{j}" for j in range(10)
    )) for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string"), base


def _nd_index(spark, tmp_path):
    docs, base = _text_corpus(spark)
    path = str(tmp_path / "ndidx")
    bands, sets = neardup.build_neardup_index(docs, "text", "doc_id")
    neardup.save_neardup_index(bands, sets, path)
    # probe doc: near-verbatim copy of doc 2 -> high jaccard vs index
    dup_text = docs.filter(F.col("doc_id") == 2).first()["text"]
    probe = spark.createDataFrame(
        [(902, dup_text + " tiny edit")], "doc_id long, text string"
    )
    return path, probe


def _probe(spark, path, probe):
    bands, sets = neardup.load_neardup_index(spark, path)
    return neardup.probe_neardup_index(
        probe, bands, sets, "text", "doc_id", threshold=0.5
    )


@pytest.mark.slow
def test_neardup_delete_never_surfaces(spark, tmp_path):
    path, probe = _nd_index(spark, tmp_path)
    hits = {r.index_id for r in _probe(spark, path, probe).collect()}
    assert 2 in hits
    docs_before = spark.read.parquet(f"{path}/sets").count()
    n = neardup.delete_from_neardup_index(
        spark, path, spark.createDataFrame([(2,)], "id long")
    )
    assert n == 1
    assert neardup.delete_from_neardup_index(
        spark, path, spark.createDataFrame([(2,), (777,)], "id long")
    ) == 0
    assert 2 not in {
        r.index_id for r in _probe(spark, path, probe).collect()
    }
    # O(ids): index rows untouched pre-compaction
    assert spark.read.parquet(f"{path}/sets").count() == docs_before


@pytest.mark.slow
def test_neardup_compaction_and_resurrect(spark, tmp_path):
    path, probe = _nd_index(spark, tmp_path)
    neardup.delete_from_neardup_index(
        spark, path, spark.createDataFrame([(2,)], "id long")
    )
    # below threshold: no-op; above: rows rewritten, tombstones cleared
    assert neardup.compact_neardup_tombstones(
        spark, path, max_tombstone_fraction=0.99
    )["skipped"]
    res = neardup.compact_neardup_tombstones(
        spark, path, max_tombstone_fraction=0.05
    )
    assert not res["skipped"] and res["n_tombstoned"] == 1
    assert spark.read.parquet(f"{path}/sets").filter(
        F.col("doc_id") == 2
    ).count() == 0
    assert not os.path.exists(neardup._neardup_tombstone_path(path))
    assert 2 not in {
        r.index_id for r in _probe(spark, path, probe).collect()
    }
    # resurrect via append: delete 3, re-append it, probe of doc-3 text
    docs, _ = _text_corpus(spark)
    neardup.delete_from_neardup_index(
        spark, path, spark.createDataFrame([(3,)], "id long")
    )
    d3 = docs.filter(F.col("doc_id") == 3)
    nb, ns = neardup.build_neardup_index(d3, "text", "doc_id")
    neardup.append_neardup_index(spark, path, nb, ns)
    t3 = d3.first()["text"]
    probe3 = spark.createDataFrame(
        [(903, t3 + " tiny edit")], "doc_id long, text string"
    )
    assert 3 in {
        r.index_id for r in _probe(spark, path, probe3).collect()
    }
    # physically single in the sets table (no dead twin)
    assert spark.read.parquet(f"{path}/sets").filter(
        F.col("doc_id") == 3
    ).count() == 1
    tomb = os.path.exists(neardup._neardup_tombstone_path(path))
    if tomb:
        from opendosm_parquet_to_sqlite_spark.operators import tombstones as ts

        t = ts.load_tombstones(
            spark, neardup._neardup_tombstone_path(path), "doc_id"
        )
        assert t is None or t.filter(F.col("doc_id") == 3).count() == 0
