"""leakage_free_split: near-dup clusters never straddle train/val/test.

Oracle parity (full composition vs recursive-CTE DuckDB restatement) runs
uniformly in tests/test_oracle_parity.py; this module pins the semantic
invariants on a hand-built corpus with known cluster structure.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opendosm_parquet_to_sqlite_spark.operators import corpus, neardup, sampling


BASE = "the quick brown fox jumps over the lazy dog near the old river bank "


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    # 40 clusters of 3 near-identical docs each (same 20-word core, one
    # word perturbed) + 80 singletons with disjoint vocabularies
    for c in range(40):
        core = " ".join(f"w{c}_{i}" for i in range(20))
        for j in range(3):
            rows.append((c * 10 + j, core + f" tail{j}"))
    for s in range(80):
        rows.append((1000 + s, " ".join(f"solo{s}_{i}" for i in range(12))))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clusters_never_straddle_splits(spark, docs):
    out = corpus.leakage_free_split(
        docs, "text", "doc_id", jaccard_threshold=0.5
    )
    pairs = neardup.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5
    )
    straddle = (
        pairs.join(
            out.select(F.col("doc_id").alias("id_a"),
                       F.col("split").alias("split_a")), "id_a")
        .join(out.select(F.col("doc_id").alias("id_b"),
                         F.col("split").alias("split_b")), "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
    )
    assert pairs.count() > 0  # the fixture really has near-dup pairs
    assert straddle.count() == 0


def test_cluster_members_share_rep_and_split(spark, docs):
    out = corpus.leakage_free_split(
        docs, "text", "doc_id", jaccard_threshold=0.5
    ).toPandas()
    by_cluster = out[out.doc_id < 1000].copy()
    by_cluster["c"] = by_cluster.doc_id // 10
    g = by_cluster.groupby("c").agg(
        n_rep=("rep_id", "nunique"), n_split=("split", "nunique"),
        min_id=("doc_id", "min"), rep=("rep_id", "first"),
    )
    assert (g.n_rep == 1).all() and (g.n_split == 1).all()
    # representative is the min member id (graph contract)
    assert (g.rep == g.min_id).all()


def test_singletons_match_plain_split_assign(spark, docs):
    out = corpus.leakage_free_split(
        docs, "text", "doc_id", jaccard_threshold=0.5
    )
    solo = out.filter(F.col("doc_id") >= 1000)
    plain = sampling.split_assign(
        docs.filter(F.col("doc_id") >= 1000).select("doc_id"), "doc_id"
    ).select("doc_id", F.col("split").alias("plain_split"))
    diff = solo.join(plain, "doc_id").filter(
        F.col("split") != F.col("plain_split")
    )
    # a singleton's representative is itself -> identical hash band
    assert solo.count() == 80
    assert diff.count() == 0


def test_every_doc_assigned_exactly_once(spark, docs):
    out = corpus.leakage_free_split(
        docs, "text", "doc_id", jaccard_threshold=0.5
    )
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    assert out.filter(~F.col("split").isin("train", "val", "test")).count() == 0


def test_fold_assign_partitions_and_is_stable(spark):
    from pyspark.sql import functions as F2

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    out = sampling.fold_assign(df, "doc_id", k=5).toPandas()
    assert len(out) == 2000 and out.fold.between(0, 4).all()
    sizes = out.groupby("fold").size()
    assert len(sizes) == 5 and (sizes > 2000 / 5 * 0.7).all()
    # stability: assignment of existing ids is unchanged by new rows
    bigger = spark.createDataFrame(
        [(i,) for i in range(4000)], "doc_id long"
    )
    out2 = sampling.fold_assign(bigger, "doc_id", k=5).toPandas()
    merged = out.merge(out2, on="doc_id", suffixes=("_a", "_b"))
    assert (merged.fold_a == merged.fold_b).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        sampling.fold_assign(df, "doc_id", k=1)
