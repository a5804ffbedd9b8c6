"""Contrastive / preference training-data preparation — the pair-building
pass between a curated corpus and an embedding-model or RLHF fine-tune:
every anchor needs negatives (random for InfoNCE, HARD for metric
learning), and preference tuning needs (chosen, rejected) pairs.

Reference scope note: the reference (src/main.rs) has no training-data
layer; these are SURVEY §2.13 rebuild extensions composing the engine's
own primitives (md5-band determinism from sampling.py, the kNN graph from
similarity.py, max_by survivorship from dedup.py).

Design rules, as everywhere: deterministic under any partitioning (hash
orderings, never rand()), candidate volume explicitly bounded (pool-sized
broadcasts, never n² anchors×corpus), one keyed exchange per output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def negative_samples(
    df: DataFrame,
    id_col: str,
    cluster_col: str,
    k: int = 4,
    pool_size: int = 256,
    seed: str = "neg-v1",
) -> DataFrame:
    """k random negatives per anchor for contrastive training, excluding
    the anchor's own cluster (a near-duplicate drawn as a "negative" is
    a false negative that actively damages the loss — cluster exclusion
    is the point of running dedup first).

    Deterministic without rand(): a global candidate POOL of `pool_size`
    rows is chosen by md5(seed, id) ordering (reproducible under any
    partitioning — the sampling.py band idiom), broadcast, and each
    anchor takes its k lowest md5(seed, anchor, candidate) candidates
    from a different cluster.  Per-anchor randomness comes from the
    anchor-salted hash, so anchors don't all draw the same negatives
    even though they share one pool.

    Bias note (the honest contract): negatives come FROM THE POOL, i.e.
    uniformly over a fixed random subset — the standard in-batch /
    memory-bank approximation, not i.i.d. over the corpus per anchor
    (that requires n×corpus work).  pool_size controls the
    approximation; anchors in clusters overlapping the whole pool (one
    giant cluster) get fewer than k rows rather than wrong ones.

    Shape: pool = TakeOrdered(pool_size) on the hash (one pass, no
    shuffle of the corpus); anchors × pool is a broadcast nested-loop
    fan-out of n·pool_size rows thinned by the cluster filter, then ONE
    per-anchor WindowGroupLimit keeps k.  Output: (anchor id, negative
    id, their clusters) — join payloads back downstream as needed.
    """
    from pyspark.sql.window import Window as W

    pool = (
        df.select(
            F.col(id_col).alias("__cand_id"),
            F.col(cluster_col).alias("__cand_cluster"),
        )
        .orderBy(
            F.md5(F.concat_ws("\x1f", F.lit(seed), F.col("__cand_id"))),
            F.col("__cand_id"),
        )
        .limit(int(pool_size))
    )
    anchors = df.select(
        F.col(id_col).alias("anchor_id"),
        F.col(cluster_col).alias("anchor_cluster"),
    )
    fanned = anchors.join(
        F.broadcast(pool),
        F.col("__cand_cluster") != F.col("anchor_cluster"),
    )
    w = W.partitionBy("anchor_id").orderBy(
        F.md5(
            F.concat_ws(
                "\x1f", F.lit(seed), F.col("anchor_id"), F.col("__cand_id")
            )
        ),
        F.col("__cand_id"),
    )
    return (
        fanned.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(k))
        .select(
            "anchor_id",
            F.col("__cand_id").alias("negative_id"),
            "anchor_cluster",
            F.col("__cand_cluster").alias("negative_cluster"),
        )
    )


def hard_negatives(
    knn: DataFrame,
    clusters: DataFrame,
    k: int = 2,
    node_col: str = "node",
    cluster_col: str = "cluster",
) -> DataFrame:
    """HARD negatives: each anchor's most-similar neighbors that are NOT
    in its cluster — the highest-loss, most-informative negatives for
    metric learning, mined straight from the kNN graph (similarity.
    knn_graph) + any cluster assignment (mutual_knn_clusters,
    dup_clusters, a label column).  The same composition with the
    comparison flipped (= cluster) yields extra positives; the anti
    side is the valuable one.

    Shape: two broadcast-able joins label both edge endpoints (the
    cluster table is node-sized), a narrow inequality filter, then ONE
    per-anchor WindowGroupLimit by (cosine DESC, neighbor ASC).  The
    kNN edge list (k·n rows) is the largest thing touched; the corpus
    and embeddings are never re-read.

    Output: (anchor_id, negative_id, cosine, rank).
    """
    from pyspark.sql.window import Window as W

    c_src = clusters.select(
        F.col(node_col).alias("src"),
        F.col(cluster_col).alias("__c_src"),
    )
    c_dst = clusters.select(
        F.col(node_col).alias("dst"),
        F.col(cluster_col).alias("__c_dst"),
    )
    labeled = knn.join(c_src, "src").join(c_dst, "dst").filter(
        F.col("__c_src") != F.col("__c_dst")
    )
    w = W.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst"))
    return (
        labeled.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(k))
        .select(
            F.col("src").alias("anchor_id"),
            F.col("dst").alias("negative_id"),
            "cosine",
            F.col("__rk").cast("long").alias("rank"),
        )
    )


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    min_margin: float = 0.0,
) -> DataFrame:
    """(chosen, rejected) preference pairs per group: the top- and
    bottom-scoring member (quality score, reward-model score, heuristic
    gate) of every group with a margin above `min_margin` — the
    DPO/RLHF data-prep shape ("for each prompt, best vs worst answer").

    Deterministic extremes via max_by/min_by over (score, tiebreak-id)
    structs in ONE partial-combined agg — per-group champions combine
    map-side exactly like the flagship latest_per_group_maxby; ties
    break to the LOWER id on both ends so reruns emit identical pairs.
    Groups with fewer than 2 members, or margin ≤ min_margin, drop out
    (a pair that says nothing teaches nothing).

    Output: (group, chosen_id, rejected_id, chosen_score,
    rejected_score, margin 6 dp).
    """
    s = F.col(score_col).cast("double")
    # "prefer lower id on ties" for BOTH extremes WITHOUT negating the
    # id (string ids -- the natural document/sample id type -- can't be
    # negated): the chosen side is min_by over the key struct
    # (-score, id), which picks max score then min id and stays
    # type-agnostic in the id
    agg = df.filter(s.isNotNull()).groupBy(group_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.min_by(
            F.struct(F.col(id_col).alias("id"), s.alias("score")),
            F.struct((-s).alias("__ns"), F.col(id_col)),
        ).alias("__best"),
        F.min_by(
            F.struct(F.col(id_col).alias("id"), s.alias("score")),
            F.struct(s, F.col(id_col)),
        ).alias("__worst"),
    )
    margin = F.col("__best.score") - F.col("__worst.score")
    return (
        agg.filter(
            (F.col("__n") >= 2) & (margin > F.lit(float(min_margin)))
        )
        .select(
            group_col,
            F.col("__best.id").alias("chosen_id"),
            F.col("__worst.id").alias("rejected_id"),
            F.col("__best.score").alias("chosen_score"),
            F.col("__worst.score").alias("rejected_score"),
            F.round(margin, 6).alias("margin"),
        )
    )
