"""Composed corpus-cleaning pipeline — the canonical LLM training-data flow.

Stages (each an operator from this package, composed as ONE lazy plan):

1. quality gate   — drop documents below a quality score (operators.text)
2. exact dedup    — keep the min-id document per content digest
3. near-dup sweep — exact capped n-gram Jaccard pairs among survivors,
                    resolved either greedily (drop the larger id of every
                    pair) or by connected-component clustering
                    (cluster=True; operators.graph union-find keeping the
                    min-id doc per component — the MinHashLSH/C4-style
                    standard semantics)

Every stage is SQL-expressible, so the WHOLE composition is verified
against a DuckDB oracle end-to-end (plans.queries: corpus_clean) — the
property that matters for a data pipeline: not that each piece is right,
but that the composition is.

Scale shape: stage 1 is a narrow map; stage 2 shuffles digests; stage 3 is
the capped inverted index (operators.neardup) + two anti-joins. No stage
materializes to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup, graph, neardup, text


def clean_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_quality: float = 0.5,
    ngram_n: int = 3,
    jaccard_threshold: float = 0.3,
    max_doc_freq: int | None = 50,
    cluster: bool = False,
) -> DataFrame:
    """Quality-gate, exact-dedup, then near-dup-sweep a document table.

    Returns the surviving rows with all original columns. Deterministic:
    survivors depend only on the data, never on partitioning.

    cluster=False (default): greedy sweep — for every similar pair the
    larger id is removed. Conservative but over-deletes on chains: pairs
    (A,B),(B,C) with A≁C keep only A.

    cluster=True: connected-component semantics (the MinHashLSH/C4-style
    standard) — pairs are clustered with distributed union-find
    (operators.graph) and exactly the min-id document of each component
    survives. A chain A~B~C keeps exactly A.
    """
    gated = df.filter(text.quality_score(F.col(text_col)) >= min_quality)
    exact_kept = dedup.exact_dedup_keep_first(gated, text_col, id_col)
    pairs = neardup.ngram_jaccard_pairs(
        exact_kept,
        text_col,
        id_col,
        n=ngram_n,
        threshold=jaccard_threshold,
        max_doc_freq=max_doc_freq,
    )
    if cluster:
        comp = graph.connected_components(pairs, "id_a", "id_b")
        losers = comp.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias(id_col)
        )
    else:
        # ngram_jaccard_pairs emits id_a < id_b, so dropping every id_b
        # keeps the minimum id of each similar pair
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return exact_kept.join(losers, id_col, "left_anti")
