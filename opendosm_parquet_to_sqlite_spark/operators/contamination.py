"""Benchmark-contamination detection: flag training documents that share
word n-grams with a held-out evaluation set (the GPT-3/PaLM decontamination
recipe — n-gram collision against the benchmark, not semantic similarity).

Shape at 100 TB: the benchmark side is an EVAL SUITE — thousands of
documents, not billions — so its distinct n-gram set is broadcast and the
corpus side never shuffles: each corpus partition explodes its own n-grams,
hash-joins against the broadcast set locally, and emits per-doc hit counts
through a map-side-combined aggregation keyed by doc_id. The only exchange
carries (doc_id, partial_count) longs. If the benchmark ever outgrows
broadcast range, drop the hint and let AQE pick a shuffle join — the code
path is the same equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .neardup import with_shingles
from .text import spread_small_input


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, n_overlap, contaminated) for every row of `docs`.

    n_overlap = number of DISTINCT word n-grams of the document that occur
    anywhere in the benchmark; contaminated = 1 iff n_overlap > 0. Docs
    shorter than n tokens have no n-grams and are trivially clean.
    """
    # pure scan → gram map: spread few-partition sources across cores
    # (measured 3× at sf0.1 — the gram pass is the whole cost here)
    cand = with_shingles(
        spread_small_input(docs), text_col, id_col, n
    ).select("doc_id", F.explode("sh").alias("ng"))
    bench = (
        with_shingles(benchmark, text_col, id_col, n)
        .select(F.explode("sh").alias("ng"))
        .distinct()
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    hits = (
        cand.join(bench, "ng", "leftsemi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )
