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


def ngram_bloom_table(
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """(word, bits): a Bloom filter over the benchmark's distinct word
    n-grams, packed 64 bits per row — the COMPACT broadcast for eval
    suites whose exact distinct-gram set outgrows broadcast range.

    Sizing: ~10 bits/gram + k=4 gives a ~2% false-positive rate on grams
    (decontamination errs on the safe side — an FP only over-quarantines a
    training doc, never leaks an eval doc). A 10M-gram eval suite packs
    into m_bits=2^27 → 16 MB of longs, vs ~1 GB of raw distinct grams:
    that is the difference between a broadcast join and a corpus shuffle
    at 100 TB. Build shape: gram explode → k probe positions per gram →
    word-keyed bit_or partial agg → at most m_bits/64 rows. Fully native
    (xxhash64 + shiftleft), deterministic, no RNG."""
    grams = (
        with_shingles(benchmark, text_col, id_col, n)
        .select(F.explode("sh").alias("ng"))
        .distinct()
    )
    probes = grams.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.concat(F.lit(f"bloom{i}:"), F.col("ng"))),
                        F.lit(m_bits),
                    )
                    for i in range(k)
                ]
            )
        ).alias("pos")
    )
    return (
        probes.select(
            F.expr("pos div 64").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def ngram_overlap_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Bloom-filter variant of ngram_overlap — same output contract
    (doc_id, n_overlap, contaminated), with n_overlap counting distinct
    doc grams that hit ALL k Bloom positions. Always a SUPERSET of the
    exact overlap (no false negatives by Bloom construction); the FP
    excess is the m_bits/k sizing knob, pinned in tests.

    Probe shape: corpus gram explode → the k probe (word, mask) pairs as
    2k NATIVE COLUMNS on one row per gram (no posexplode fan-out) → k
    chained broadcast hash joins against the packed bit table (one per
    probe word; the table is built once, persisted, and re-broadcast from
    cache) → a gram hits iff all k probed bits are set, ANDed natively (a
    position whose word row is absent is a miss) → per-doc distinct-hit
    count. Only grams that pass all k probes reach the one exchange, and
    that exchange is the map-side-combined distinct count keyed by doc_id
    — the gram universe itself is never shuffled (round-4 weak flag: the
    old posexplode + groupBy(doc_id, ng) reassembly paid a second
    gram-scale shuffle and dominated cold-start codegen)."""
    from ..caching import persist_tracked

    bloom_tbl = persist_tracked(
        ngram_bloom_table(benchmark, text_col, id_col, n, m_bits, k)
    )

    def _pos(i: int):
        return F.pmod(
            F.xxhash64(F.concat(F.lit(f"bloom{i}:"), F.col("ng"))),
            F.lit(m_bits),
        )

    probed = (
        with_shingles(spread_small_input(docs), text_col, id_col, n)
        .select("doc_id", F.explode("sh").alias("ng"))
        .select(
            "doc_id",
            "ng",
            *[_pos(i).alias(f"_pos{i}") for i in range(k)],
        )
        .select(
            "doc_id",
            "ng",
            # identical (word, mask) packing to ngram_bloom_table
            *[F.expr(f"_pos{i} div 64").alias(f"_w{i}") for i in range(k)],
            *[
                F.expr(
                    f"shiftleft(1L, CAST(_pos{i} % 64 AS INT))"
                ).alias(f"_m{i}")
                for i in range(k)
            ],
        )
    )
    for i in range(k):
        probed = probed.join(
            F.broadcast(
                bloom_tbl.select(
                    F.col("word").alias(f"_w{i}"),
                    F.col("bits").alias(f"_b{i}"),
                )
            ),
            f"_w{i}",
            "left",
        )
    all_hit = F.lit(True)
    for i in range(k):
        all_hit = all_hit & (
            F.coalesce(F.col(f"_b{i}"), F.lit(0)).bitwiseAND(F.col(f"_m{i}"))
            != 0
        )
    hits = (
        probed.filter(all_hit)
        .groupBy("doc_id")
        .agg(F.count_distinct("ng").alias("n_overlap"))
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


def winnow_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    window: int = 4,
    min_shared: int = 1,
) -> DataFrame:
    """FUZZY decontamination via winnowing fingerprints: a corpus doc is
    flagged when it shares ≥ min_shared SELECTED fingerprints with any
    benchmark doc. Exact n-gram collision (ngram_overlap) requires a
    verbatim k-gram survive the contamination; winnowed fingerprints
    carry the MOSS guarantee instead — any copied run of ≥ window+k−1
    tokens yields a shared fingerprint even when the surrounding text
    was paraphrased, retokenized, or truncated — at ~2/(window+1) of
    the gram-set size, so the broadcast side is several times smaller
    than the exact-gram set for the same eval suite.

    Output: (doc_id, n_overlap, contaminated) for every corpus doc —
    same schema and reading as ngram_overlap, so callers swap freely.

    Shape: benchmark fingerprints are DISTINCT + BROADCAST (eval-suite-
    sized); corpus fingerprints stream out of the doc-keyed window
    selection; one doc-keyed count + left join back. The corpus text
    never shuffles beyond the fingerprint selection's single doc-keyed
    exchange.
    """
    from .neardup import winnow_fingerprints

    bench = F.broadcast(
        winnow_fingerprints(benchmark, text_col, id_col, k=k, window=window)
        .select("fp")
        .distinct()
    )
    cand = winnow_fingerprints(corpus, text_col, id_col, k=k, window=window)
    hits = (
        cand.join(bench, "fp")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    ids = corpus.select(F.col(id_col).alias("doc_id"))
    return ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) >= min_shared)
        .cast("int")
        .alias("contaminated"),
    )
