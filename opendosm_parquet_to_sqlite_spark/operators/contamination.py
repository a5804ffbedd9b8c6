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

import numpy as np
import pandas as pd
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


def semantic_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    ndigits: int = 6,
    max_benchmark: int = 1_000_000,
) -> DataFrame:
    """Embedding-space decontamination — the SEMANTIC sibling of
    ngram_overlap/winnow_overlap (the modality n-gram methods miss:
    paraphrased or translated benchmark items share no surface n-grams
    but land next to the original in embedding space; the
    phi/Llama-style "semantic dedup against the eval set" recipe). For
    every corpus vector: its max cosine against the benchmark set, and
    a contaminated flag at `threshold`.

    Shape at 100 TB: the benchmark is an EVAL SUITE — thousands of
    vectors, not billions — so it is collected to a (B × D) float64
    matrix ONCE (the same driver-size contract as brute_force_topk's
    broadcast query side) and closed over by an Arrow mapInPandas. The
    corpus is scanned exactly once with NO shuffle and NO pair
    materialization: each Arrow batch computes one
    (batch × D)·(D × B) BLAS matmul and keeps only the row max —
    the N·B scored pairs never exist as rows anywhere. This is the
    measured-fast shape (multi_lsh_buckets_vec: interpreted
    aggregate/zip_with dots cost ~0.5 ms/row and run at scan
    parallelism; a batch matmul amortizes the identical math to
    ~1 µs/row). mapInPandas rather than a scalar pandas_udf: the flag
    reuses the scored value, and one MapInPandas node emitting the raw
    max exactly once — round/threshold as native expressions over its
    materialized output — is single-evaluation by construction, not by
    the optimizer's UDF-dedup grace.

    Numerics: cosine = (c/|c|)·(b/|b|) in float64; the rounded value
    (`ndigits`) is what both the output column and the flag use, so
    the flag is always consistent with the reported max_cosine, and a
    DuckDB restatement (max of list_dot_product cosines, rounded the
    same) hash-matches — summation-order ULP differences sit ~4 orders
    of magnitude under the rounding grid on this corpus.

    NULL/empty edges: a corpus row with a NULL vector gets
    max_cosine NULL, contaminated 0; an EMPTY benchmark yields
    max_cosine NULL for every row (nothing to collide with).

    Output: (id_col, max_cosine DOUBLE, contaminated INT), one row per
    corpus row.

    `max_benchmark` enforces the eval-suite-size contract on the driver
    collect: the benchmark side must stay model-sized (default cap 1M
    vectors ≈ 3 GB of float64 at D=384). A corpus-scale mis-call fails
    fast with ValueError instead of OOMing the driver and shipping a
    multi-GB closure to every task.
    """
    from pyspark.sql import types as T

    if id_col not in corpus.columns:
        raise ValueError(
            f"id column {id_col!r} not found in corpus columns "
            f"{corpus.columns}"
        )
    # ONE job over ONE snapshot: limit(cap+1) bounds both the job and the
    # driver memory of the guard, and the guard and the matrix it guards
    # see the same benchmark version — a separate count() job left a
    # window where an atomic parquet overwrite landing between the two
    # jobs made them describe different benchmarks (ADVICE r12; the
    # max_domains guard in sampling.doremi_weights uses the same idiom).
    rows = benchmark.select(vec_col).limit(int(max_benchmark) + 1).collect()
    if len(rows) > int(max_benchmark):
        raise ValueError(
            f"benchmark has more than max_benchmark={int(max_benchmark)} "
            f"rows: semantic_overlap collects the benchmark to a "
            f"driver-side matrix and broadcasts it to every task, so it "
            f"must stay eval-suite-sized. Reduce the benchmark, or raise "
            f"max_benchmark explicitly if the driver can hold it."
        )
    bvecs = [r[0] for r in rows if r[0] is not None]
    if bvecs:
        B = np.asarray(bvecs, dtype=np.float64)
        Bn = (B / np.maximum(
            np.linalg.norm(B, axis=1, keepdims=True), 1e-300
        )).T.copy()  # (D × B), contiguous for the matmul
    else:
        Bn = None

    id_field = corpus.schema[id_col]
    raw_schema = T.StructType(
        [id_field, T.StructField("__raw_max", T.DoubleType())]
    )

    def score(batches):
        for pdf in batches:
            out = np.full(len(pdf), np.nan)
            if Bn is not None and len(pdf):
                vs = pdf[vec_col]
                null_mask = vs.isna().to_numpy()
                if not null_mask.all():
                    # widen BEFORE any arithmetic: the column is
                    # array<float> and a float32 matmul carries ~1e-6
                    # relative error — visible in the 6-digit rounded
                    # output (measured: 3 rows off by 1 ulp-of-grid at
                    # sf0.01). float64 on exactly-widened float32 values
                    # matches DuckDB's ::DOUBLE[] semantics.
                    C = np.stack(vs[~null_mask].to_numpy()).astype(
                        np.float64
                    )
                    Cn = C / np.maximum(
                        np.linalg.norm(C, axis=1, keepdims=True), 1e-300
                    )
                    out[~null_mask] = (Cn @ Bn).max(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    # nullable Float64 so NaN (no score) crosses Arrow as
                    # NULL, not as double-NaN (which Spark orders ABOVE
                    # every threshold and would flag as contaminated)
                    "__raw_max": pd.Series(out).astype("Float64"),
                }
            )

    raw = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score, raw_schema
    )
    rounded = F.round(F.col("__raw_max"), ndigits)
    return raw.select(
        F.col(id_col),
        rounded.alias("max_cosine"),
        F.coalesce(
            (rounded >= float(threshold)).cast("int"), F.lit(0)
        ).alias("contaminated"),
    )
