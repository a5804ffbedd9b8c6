"""Keyword search over the corpus: inverted-index BM25 top-k retrieval.

Training-data pipelines need keyword retrieval constantly — "find every
document mentioning X" for targeted curation, eval-set mining, or
quality-audit spot checks. At 100 TB you cannot grep; you score against an
inverted index. This module builds that index as a DataFrame plan and runs
Okapi BM25 entirely with native Column expressions (no Python in the hot
path), so Catalyst sees one declarative plan:

  tokenize (narrow map, codegen)
    -> explode tokens
    -> broadcast SEMI-join against the query-term set   <- the key pruning
    -> (doc, term) partial-agg for term frequencies
    -> tiny (term) agg for document frequencies
    -> broadcast joins back + scoring expression
    -> per-query top-k

The broadcast semi-join right after the explode is what makes this scale:
only postings for terms that actually appear in some query survive past the
first exchange. A 100 TB corpus scoring a 1k-term query batch shuffles
(docs_with_hits x query_terms) rows, not the corpus. Corpus-level scalars
(N, avgdl) ride a 1-row broadcast crossJoin, the repo's standard idiom for
whole-corpus constants.

Determinism / oracle parity: every score input (tf, df, dl, N) is an exact
integer and avgdl is an exact-integer ratio, so Spark and DuckDB compute
bit-identical IEEE doubles for each term contribution; per-(query,doc) sums
can differ only in summation order, which the 9-dp ranking round absorbs.
Ranking ties break on doc_id. Reference scope anchor: the reference engine
(src/main.rs:252-278) exposes only SQL equality lookups; retrieval ranking
is a north-star extension (SURVEY.md SS2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import spread_small_input, tokens

# Okapi BM25 defaults (Robertson/Sparck Jones; the Lucene defaults).
BM25_K1 = 1.2
BM25_B = 0.75


def _lower_tokens(col) -> F.Column:
    return F.transform(tokens(col), lambda t: F.lower(t))


def doc_term_freqs(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, term, tf, dl): the inverted-index posting rows plus the
    document length carried inline (max(dl) is constant per doc), which
    saves the separate corpus-sized doc-length join at scoring time."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        _lower_tokens(F.col(text_col)).alias("__toks"),
    ).select("doc_id", F.size("__toks").alias("dl"), "__toks")
    return (
        toked.select("doc_id", "dl", F.explode("__toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents per query under Okapi BM25.

    Returns (query_id, doc_id, score, rank), rank 1..k per query, ordered
    by round(score, 9) DESC then doc_id ASC (the round collapses
    summation-order float dust so the ranking is engine-portable; the
    reported score is rounded to 6 dp to match the oracle hash contract).

    idf = ln(1 + (N - df + 0.5) / (df + 0.5))  (Lucene's non-negative form)
    tf-part = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    Duplicate terms inside one query count once (web-query semantics).

    Scale: `queries` is an eval/curation batch — thousands of rows, not
    billions — so its distinct term set broadcasts; the corpus-side explode
    is semi-joined against it BEFORE any aggregation, and every downstream
    exchange carries only matched postings. The final per-query top-k is a
    rank window partitioned by query_id: with a large query batch the
    partitions spread; a single mega-hit query is bounded by its postings,
    not the corpus.
    """
    spark = docs.sparkSession

    # --- query side: distinct (query_id, term), tiny -> broadcast ---------
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(_lower_tokens(F.col(query_text_col))).alias("term"),
        )
        .distinct()
    )
    term_set = F.broadcast(qterms.select("term").distinct())

    # --- corpus-level scalars: N and avgdl (one partial-agg pass) ---------
    toked = spread_small_input(docs).select(
        F.col(id_col).alias("doc_id"),
        _lower_tokens(F.col(text_col)).alias("__toks"),
    )
    lens = toked.select("doc_id", F.size("__toks").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )

    # --- postings for query terms only ------------------------------------
    postings = (
        toked.select(
            "doc_id",
            F.size("__toks").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .join(term_set, "term", "leftsemi")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    )

    # --- document frequency per (matched) term: tiny agg -> broadcast -----
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )

    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b)
                    * F.col("dl")
                    / (F.col("total_dl") / F.col("n_docs"))
                )
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )

    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 9).desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.round("score", 6).alias("score"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def tfidf_top_terms_per_doc(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed tf-idf — the
    keyword-extraction / topic-tagging pre-pass (doc-level metadata for
    curation and mixing decisions).

    tfidf = tf * ln((N + 1) / (df + 1)); ties by term ASC. Returns
    (doc_id, term, tfidf, rank). Unlike bm25_topk there is no query-side
    pruning — this is a whole-corpus pass: tokenize -> (doc,term) agg ->
    term-keyed COUNT WINDOW attaching df -> rank window by doc_id.

    Round-14 opt: df used to be a separate (term) aggregation joined
    back onto tf — but tf is a lazy plan, so the dfreq leg and the join
    leg each re-executed the whole tokenize+explode+agg chain (two full
    corpus tokenizations, measured as two 32-task scan stages and
    12.9 + 5.8 s executor time at sf0.1), plus one extra exchange for
    the join. An unordered count() window over the term-keyed layout
    computes the same df with the postings tokenized and shuffled ONCE:
    1.65 -> 1.21 s median isolated, hash-identical output. Scale note:
    a hyper-hot term concentrates its postings in one window group
    exactly as it concentrated in one join reducer before; the window
    buffer spills (ExternalAppendOnlyUnsafeRowArray), and a df-cap
    pre-filter (the max_doc_freq idiom from operators.neardup) is the
    knob if stopword groups ever dominate a corpus-scale run. The rank
    window stays per-document and never concentrates.
    """
    tf = doc_term_freqs(spread_small_input(docs), text_col, id_col)
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    wdf = Window.partitionBy("term")
    scored = tf.withColumn("df", F.count(F.lit(1)).over(wdf))
    if min_df > 1:
        scored = scored.filter(F.col("df") >= min_df)
    scored = (
        scored.crossJoin(F.broadcast(stats))
        .withColumn(
            "tfidf",
            F.col("tf")
            * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.round(F.col("tfidf"), 9).desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            F.round("tfidf", 6).alias("tfidf"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    query_col: str = "query_id",
    doc_a: str = "doc_id",
    doc_b: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked retrieval lists (public RRF:
    fused(d) = Σ 1/(k_rrf + rank_i(d)) over the lists that retrieved d)
    — the standard hybrid-search combiner, score-scale-free by design:
    BM25 scores and cosine similarities are not commensurable, but their
    RANKS are, which is why RRF needs no per-list normalization and is
    the default fusion in every lexical+vector stack.

    A document retrieved by only one list contributes only that list's
    term (the absent rank adds zero, not a penalty).  k_rrf=60 is the
    public default; larger values flatten rank differences.

    Output: query_col, doc_id, rrf_score (6 dp), rank (long, fused
    top-k, ties broken by doc_id).

    Shape: both inputs are already top-k-per-query tables — tiny by
    construction (queries × k rows) — so the full-outer join and the
    fused rank window cost nothing at any corpus scale; the heavy
    lifting happened inside the upstream retrievers, which is the
    architectural point: fusion composes ranked RESULTS, never corpora.
    """
    a = ranked_a.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_a).alias("doc_id"),
        F.col(rank_col).alias("__ra"),
    )
    b = ranked_b.select(
        F.col(query_col).alias("query_id"),
        F.col(doc_b).alias("doc_id"),
        F.col(rank_col).alias("__rb"),
    )
    j = a.join(b, ["query_id", "doc_id"], "full_outer")
    rrf = F.coalesce(
        1.0 / (F.lit(float(k_rrf)) + F.col("__ra")), F.lit(0.0)
    ) + F.coalesce(
        1.0 / (F.lit(float(k_rrf)) + F.col("__rb")), F.lit(0.0)
    )
    w = Window.partitionBy("query_id").orderBy(
        rrf.desc(), F.col("doc_id")
    )
    return (
        j.select(
            "query_id",
            "doc_id",
            F.round(rrf, 6).alias("rrf_score"),
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= int(k))
    )


def ranking_metrics(
    ranked: DataFrame,
    labels: DataFrame,
    query_col: str,
    doc_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Offline ranking evaluation — precision@k, MRR, and NDCG@k per
    query — the measurement half of the retrieval stack (bm25_topk /
    rrf_fuse / the ANN family produce rankings; this scores them against
    graded relevance labels).

    Definitions (per query, over the top-k of `ranked`):
        precision@k = |{rank ≤ k : rel > 0}| / k
        MRR         = 1 / min{rank : rel > 0}          (0 if no hit)
        NDCG@k      = DCG@k / IDCG@k,
                      DCG = Σ (2^rel − 1) / log2(rank + 1)
    IDCG re-ranks the query's OWN labels (rel desc, doc id asc for tie
    determinism) — the ideal ordering, computed from the label table, not
    from the ranking under test.  A query with no positive labels scores
    0.0 across the board (the convention that keeps macro-averages
    defined), never NULL/NaN.  Unlabeled ranked docs count rel = 0.

    Output: (query_col, n_ranked BIGINT, precision_at_k, mrr, ndcg)
    rounded to `ndigits` — per-query rows; macro-average downstream with
    one more tiny agg when a single scalar is wanted.

    Shape: the ranked side filters to rank ≤ k FIRST (k rows per query
    survive before any exchange), left-joins labels on (query, doc), and
    partial-aggregates to one row per query; the IDCG side is one window
    over the label table + the same per-query agg; the final join is
    query-table-sized on both sides.  At 100 TB of rankings the shuffles
    carry k·|queries| and |labels| rows — never a corpus.  Fully
    SQL-expressible → hash-checked vs DuckDB.
    """
    from pyspark.sql.window import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q, d, r = F.col(query_col), F.col(doc_col), F.col(rank_col)
    rel = F.col(rel_col).cast("double")
    topk = ranked.filter(r <= k).select(
        q.alias("__q"), d.alias("__d"), r.cast("double").alias("__r")
    )
    lab = labels.select(
        q.alias("__lq"), d.alias("__ld"), rel.alias("__rel")
    )
    joined = topk.join(
        lab,
        (F.col("__q") == F.col("__lq")) & (F.col("__d") == F.col("__ld")),
        "left",
    ).select(
        "__q",
        "__r",
        F.coalesce(F.col("__rel"), F.lit(0.0)).alias("__rel"),
    )
    hit = F.col("__rel") > 0
    per_q = joined.groupBy("__q").agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        (F.sum(hit.cast("double")) / float(k)).alias("__prec"),
        F.coalesce(
            1.0 / F.min(F.when(hit, F.col("__r"))), F.lit(0.0)
        ).alias("__mrr"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("__rel")) - 1.0)
            / F.log2(F.col("__r") + 1.0)
        ).alias("__dcg"),
    )
    wideal = W.partitionBy("__lq").orderBy(
        F.col("__rel").desc(), F.col("__ld").asc()
    )
    ideal = (
        lab.filter(F.col("__rel") > 0)
        .withColumn("__irank", F.row_number().over(wideal).cast("double"))
        .filter(F.col("__irank") <= k)
        .groupBy("__lq")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("__rel")) - 1.0)
                / F.log2(F.col("__irank") + 1.0)
            ).alias("__idcg")
        )
    )
    out = per_q.join(ideal, F.col("__q") == F.col("__lq"), "left")
    ndcg = F.coalesce(
        F.col("__dcg") / F.nullif(F.col("__idcg"), F.lit(0.0)), F.lit(0.0)
    )
    return out.select(
        F.col("__q").alias(query_col),
        "n_ranked",
        F.round("__prec", ndigits).alias("precision_at_k"),
        F.round("__mrr", ndigits).alias("mrr"),
        F.round(ndcg, ndigits).alias("ndcg"),
    )
