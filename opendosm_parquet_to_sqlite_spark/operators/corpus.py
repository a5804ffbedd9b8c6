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

from ..caching import persist_tracked
from . import contamination, dedup, graph, neardup, privacy, sampling, text


def clean_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_quality: float = 0.5,
    ngram_n: int = 3,
    jaccard_threshold: float = 0.3,
    max_doc_freq: int | None = 50,
    cluster: bool = False,
    checkpoint_dir: str | None = None,
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

    checkpoint_dir (cluster=True only) is forwarded to
    graph.connected_components: set it on a real cluster so per-round
    lineage truncation uses fault-tolerant checkpoint files instead of
    executor-memory localCheckpoint blocks.
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
        comp = graph.connected_components(
            pairs, "id_a", "id_b", checkpoint_dir=checkpoint_dir
        )
        losers = comp.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias(id_col)
        )
    else:
        # ngram_jaccard_pairs emits id_a < id_b, so dropping every id_b
        # keeps the minimum id of each similar pair
        losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return exact_kept.join(losers, id_col, "left_anti")


def corpus_report(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """The dataset card: corpus-level statistics as (stat, value) rows —
    the one-pass summary every training-data release ships with.

      n_docs, total_tokens, avg_tokens, total_chars, avg_quality,
      share_quality_ge_05, pii_doc_share, exact_dup_share

    One aggregation over a narrow per-doc projection (counts, quality,
    PII hits, content digest): a single partial-agg exchange carrying one
    accumulator row per mapper — corpus-size-independent shuffle. Exact
    dup share uses count(DISTINCT digest), the one sub-aggregate that
    re-shuffles digests; swap for approx_count_distinct at the trillion-
    doc scale if 2% error is acceptable.
    """
    c = F.col(text_col)
    per = df.select(
        text.token_count(c).alias("__tok"),
        text.char_count(c).alias("__chr"),
        text.quality_score(c).alias("__q"),
        sum(
            (privacy.pii_count(c, k) for k in privacy.PII_PATTERNS),
            F.lit(0),
        ).alias("__pii"),
        F.md5(c).alias("__fp"),
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tok").alias("total_tokens"),
        F.avg("__tok").alias("avg_tokens"),
        F.sum("__chr").alias("total_chars"),
        F.avg("__q").alias("avg_quality"),
        F.avg((F.col("__q") >= 0.5).cast("double")).alias(
            "share_quality_ge_05"
        ),
        F.avg((F.col("__pii") > 0).cast("double")).alias("pii_doc_share"),
        (
            F.lit(1.0)
            - F.count_distinct("__fp") / F.count(F.lit(1))
        ).alias("exact_dup_share"),
    )
    stats = [
        "n_docs", "total_tokens", "avg_tokens", "total_chars",
        "avg_quality", "share_quality_ge_05", "pii_doc_share",
        "exact_dup_share",
    ]
    long = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("stat"),
                    F.round(F.col(s).cast("double"), 6).alias("value"),
                )
                for s in stats
            ]
        )
    ).alias("kv")
    return agg.select(long).select("kv.stat", "kv.value")


def ingest_increment(
    new_docs: DataFrame,
    index_bands: DataFrame,
    index_sets: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Near-dup dedup for a NEW batch against an already-ingested corpus —
    the incremental shape of clean_corpus's sweep: probe the persisted
    MinHash index (O(batch + collisions), the corpus text is never
    rescanned), dedup within the batch, and emit the batch's own index
    rows for appending.

    Returns (survivors, new_band_rows, new_shingle_sets). The index rows
    cover ALL gated new docs (survivors AND dropped) — indexing only
    survivors would diverge from batch semantics on chains: greedy min-id
    drops a doc that matches ANY earlier doc, not just earlier survivors.
    With ids assigned monotonically across batches (required — greedy
    survivorship is id-ordered), processing batches incrementally yields
    EXACTLY the survivors of one batch run over the whole corpus
    (test-pinned in tests/test_mixing.py), because band collisions and
    exact verification are deterministic functions of the text.
    """
    vs_corpus = neardup.probe_neardup_index(
        new_docs, index_bands, index_sets, text_col, id_col,
        n=n, num_hashes=num_hashes, bands=bands, threshold=threshold,
    )
    within = neardup.minhash_lsh_pairs(
        new_docs, text_col, id_col,
        n=n, num_hashes=num_hashes, bands=bands, threshold=threshold,
    )
    losers = (
        vs_corpus.select(F.col("new_id").alias(id_col))
        .unionByName(within.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    survivors = new_docs.join(losers, id_col, "left_anti")
    new_bands, new_sets = neardup.build_neardup_index(
        new_docs, text_col, id_col, n=n, num_hashes=num_hashes, bands=bands
    )
    return survivors, new_bands, new_sets


def prepare_training_data(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.1,
    min_quality: float = 0.5,
    ngram_n: int = 3,
    jaccard_threshold: float = 0.3,
    max_doc_freq: int | None = 50,
    contamination_n: int = 5,
    budget: int = 64,
    block_size: int = 4096,
    remove_spans: bool = False,
    span_min_len: int = 8,
    span_within_doc: bool = False,
) -> DataFrame:
    """The WHOLE corpus→training-sequences flow, one lazy plan:

    1. PII scrub      — every later stage sees the redacted text
    2. gates          — quality score ≥ min_quality AND the Gopher-style
                        repetition gate (operators.text)
    3. exact dedup    — min-id survivor per content digest
    4. near-dup sweep — capped n-gram Jaccard, greedy min-id survivor
    4b. span removal  — OPT-IN (`remove_spans=True`): excise each
                        surviving pair's longest cross-doc repeated span
                        (≥ span_min_len tokens) from the higher-id member
                        (neardup.remove_repeated_spans — the Lee et al.
                        substring-dedup transform), so decontamination
                        and packing see span-cleaned text and token
                        budgets; `span_within_doc=True` additionally
                        excises INTERNAL repeats (keep-first inside each
                        doc — the complete Lee et al. treatment). Off by
                        default: the registered oracle pins the 7-stage
                        composition; the flag-on paths are pinned by
                        pytest (tests/test_corpus.py,
                        tests/test_span_dedup.py).
    5. decontaminate  — drop docs sharing any contamination_n-gram with
                        the benchmark set (raw benchmark text)
    6. mix & split    — deterministic stratified sampling by `strata_col`
                        + hash-band train/val/test assignment
    7. pack           — greedy block-local sequences of ≤ budget tokens,
                        keyed on (stratum, split) so sequences never mix
                        rows across the train/val boundary

    Output: (doc_id, <strata_col>, split, block, seq_in_block, n_tokens,
    cum_tokens). Fully deterministic — survivors, splits, and sequence
    ids are pure functions of the data, independent of partitioning —
    and, like corpus_clean, SQL-expressible end to end so the COMPOSITION
    is oracle-verified, not just its stages (plans.queries:
    prepare_training_data).

    Scale: narrow maps (1, 2-quality, 5-filter, 6), digest/gram-keyed
    partial-agg shuffles (2-repetition, 3, 4), a broadcast semi-join (5),
    and O(block) windows (7). Nothing touches the driver.
    """
    # The scrub → quality → repetition chain is regex/gram-heavy narrow
    # work running BEFORE any exchange — on a small/few-file source Spark
    # would pin it to one core (see text.spread_small_input; no-op at
    # cluster scale where the scan already parallelizes).
    red = text.spread_small_input(df).withColumn(
        text_col, privacy.redact_pii(F.col(text_col))
    )
    rep_ok = (
        text.repetition_profile(red, text_col, id_col)
        .filter(F.col("repetition_ok") == 1)
        .select(F.col("doc_id").alias(id_col))
    )
    gated = red.filter(
        text.quality_score(F.col(text_col)) >= min_quality
    ).join(rep_ok, id_col, "leftsemi")
    # The scrub→gate chain feeds the near-dup index AND the survivor
    # anti-join; the survivor set feeds decontamination (twice — gram side
    # and zero-fill side) and the mix/pack tail. Without these two cuts the
    # regex scrub + repetition aggregation re-execute ~5× (measured 20 s →
    # 6 s at sf0.1). MEMORY_AND_DISK, released via caching.release_cached()
    # — at cluster scale substitute a parquet checkpoint if the corpus
    # outgrows the cache tier.
    # NOTE (round-14 opt, both measured SLOWER and reverted): (a) also
    # persisting the scrubbed `red` frame — 6.9 -> 9.4 s median
    # (columnar cache build of full text rows costs more than the 2-3
    # concurrent duplicate scrub stages it removes); (b) eager-
    # materializing exact_kept/survivors with count() to stop the
    # concurrent duplicate computation of racing cache legs — 6.9 ->
    # 7.4 s (the duplicates overlap on idle cores; serializing them is
    # a net loss at this scale). The profile's duplicate stages are the
    # cheaper side of both trades; leave the persists lazy.
    exact_kept = persist_tracked(
        dedup.exact_dedup_keep_first(gated, text_col, id_col)
    )
    pairs = neardup.ngram_jaccard_pairs(
        exact_kept,
        text_col,
        id_col,
        n=ngram_n,
        threshold=jaccard_threshold,
        max_doc_freq=max_doc_freq,
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    survivors = persist_tracked(exact_kept.join(losers, id_col, "left_anti"))
    if remove_spans:
        # stage 4b: span-level cut across the near-dup SURVIVORS (whole-doc
        # near-dups are already gone; what remains is copied passages
        # inside otherwise-distinct docs). One doc-keyed join re-attaches
        # the cleaned text to the survivor row's other columns.
        cut = neardup.remove_repeated_spans(
            survivors, text_col, id_col, min_len=span_min_len,
            within_doc=span_within_doc,
        )
        survivors = persist_tracked(
            survivors.drop(text_col).join(
                cut.select(
                    F.col("doc_id").alias(id_col), text_col
                ),
                id_col,
            )
        )
    flagged = contamination.ngram_overlap(
        survivors, benchmark, text_col, id_col, n=contamination_n
    )
    dirty = flagged.filter(F.col("contaminated") == 1).select(
        F.col("doc_id").alias(id_col)
    )
    clean = survivors.join(dirty, id_col, "left_anti")
    sampled = sampling.stratified_sample(
        clean, strata_col, id_col, rates, default_rate
    )
    split = sampling.split_assign(sampled, id_col)
    return sampling.pack_sequences(
        split,
        id_col,
        text.token_count(F.col(text_col)),
        budget=budget,
        strata_col=[strata_col, "split"],
        block_size=block_size,
    )


def quality_audit(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_quality: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    allowed_langs: list[str] | None = None,
) -> DataFrame:
    """Per-document gate AUDIT: every curation signal plus per-gate
    verdicts and a deterministic reject-reason string — the "why was this
    document dropped" table a pipeline owner reads before trusting a
    filter sweep (corpus_clean tells you WHAT survived; this tells you
    WHY the rest did not).

    Gates audited (each an independent boolean column):
      quality_ok    — composite heuristic ≥ min_quality
      length_ok     — min_tokens ≤ n_tokens ≤ max_tokens
      repetition_ok — Gopher repetition thresholds (repetition_profile)
      lang_ok       — stopword-marker language in allowed_langs
                      (every doc passes when allowed_langs is None)

    `keep` = AND of the four; `reject_reasons` = comma-joined sorted
    failing gate names ('' when kept) — string, not array, so the DuckDB
    oracle compares it byte-identically.

    Shape: quality/lang/length are one narrow projection; repetition is
    the two gram-keyed partial aggs of repetition_profile; the single
    doc-keyed join marries them. The corpus text itself never shuffles —
    only gram counts and the narrow per-doc signal row.
    """
    rep = text.repetition_profile(df, text_col, id_col).select(
        "doc_id", "n_tokens", "distinct_ratio", "top_token_frac",
        "top_bigram_frac", "repetition_ok",
    )
    c = F.col(text_col)
    narrow = df.select(
        F.col(id_col).alias("doc_id"),
        text.quality_score(c).alias("quality"),
        text.lang_id(c).alias("lang_pred"),
    )
    j = narrow.join(rep, "doc_id")
    quality_ok = F.col("quality") >= F.lit(float(min_quality))
    length_ok = (F.col("n_tokens") >= F.lit(int(min_tokens))) & (
        F.col("n_tokens") <= F.lit(int(max_tokens))
    )
    repetition_ok = F.col("repetition_ok") == 1
    if allowed_langs is None:
        lang_ok = F.lit(True)
    else:
        lang_ok = F.col("lang_pred").isin(list(allowed_langs))
    reasons = F.concat_ws(
        ",",
        F.array_compact(
            F.array(
                # alphabetical gate order => deterministic string
                F.when(~lang_ok, F.lit("lang")),
                F.when(~length_ok, F.lit("length")),
                F.when(~quality_ok, F.lit("quality")),
                F.when(~repetition_ok, F.lit("repetition")),
            )
        ),
    )
    return j.select(
        "doc_id", "quality", "lang_pred", "n_tokens", "distinct_ratio",
        "top_token_frac", "top_bigram_frac",
        quality_ok.alias("quality_ok"),
        length_ok.alias("length_ok"),
        repetition_ok.alias("repetition_ok2"),
        lang_ok.alias("lang_ok"),
        (quality_ok & length_ok & repetition_ok & lang_ok).alias("keep"),
        reasons.alias("reject_reasons"),
    ).withColumnRenamed("repetition_ok2", "repetition_ok")


def leakage_free_split(
    df: DataFrame,
    text_col: str,
    id_col: str,
    splits: list[tuple[str, float]] | None = None,
    namespace: str = "split",
    ngram_n: int = 3,
    jaccard_threshold: float = 0.3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Train/val/test assignment that can never leak a near-duplicate of a
    held-out document into train: the split is decided by the hash of each
    document's near-dup CLUSTER representative, not of the document itself.

    A plain hash split (sampling.split_assign) treats two 95%-identical
    documents as independent coin flips — with probability ~2·p·(1-p) they
    straddle train/test, and the eval set silently overlaps the training
    set. Here every document maps to its connected-component representative
    (minimum member id over the capped n-gram-Jaccard pair graph,
    operators.graph union-find); documents in no pair are their own
    representative. Hashing the representative makes the split constant
    within each cluster by construction.

    Output: (doc_id, rep_id, split). Deterministic: a pure function of
    (namespace, cluster structure) — adding unrelated documents never
    reassigns existing ones (the reference's stable-rebuild property,
    src/main.rs:252-278, lifted to split assignment).

    Shape: the pair graph is the capped inverted index
    (neardup.ngram_jaccard_pairs — two gram-keyed exchanges); components
    converge in O(log diameter) label rounds over PAIR-sized frames; the
    final mapping is one doc-keyed LEFT join (cluster table is
    pair-graph-sized, far smaller than the corpus, and broadcastable when
    it fits) plus a narrow md5-band projection. The corpus text never
    shuffles and nothing touches the driver.
    """
    pairs = neardup.ngram_jaccard_pairs(
        df, text_col, id_col,
        n=ngram_n, threshold=jaccard_threshold, max_doc_freq=max_doc_freq,
    )
    comps = graph.connected_components(pairs, "id_a", "id_b")
    rep = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(comps, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("rep_id"),
        )
    )
    return sampling.split_assign(rep, "rep_id", splits, namespace).select(
        "doc_id", "rep_id", "split"
    )


def release_gate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 100,
    max_null_rate: float = 0.01,
    max_dup_rate: float = 0.2,
    max_low_quality_rate: float = 0.5,
    max_pii_rate: float = 0.05,
) -> DataFrame:
    """The ship/no-ship checklist for a corpus release, as ONE
    aggregation pass: five checks, each a row (check, value, threshold,
    pass) — the composition a pipeline owner actually gates a publish
    on, built from the same signals the individual operators report
    (quality_audit says WHY a doc fails; this says whether the DATASET
    may ship).

      volume            n_docs >= min_docs
      null_text_rate    NULL/blank docs / all docs       <= max
      dup_rate          1 - distinct digests / non-null  <= max
      low_quality_rate  quality < 0.5 share              <= max
                        (NULL-text docs land in null_text_rate, not
                        here — the CASE treats NULL quality as pass)
      pii_rate          docs with any email/phone/IP     <= max

    Shape: one narrow projection (quality + PII counts + digest) → ONE
    partial-combined aggregation (the distinct-digest term adds the
    usual expand) → a 5-row explode. The corpus is scanned once;
    nothing doc-scale shuffles except the 16-byte digest distinct.
    Fully SQL-expressible → hash-checked vs DuckDB.
    """
    c = F.col(text_col)
    base = df.select(
        c.alias("__t"),
        text.quality_score(c).alias("__q"),
        (
            privacy.pii_count(c, "email")
            + privacy.pii_count(c, "phone")
            + privacy.pii_count(c, "ipv4")
        ).alias("__pii"),
        F.md5(c).alias("__d"),
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.round(
            F.avg(
                F.when(
                    F.col("__t").isNull() | (F.trim(F.col("__t")) == ""),
                    1.0,
                ).otherwise(0.0)
            ),
            6,
        ).alias("null_rate"),
        F.round(
            1
            - F.countDistinct(F.col("__d"))
            / F.greatest(F.count(F.col("__d")), F.lit(1)),
            6,
        ).alias("dup_rate"),
        F.round(
            F.avg(F.when(F.col("__q") < 0.5, 1.0).otherwise(0.0)), 6
        ).alias("lowq_rate"),
        F.round(
            F.avg(F.when(F.col("__pii") > 0, 1.0).otherwise(0.0)), 6
        ).alias("pii_rate"),
    )
    checks = F.array(
        F.struct(
            F.lit("volume").alias("check"),
            F.col("n_docs").alias("value"),
            F.lit(float(min_docs)).alias("threshold"),
            (F.col("n_docs") >= min_docs).alias("pass"),
        ),
        F.struct(
            F.lit("null_text_rate").alias("check"),
            F.col("null_rate").alias("value"),
            F.lit(float(max_null_rate)).alias("threshold"),
            (F.col("null_rate") <= max_null_rate).alias("pass"),
        ),
        F.struct(
            F.lit("dup_rate").alias("check"),
            F.col("dup_rate").alias("value"),
            F.lit(float(max_dup_rate)).alias("threshold"),
            (F.col("dup_rate") <= max_dup_rate).alias("pass"),
        ),
        F.struct(
            F.lit("low_quality_rate").alias("check"),
            F.col("lowq_rate").alias("value"),
            F.lit(float(max_low_quality_rate)).alias("threshold"),
            (F.col("lowq_rate") <= max_low_quality_rate).alias("pass"),
        ),
        F.struct(
            F.lit("pii_rate").alias("check"),
            F.col("pii_rate").alias("value"),
            F.lit(float(max_pii_rate)).alias("threshold"),
            (F.col("pii_rate") <= max_pii_rate).alias("pass"),
        ),
    )
    return agg.select(F.explode(checks).alias("c")).select(
        "c.check", "c.value", "c.threshold", "c.pass"
    )


def quality_percentile_gate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    keep_frac: float = 0.5,
) -> DataFrame:
    """Per-group percentile quality gate (the FineWeb/CCNet per-dump
    recipe): keep the top `keep_frac` share of documents WITHIN each
    group (source, dump, domain) by composite quality score — an
    absolute threshold (corpus_clean's gate) systematically starves
    groups whose score distribution sits lower, while a per-group
    percentile keeps the mixture's group proportions while still
    dropping each group's worst tail.

    Threshold semantics are ORDER-STATISTIC, not interpolated: the
    per-group threshold is the largest score t such that at least
    ceil(keep_frac · n_group) documents score >= t, and every document
    with score >= t is kept (ties at the threshold all survive, so the
    kept share can exceed keep_frac by the tie mass — deterministic and
    engine-portable, where an interpolated quantile would hang the gate
    on cross-engine float rounding). NULL scores (NULL text) are
    excluded from n_group and never survive; NULL group keys form their
    own group (null-safe join).

    Shape: one narrow score projection → ONE partial-combined
    (group, score) count agg — bounded: scores are quantized to 6
    decimals, so the table is at most groups × 1e6 rows and in practice
    tiny — → cumulative window + threshold agg over that SCORE TABLE
    (never the corpus) → broadcast threshold join back → filter. The
    corpus text never shuffles; the only corpus-wide pass is the scan.
    """
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(
            f"keep_frac must be in (0, 1], got {keep_frac}"
        )
    from pyspark.sql.window import Window as W

    scored = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        text.quality_score(F.col(text_col)).alias("quality"),
    )
    tab = scored.groupBy("grp", "quality").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w_cum = (
        W.partitionBy("grp")
        .orderBy(F.col("quality").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("grp")
    cum = tab.select(
        "grp",
        "quality",
        F.sum("__c").over(w_cum).alias("__cum"),
        F.sum("__c").over(w_all).alias("__n"),
    )
    thr = (
        cum.filter(
            F.col("__cum")
            >= F.ceil(F.lit(float(keep_frac)) * F.col("__n"))
        )
        .groupBy("grp")
        .agg(F.max("quality").alias("threshold"))
        # break the self-join lineage (thr derives from scored)
        .withColumnRenamed("grp", "__thr_grp")
    )
    return (
        scored.join(
            F.broadcast(thr),
            F.col("grp").eqNullSafe(F.col("__thr_grp")),
        )
        .filter(F.col("quality") >= F.col("threshold"))
        .select("doc_id", "grp", "quality", "threshold")
    )


def commonness_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style head/middle/tail corpus bucketing (Wenzek et al.
    2020 split CommonCrawl into perplexity terciles and kept
    head+middle). The ranking statistic here is the integer-exact
    MEAN TOKEN FREQUENCY — each document's average corpus-wide term
    count, a monotone-inverse proxy for unigram perplexity (documents
    of common words rank "head", rare-token documents rank "tail") —
    chosen over the ln-based unigram_logprob score because it is a pure
    ratio of exact integers: bit-identical on every engine, so the
    whole op is hash-checkable cross-engine (ln differs in the last
    ulps between libms, and a bucket BOUNDARY must not hang on float
    rounding). The true-LM scorer remains text.unigram_logprob_score;
    this is the bucketing rung.

    Output: one row per bucket (1 = head .. n_buckets = tail):
    (bucket, n_docs, min_mean_tf, max_mean_tf, avg_tokens). Documents
    with no tokens (NULL/empty text) carry no terms and are excluded —
    CCNet drops empty documents before scoring too.

    Bucket assignment is ORDER-STATISTIC over the QUANTIZED score
    table, not a global ntile: scores round to 6 decimals, the
    (score, count) table is aggregated (bounded: at most 1e6 x score
    range rows, in practice tiny), a cumulative window over that table
    computes each score's first rank (exclusive cumulative), and
    bucket = (first_rank * K) DIV n + 1 in INTEGER arithmetic — ties
    share a score, hence a rank, hence a bucket (deterministic, no
    doc-id tiebreak needed, engine-portable; a tie group takes its
    BEST member's bucket, the head-biased convention).

    Scale shape: one corpus term explode -> vocabulary-sized tf agg
    (broadcast back, the unigram_logprob_score gate: at web scale
    prune to top-k vocab first) -> ONE partial-combined per-doc agg ->
    per-SCORE rollup (doc-count -> distinct-score-sized) -> window +
    bucket math over the score table only -> K-row final agg. The
    corpus never globally sorts; no doc-level window anywhere.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from pyspark.sql.window import Window as W

    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform(text.tokens(F.col(text_col)), F.lower)).alias(
            "term"
        ),
    )
    vocab = terms.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    docs = (
        terms.join(F.broadcast(vocab), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("tf").alias("sum_tf"),
        )
        .select(
            "n_tokens",
            F.round(
                F.col("sum_tf").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("q"),
        )
    )
    # distinct-score rollup: everything after this is score-table-sized
    tab = docs.groupBy("q").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("n_tokens").alias("tok"),
    )
    w_cum = (
        W.orderBy(F.col("q").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = tab.select(
        "q",
        "c",
        "tok",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(W.partitionBy()).alias("n"),
    )
    k = F.lit(int(n_buckets)).cast("long")
    # first rank of this score group (0-based) = inclusive cum - count
    first = (F.col("cum") - F.col("c")) * k
    bucket = ((first - first % F.col("n")) / F.col("n")).cast("int") + 1
    return (
        ranked.select(bucket.alias("bucket"), "q", "c", "tok")
        .groupBy("bucket")
        .agg(
            F.sum("c").alias("n_docs"),
            F.round(F.min("q"), 6).alias("min_mean_tf"),
            F.round(F.max("q"), 6).alias("max_mean_tf"),
            F.round(
                F.sum("tok").cast("double")
                / F.sum("c").cast("double"),
                4,
            ).alias("avg_tokens"),
        )
        .orderBy("bucket")
    )
