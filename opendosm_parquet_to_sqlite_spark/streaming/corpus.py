"""Streaming corpus ingest — the data-mixing layer under Structured
Streaming.

The scrub / gate / sample / split stages are all NARROW maps (no state, no
watermark, no shuffle), so the same operator expressions run unchanged on
a stream: documents arriving continuously are scrubbed, gated, and
deterministically routed to train/val/test exactly as a batch backfill
would route them — the hash-band sampling (operators.sampling) guarantees
a doc ingested tomorrow lands where it would have landed today, which is
what makes live ingest and backfill interchangeable.

Deliberately NOT here: dedup and decontamination. Those need corpus-wide
state; their streaming shape is the persisted-index probe pattern
(neardup.build_neardup_index → probe_neardup_index per microbatch via
foreachBatch, appending new signatures), not an unbounded stateful
aggregation. repetition gating streams via the row-wise variant below —
the batch aggregation formulation would keep one state row per doc_id
forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import privacy, sampling, text


def rowwise_repetition_ok(
    toks,
    max_top_token_frac: float = 0.2,
    min_distinct_ratio: float = 0.5,
):
    """Streaming-compatible repetition gate as a pure row expression over a
    token array: distinct-token ratio + top-token mass, no aggregation
    across rows (state-free; usable in any narrow map). The batch
    repetition_profile keeps the exploded-aggregate formulation (plus the
    bigram metric, which this row form omits).

    Top-token mass = the longest run in the SORTED array, computed with a
    single `aggregate` fold whose lambda touches only the accumulator and
    the element — O(n log n) per row, and immune to the CollapseProject/
    HOF trap (a lambda that re-referenced `toks` would re-evaluate the
    inlined tokenizer per ELEMENT — see text.gram_join)."""
    n = F.size(toks)
    run_state = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        new_run = (
            F.when(acc.prev.isNotNull() & (acc.prev == x), acc.run + 1)
            .otherwise(F.lit(1))
        )
        return F.struct(
            x.alias("prev"),
            new_run.alias("run"),
            F.greatest(acc.best, new_run).alias("best"),
        )

    top = F.aggregate(
        F.array_sort(toks), run_state, step, lambda acc: acc.best
    )
    return (
        (n > 0)
        & (F.round(F.size(F.array_distinct(toks)) / n, 6) >= min_distinct_ratio)
        & (F.round(top / n, 6) <= max_top_token_frac)
    )


def corpus_ingest_stream(
    sdf: DataFrame,
    text_col: str,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.1,
    min_quality: float = 0.5,
) -> DataFrame:
    """Scrub → quality + repetition gate → stratified sample → split, as
    one stateless streaming projection (append mode, no watermark needed).
    Emits the surviving documents with `split` and `n_tokens` columns."""
    red = sdf.withColumn(text_col, privacy.redact_pii(F.col(text_col)))
    toked = red.withColumn("__toks", text.tokens(F.col(text_col)))
    gated = toked.filter(
        (text.quality_score(F.col(text_col)) >= min_quality)
        & rowwise_repetition_ok(F.col("__toks"))
    )
    sampled = sampling.stratified_sample(
        gated, strata_col, id_col, rates, default_rate
    )
    return (
        sampling.split_assign(sampled, id_col)
        .withColumn("n_tokens", F.size("__toks").cast("long"))
        .drop("__toks")
    )
