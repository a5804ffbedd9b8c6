"""Text-analysis operators for training-data pipelines (north-star M5).

All hot-path logic is native Column expressions (JVM, codegen) — no Python
UDFs: tokenization via split, ratios via regexp counts, fingerprints via md5.
Every function is deterministic and mirrors 1:1 to ANSI SQL for the DuckDB
oracle.

Scale: each operator is a narrow map over the corpus — no shuffle at all
until an aggregation/grouping consumes the derived columns. 100 TB of text
streams through whole-stage codegen at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword marker sets per language for the n-gram/stopword
# language-ID heuristic. Chosen to be expressible identically in SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
    "de": ["der", "und", "die"],
}

EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization. split on \\s+ after trim; '' → empty array."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count (BPE-ish proxy: see bpe_token_estimate)."""
    return F.size(tokens(col))


def bpe_token_estimate(col: Column | str) -> Column:
    """Cheap BPE-token-count estimate: word-ish chunks + punctuation runs.

    Counts regex matches of word/number/punct units — the standard
    pre-tokenizer shape — without a real merges table (not available here).
    """
    c = F.col(col) if isinstance(col, str) else col
    # count of alnum runs + count of non-space-non-alnum chars
    alnum_runs = F.size(
        F.filter(F.split(c, r"[^A-Za-z0-9]+"), lambda x: x != "")
    )
    punct_chars = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return (alnum_runs + punct_chars).alias("bpe_tokens")


def char_count(col: Column | str) -> Column:
    return F.length(col)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/whitespace."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.round(n_punct / F.greatest(F.length(c), F.lit(1)), 6)


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (lowercased) common English stopwords."""
    toks = tokens(col)
    sw = F.array(*[F.lit(s) for s in (stopwords or EN_STOPWORDS)])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return F.round(n_sw / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score(col: Column | str) -> Column:
    """Composite doc-quality heuristic in [0,1]: favors mid-length docs with
    low punctuation noise and a sane stopword rate. Deterministic arithmetic
    only, so the oracle reproduces it exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    length_component = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    punct_component = F.lit(1.0) - F.least(punct_ratio(c) * 4, F.lit(1.0))
    sw = stopword_ratio(c)
    sw_component = F.lit(1.0) - F.least(F.abs(sw - F.lit(0.4)), F.lit(1.0))
    return F.round(
        (length_component + punct_component + sw_component) / 3.0, 6
    )


def lang_id(col: Column | str) -> Column:
    """Stopword-marker language ID: score = # marker hits per language,
    winner = highest score (ties broken by fixed language order), 'und' if
    zero hits everywhere. Pure CASE/array arithmetic → SQL-mirrorable.
    """
    toks_lower = F.transform(tokens(col), F.lower)

    def marker_hits(markers: list[str]) -> Column:
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(toks_lower, lambda t: F.array_contains(arr, t)))

    scores = {lang: marker_hits(markers) for lang, markers in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[lg] for lg in langs])
    out = F.lit("und")
    # fixed priority order: first language reaching the max wins
    for lg in reversed(langs):
        out = F.when(scores[lg] == best, F.lit(lg)).otherwise(out)
    return F.when(best == 0, F.lit("und")).otherwise(out)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 over the normalized token stream
    (lowercase, collapsed whitespace) — whitespace-insensitive identity,
    the cheap/portable stand-in for a rolling Rabin hash."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.array_join(F.transform(tokens(c), F.lower), " ")
    return F.md5(normalized)


def term_stats(
    df: DataFrame, text_col: str, id_col: str, min_term_freq: int = 1
) -> DataFrame:
    """Corpus vocabulary statistics: (term, term_freq, doc_freq) for
    lowercased whitespace tokens — the tokenizer-training / stopword-mining
    pre-pass. One explode + one hash aggregate; doc_freq via
    count(DISTINCT id) per term. min_term_freq prunes the long tail
    DETERMINISTICALLY (a top-k cut would tie-break arbitrarily)."""
    terms = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("term"),
    )
    out = terms.groupBy("term").agg(
        F.count(F.lit(1)).alias("term_freq"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    return out.filter(F.col("term_freq") >= min_term_freq)


def text_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-pass per-document profile: all metrics as a narrow projection."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        char_count(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        bpe_token_estimate(c).alias("bpe_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        quality_score(c).alias("quality"),
        lang_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
