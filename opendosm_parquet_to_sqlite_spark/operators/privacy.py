"""PII detection and redaction — the compliance pass every training-data
pipeline runs before anything ships (emails / phone numbers / IP addresses
are the canonical scrub targets, cf. C4 and refinedweb-style cleaning).

All matching is native `regexp_count` / `regexp_replace` Column expressions
(JVM regex, codegen'd) — zero Python in the path, zero shuffle: a pure
narrow map that streams 100 TB at scan speed. Patterns deliberately use
explicit character classes (no \\d, no \\b) so Java regex (Spark) and RE2
(DuckDB oracle) interpret them identically.

Redaction placeholders are greppable tags; counts ride along so downstream
can route "heavy-PII" documents to quarantine instead of keeping the
scrubbed husk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: emails are redacted before phones so the digits inside a
# local-part are not half-eaten by the phone pattern first.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
        "<EMAIL>",
    ),
    "phone": (
        r"\+?[0-9][0-9]{1,2}-[0-9]{3,4}-[0-9]{4}",
        "<PHONE>",
    ),
    "ipv4": (
        r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
        "<IP>",
    ),
}


def pii_count(col: Column | str, kind: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    pattern, _ = PII_PATTERNS[kind]
    return F.regexp_count(c, F.lit(pattern))


def redact_pii(col: Column | str) -> Column:
    """All PII patterns replaced by their tags, applied in declaration
    order (email → phone → ipv4)."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, tag in PII_PATTERNS.values():
        c = F.regexp_replace(c, pattern, tag)
    return c


def pii_profile(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, pii_total, clean_fp) — match
    counts per kind plus the md5 fingerprint of the redacted text (the
    fingerprint, not the full scrubbed body, is what audit tables store).
    Narrow projection; no shuffle."""
    c = F.col(text_col)
    counts = {k: pii_count(c, k) for k in PII_PATTERNS}
    return df.select(
        F.col(id_col).alias("doc_id"),
        counts["email"].cast("long").alias("n_emails"),
        counts["phone"].cast("long").alias("n_phones"),
        counts["ipv4"].cast("long").alias("n_ips"),
        sum(counts.values(), F.lit(0)).cast("long").alias("pii_total"),
        F.md5(redact_pii(c)).alias("clean_fp"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Re-identification risk audit: every quasi-identifier equivalence
    class smaller than `k` — the k-anonymity criterion [Sweeney 2002].
    A class of size 1 is a unique fingerprint; size < k means an
    attacker who knows the quasi-identifiers narrows a person to < k
    candidates. The release-gate complement of the redaction pass above:
    redact_pii scrubs DIRECT identifiers, this audits INDIRECT ones.

    Output: one row per risky class — quasi columns + `class_size`
    (+ `n_sensitive_values` when `sensitive_col` is given: a risky class
    with ONE sensitive value also fails l-diversity, the stronger leak —
    every candidate shares the secret, so narrowing to <k is already
    full disclosure).

    Shape: ONE partial-combined aggregation keyed by the quasi columns +
    a narrow HAVING filter. The (usually tiny) risky-class table is what
    reaches the caller; the corpus never re-shuffles. Fully
    SQL-expressible, hash-checked vs DuckDB (plans.queries).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive_values")
        )
    return (
        df.groupBy(*quasi_cols)
        .agg(*aggs)
        .filter(F.col("class_size") < k)
    )
