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


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
    ndigits: int = 6,
) -> DataFrame:
    """Entropy l-diversity audit [Machanavajjhala et al. 2007] — the
    criterion k-anonymity misses: a class of 50 people all sharing one
    diagnosis is perfectly k-anonymous and a total disclosure.  Reports
    every quasi-identifier equivalence class failing EITHER bar:

        distinct l-diversity:  #distinct sensitive values < l
        entropy  l-diversity:  −Σ p·ln p < ln(l)

    The entropy bar is the stronger one (it catches classes where one
    value dominates even though l distinct values technically appear —
    the "49 flu + 1 cancer" class passes distinct-l and still leaks).
    NULL sensitive values are excluded from the distribution (an absent
    secret is not a disclosure); classes with ONLY NULL sensitive values
    report zero diversity and fail.

    Output: quasi cols + (class_size, n_sensitive BIGINT, entropy,
    min_entropy = ln(l) threshold) for failing classes only.

    Shape: ONE partial-combined agg to the (quasi × sensitive) cell
    table, then a class-level agg computing both bars from the cells —
    the corpus shuffles once; everything after is cell-table-sized.
    Fully SQL-expressible → hash-checked vs DuckDB.
    """
    import math

    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    cells = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    from pyspark.sql.window import Window as W

    wq = W.partitionBy(*quasi_cols)
    # NULL-sensitive cells stay in the frame (so an all-NULL class still
    # emits a failing row) but contribute nothing to the distribution
    is_sens = F.col(sensitive_col).isNotNull()
    sens_sum = F.sum(F.when(is_sens, F.col("__c")).otherwise(0.0)).over(wq)
    withp = cells.withColumn(
        "__p",
        F.when(is_sens, F.col("__c") / F.nullif(sens_sum, F.lit(0.0))),
    ).withColumn("__is_sens", is_sens)
    klass = withp.groupBy(*quasi_cols).agg(
        # class_size is the TRUE equivalence-class row count (all cells,
        # NULL-sensitive included) so it correlates 1:1 with
        # k_anonymity_report's class_size; the non-NULL total consumers
        # previously got here is kept as n_sensitive_rows
        F.sum(F.col("__c")).cast("long").alias("class_size"),
        F.sum(F.when(F.col("__is_sens"), F.col("__c")).otherwise(0.0))
        .cast("long")
        .alias("n_sensitive_rows"),
        F.sum(F.col("__is_sens").cast("int")).cast("long").alias(
            "n_sensitive"
        ),
        # entropy as sum(p*ln(1/p)), NOT -sum(p*ln p): the negated form
        # turns a zero-entropy class into -0.0 (and engines disagree on
        # printing the sign; additive/CASE canonicalizations get
        # optimizer-folded away — observed in DuckDB). ln(1/1) is +0.0,
        # so this form never produces a signed zero on either engine.
        # All-NULL classes have no p values at all -> coalesce to 0.0.
        F.coalesce(
            F.round(
                F.sum(F.col("__p") * F.log(1.0 / F.col("__p"))), ndigits
            ),
            F.lit(0.0),
        ).alias("entropy"),
    )
    bar = round(math.log(l), ndigits)
    return klass.filter(
        (F.col("n_sensitive") < l) | (F.col("entropy") < bar)
    ).withColumn("min_entropy", F.lit(bar))


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    namespace: str = "dp",
    ndigits: int = 6,
) -> DataFrame:
    """Laplace-mechanism noisy group counts — the ε-differential-privacy
    release shape for a counting query (sensitivity 1 → noise scale
    b = 1/ε), with the noise drawn by a KEYED PRF instead of an RNG:

        u     = md5(namespace:groupkey) mapped to (−½, ½)
        noise = −(1/ε) · sign(u) · ln(1 − 2|u|)      (inverse-CDF Laplace)

    Deterministic-by-design: reruns, repartitions, and engine mirrors
    produce the SAME noisy release, so a pipeline re-execution does not
    silently spend privacy budget on a fresh draw of the same statistic
    (the accidental-recomputation leak).  The flip side is documented
    honestly: RELEASING MULTIPLE DIFFERENT statistics still composes
    budget normally, and a production DP deployment should swap the PRF
    seed per intentional release (`namespace` is that knob).  The
    half-offset (+0.5 before centering) keeps u strictly inside the
    open interval, so ln never sees 0.

    Output: group cols + (n BIGINT exact — for the caller's own audit,
    DROP IT before release — and noisy_n, the rounded private value;
    `noisy_n_clamped` = max(0, round(noisy_n)) BIGINT is the
    integer-valued nonnegative post-processing most consumers want,
    legal under DP post-processing invariance).

    Shape: ONE partial-combined count agg; the noise is a narrow
    projection over the group table.  Fully SQL-expressible →
    hash-checked vs DuckDB (same md5 bytes, same arithmetic).
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    counts = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    key = F.concat_ws(
        "\x1f",
        F.lit(namespace),
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in group_cols],
    )
    u = (
        (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double") + 0.5)
        / F.lit(float(16 ** 8))
        - 0.5
    )
    b = 1.0 / float(epsilon)
    noise = -F.lit(b) * F.signum(u) * F.log(1.0 - 2.0 * F.abs(u))
    noisy = F.col("n") + noise
    return counts.select(
        *group_cols,
        "n",
        F.round(noisy, ndigits).alias("noisy_n"),
        F.greatest(F.lit(0), F.round(noisy, 0).cast("long")).alias(
            "noisy_n_clamped"
        ),
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
    ndigits: int = 6,
) -> DataFrame:
    """t-closeness audit [Li, Li & Venkatasubramanian 2007] — the third
    rung of the anonymity ladder (k-anonymity → l-diversity → here):
    an equivalence class leaks even when diverse if its SENSITIVE-VALUE
    DISTRIBUTION differs sharply from the corpus-wide one (the classic
    example: a class whose salary distribution sits entirely in the top
    decile). A class fails when the distance between its distribution
    and the global distribution exceeds `t`.

    Distance = total variation, ½·Σ_v |p_class(v) − p_global(v)| — the
    Earth Mover's Distance under the equal-ground-distance metric, the
    paper's own instantiation for CATEGORICAL sensitive attributes
    (ordered/numeric attributes want the 1-D EMD over the value order;
    compose stats.wasserstein machinery for that variant). NULL
    sensitive values are excluded from both distributions (consistent
    with l_diversity_report's n_sensitive accounting).

    Output: quasi cols + (class_size, n_sensitive_rows, tv_distance,
    t DOUBLE) for FAILING classes only (tv_distance > t).

    Shape: ONE partial-combined agg to the (quasi × sensitive) cell
    table; the global distribution is a window over the sensitive
    marginal of that SAME cell table (no second corpus pass); the
    final class agg is cell-table-sized. Fully SQL-expressible →
    hash-checked vs DuckDB.
    """
    from pyspark.sql.window import Window as W

    if not (0 < t < 1):
        raise ValueError(f"t must be in (0, 1), got {t}")
    is_sens = F.col(sensitive_col).isNotNull()
    cells = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    wq = W.partitionBy(*quasi_cols)
    wv = W.partitionBy(sensitive_col)
    wall = W.partitionBy()
    sens_cells = cells.withColumn("__is_sens", is_sens)
    # per-class and global distributions from the one cell table
    class_sens_total = F.sum(
        F.when(F.col("__is_sens"), F.col("__c")).otherwise(0.0)
    ).over(wq)
    value_total = F.sum(F.col("__c")).over(wv)
    grand_total = F.sum(
        F.when(F.col("__is_sens"), F.col("__c")).otherwise(0.0)
    ).over(wall)
    withp = sens_cells.select(
        *quasi_cols,
        "__c",
        "__is_sens",
        F.when(
            F.col("__is_sens"),
            F.col("__c") / F.nullif(class_sens_total, F.lit(0.0)),
        ).alias("__p"),
        F.when(
            F.col("__is_sens"), value_total / grand_total
        ).alias("__q"),
    )
    # Σ|p−q| over values PRESENT in the class, plus Σq over values the
    # class is MISSING (those contribute |0−q| = q); the missing mass is
    # 1 − Σ_present q, so no join against the full value set is needed.
    klass = withp.groupBy(*quasi_cols).agg(
        F.sum("__c").cast("long").alias("class_size"),
        F.sum(F.when(F.col("__is_sens"), F.col("__c")).otherwise(0.0))
        .cast("long")
        .alias("n_sensitive_rows"),
        F.coalesce(
            F.sum(F.abs(F.col("__p") - F.col("__q"))), F.lit(0.0)
        ).alias("__present"),
        F.coalesce(F.sum("__q"), F.lit(0.0)).alias("__qmass"),
    )
    tv = 0.5 * (F.col("__present") + (F.lit(1.0) - F.col("__qmass")))
    return (
        # a class with ZERO sensitive rows has no distribution to
        # compare — that failure belongs to l_diversity_report, not here
        klass.filter(F.col("n_sensitive_rows") > 0)
        .select(
            *quasi_cols,
            "class_size",
            "n_sensitive_rows",
            F.round(tv, ndigits).alias("tv_distance"),
        )
        .filter(F.col("tv_distance") > t)
        .withColumn("t", F.lit(float(t)))
    )
