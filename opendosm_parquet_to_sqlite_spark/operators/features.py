"""Numeric feature conditioning for training-data pipelines — the scaling /
outlier-taming pass that sits between raw event streams and model features.

Reference scope note: the reference (src/main.rs) has no numeric feature
layer at all — its numeric handling stops at strict casts (src/main.rs:21-58).
These are rebuild extensions in the SURVEY §2.13 spirit: the operations a
100 TB training pipeline needs around the same tables.

Design: statistics are computed as ONE aggregation pass (per group or
global), joined back, and applied as a narrow projection.  The exact
`percentile` aggregate is sort-based per group — correct but heavy at
100 TB; `approx=True` swaps in `percentile_approx` (a mergeable
KLL-style sketch with map-side partial aggregation) which is the scale
path.  The exact path exists so the operator is oracle-mirrorable
(DuckDB `quantile_cont` uses the same linear interpolation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_cols: str | list[str] | None = None,
    clip: float = 5.0,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Median/IQR robust scaling with symmetric clipping:
    scaled = clamp((v - median) / (q3 - q1), ±clip) — the outlier-tolerant
    alternative to z-scoring (mean/std are unbounded under heavy tails;
    median/IQR are not).  Degenerate groups (IQR == 0: constant or
    near-constant values) yield NULL rather than a division blow-up.
    NULL input values stay NULL (the guard below is load-bearing:
    least/greatest skip NULLs in both Spark and DuckDB, so an unguarded
    clamp would silently map missing data to the +clip bound).  NULL
    group keys keep their own stats row via a null-safe join (`<=>`) —
    groupBy already treats NULL as a group; only a plain equi-join
    would drop those rows.

    Output: input columns + `{value_col}_scaled` (rounded to 6 dp).

    Shape: one stats aggregation (3 quantiles in a single pass) →
    broadcast join back (group-count-sized, tiny) → narrow projection.
    With approx=True the aggregation partial-combines map-side
    (percentile_approx sketches merge); exact `percentile` sorts each
    group's values and is the small-data / oracle-parity path.
    """
    groups: list[str]
    if group_cols is None:
        groups = []
    elif isinstance(group_cols, str):
        groups = [group_cols]
    else:
        groups = list(group_cols)
    v = F.col(value_col).cast("double")
    if approx:
        q = F.percentile_approx(v, F.array(
            F.lit(0.25), F.lit(0.5), F.lit(0.75)
        ), F.lit(int(accuracy)))
    else:
        q = F.percentile(v, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    stats_base = df.groupBy(*groups) if groups else df.groupBy()
    stats = stats_base.agg(q.alias("__q")).select(
        *[F.col(g).alias(f"__g_{g}") for g in groups],
        F.col("__q")[0].alias("__q1"),
        F.col("__q")[1].alias("__med"),
        F.col("__q")[2].alias("__q3"),
    )
    if groups:
        cond = None
        for g in groups:
            c = F.col(g).eqNullSafe(F.col(f"__g_{g}"))
            cond = c if cond is None else cond & c
        joined = df.join(F.broadcast(stats), cond)
    else:
        joined = df.crossJoin(F.broadcast(stats))
    iqr = F.col("__q3") - F.col("__q1")
    scaled = F.when(
        v.isNotNull() & (iqr > 0),
        F.round(
            F.greatest(
                F.least((v - F.col("__med")) / iqr, F.lit(float(clip))),
                F.lit(-float(clip)),
            ),
            6,
        ),
    )
    return joined.select(
        *df.columns, scaled.alias(f"{value_col}_scaled")
    )


def flag_outliers_mad(
    df: DataFrame,
    value_col: str,
    group_cols: str | list[str] | None = None,
    k: float = 3.5,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """MAD-based outlier flagging: robust_z = (v - median) /
    (1.4826 * MAD) where MAD = median(|v - median|); rows with
    |robust_z| > k are flagged.  The 1.4826 constant makes MAD a
    consistent sigma estimator under normality, so k reads like a
    z-score cutoff while staying bounded under heavy tails (one
    corrupt sensor can move a mean/std arbitrarily; it cannot move
    either median).

    NULL input values yield NULL robust_z and NULL is_outlier (missing
    is not an outlier verdict); degenerate groups (MAD == 0: majority-
    constant values) likewise yield NULLs rather than a division
    blow-up.  NULL group keys keep their own stats rows via null-safe
    joins, mirroring robust_scale.

    Output: input columns + `robust_z` (6 dp) + `is_outlier`.

    Shape: median aggregation → broadcast join → |v-med| projection →
    MAD aggregation → broadcast join → narrow flag projection.  Two
    stats passes are inherent (MAD is a median OF residuals), but both
    exchanges carry group-count-sized rows; the corpus itself is
    scanned twice and never shuffled.  approx=True swaps both medians
    for mergeable percentile_approx sketches (map-side partials) — the
    100 TB path; the exact path is the oracle-parity path (DuckDB
    median = quantile_cont(0.5), same linear interpolation as Spark's
    percentile).
    """
    groups: list[str]
    if group_cols is None:
        groups = []
    elif isinstance(group_cols, str):
        groups = [group_cols]
    else:
        groups = list(group_cols)

    def _median(c):
        if approx:
            return F.percentile_approx(c, F.lit(0.5), F.lit(int(accuracy)))
        return F.percentile(c, F.lit(0.5))

    def _bjoin(left: DataFrame, stats: DataFrame) -> DataFrame:
        if not groups:
            return left.crossJoin(F.broadcast(stats))
        cond = None
        for g in groups:
            c = F.col(g).eqNullSafe(F.col(f"__g_{g}"))
            cond = c if cond is None else cond & c
        return left.join(F.broadcast(stats), cond)

    v = F.col(value_col).cast("double")
    base = df.groupBy(*groups) if groups else df.groupBy()
    med = base.agg(_median(v).alias("__med")).select(
        *[F.col(g).alias(f"__g_{g}") for g in groups], "__med"
    )
    with_med = _bjoin(df, med).select(*df.columns, "__med")
    resid_base = (
        with_med.groupBy(*groups) if groups else with_med.groupBy()
    )
    mad = resid_base.agg(
        _median(F.abs(v - F.col("__med"))).alias("__mad")
    ).select(*[F.col(g).alias(f"__g_{g}") for g in groups], "__mad")
    out = _bjoin(with_med, mad)
    z = F.when(
        v.isNotNull() & (F.col("__mad") > 0),
        F.round((v - F.col("__med")) / (F.lit(1.4826) * F.col("__mad")), 6),
    )
    return out.select(
        *df.columns,
        z.alias("robust_z"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(float(k))).alias("is_outlier"),
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: str | list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Rank-based normalization: each value maps to its within-group
    percent rank in [0, 1] — the distribution-free alternative to
    robust_scale when downstream wants a uniform feature regardless of
    the source distribution (heavy tails, multimodality, unit mismatch
    across groups all flatten out).  Ties share a rank (percent_rank
    semantics), so the map is deterministic and engine-portable; NULL
    values yield NULL (missing is not rank 0).

    Output: input columns + `{value_col}_qnorm` (6 dp).

    Shape: ONE keyed exchange + in-partition sort (the percent_rank
    window) — the same cost envelope as any per-group window.  This is
    the EXACT path (oracle-mirrorable: DuckDB percent_rank is
    identical); at 100 TB swap to percentile_approx cutpoints +
    interpolation (robust_scale's approx pattern) to trade exactness
    for a mergeable one-pass aggregate.
    """
    from pyspark.sql.window import Window

    groups: list[str]
    if group_cols is None:
        groups = []
    elif isinstance(group_cols, str):
        groups = [group_cols]
    else:
        groups = list(group_cols)
    out = out_col or f"{value_col}_qnorm"
    v = F.col(value_col)
    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy(v)
    # rank over NON-NULL values only — in a single frame NULLs would
    # occupy the bottom ranks (Spark sorts them first) and shift every
    # real value's percentile, so the null slice is carried separately
    nn = df.filter(v.isNotNull()).withColumn(
        out, F.round(F.percent_rank().over(w), 6)
    )
    nulls = df.filter(v.isNull()).withColumn(
        out, F.lit(None).cast("double")
    )
    return nn.unionByName(nulls)


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    group_cols: str | list[str] | None = None,
    n_bins: int = 10,
    floor: float = 1e-4,
) -> DataFrame:
    """Population Stability Index between two slices of the same feature
    — the standard drift score for "did this week's data move under the
    model": psi = Σ_bins (p_a − p_b)·ln(p_a / p_b) over equi-width bins
    spanning the COMBINED range, with probabilities floored at `floor`
    so one-sided-empty bins contribute a large-but-finite term instead
    of ±inf. Rule-of-thumb reading: <0.1 stable, 0.1–0.25 drifting,
    >0.25 shifted. NULL values are excluded from both distributions
    (missingness drift is profile_nulls' job, not a bin).

    Output per group: psi (6 dp), n_a/n_b (non-null counts), mean_a/
    mean_b (6 dp). Bins observed in NEITHER side contribute exactly 0
    (floor vs floor), so only observed bins are materialized.

    Shape: union with a side tag → per-group bounds+means agg (one
    exchange of group-sized rows) → broadcast bounds back → per
    (group, side, bin) counts (partial-combined; bin-table-sized
    exchange) → dense side-pivot + psi sum over ≤ n_bins rows per
    group. Two passes over the union are inherent (bounds must precede
    binning — same structure as robust_scale); the value stream itself
    never shuffles. Fully SQL-expressible → hash-checked vs DuckDB.
    """
    groups: list[str]
    if group_cols is None:
        groups = []
    elif isinstance(group_cols, str):
        groups = [group_cols]
    else:
        groups = list(group_cols)
    v = F.col(value_col).cast("double")
    u = (
        df_a.select(*groups, v.alias("__v"))
        .withColumn("__side", F.lit("a"))
        .unionByName(
            df_b.select(*groups, v.alias("__v")).withColumn(
                "__side", F.lit("b")
            )
        )
        .filter(F.col("__v").isNotNull())
    )
    side_stats = u.groupBy(*groups, "__side").agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__v").alias("__mean"),
        F.min("__v").alias("__mn"),
        F.max("__v").alias("__mx"),
    )
    bounds = side_stats.groupBy(*groups).agg(
        F.min("__mn").alias("__lo"), F.max("__mx").alias("__hi")
    )
    if groups:
        binned = u.join(F.broadcast(bounds), groups)
    else:
        binned = u.crossJoin(F.broadcast(bounds))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    bin_ = F.when(width > 0, F.least(
        F.floor((F.col("__v") - F.col("__lo")) / width),
        F.lit(n_bins - 1),
    )).otherwise(F.lit(0)).cast("long")
    counts = binned.select(*groups, "__side", bin_.alias("__bin")).groupBy(
        *groups, "__bin", "__side"
    ).agg(F.count(F.lit(1)).alias("__c"))
    # dense side pivot over OBSERVED bins only (unobserved-on-both bins
    # contribute floor-vs-floor = exactly 0)
    pivoted = counts.groupBy(*groups, "__bin").agg(
        F.coalesce(
            F.sum(F.when(F.col("__side") == "a", F.col("__c"))), F.lit(0)
        ).alias("__ca"),
        F.coalesce(
            F.sum(F.when(F.col("__side") == "b", F.col("__c"))), F.lit(0)
        ).alias("__cb"),
    )
    totals = side_stats.groupBy(*groups).agg(
        F.coalesce(
            F.sum(F.when(F.col("__side") == "a", F.col("__n"))), F.lit(0)
        ).alias("__na"),
        F.coalesce(
            F.sum(F.when(F.col("__side") == "b", F.col("__n"))), F.lit(0)
        ).alias("__nb"),
        F.sum(F.when(F.col("__side") == "a", F.col("__mean"))).alias(
            "__mean_a"
        ),
        F.sum(F.when(F.col("__side") == "b", F.col("__mean"))).alias(
            "__mean_b"
        ),
    )
    if groups:
        j = pivoted.join(F.broadcast(totals), groups)
    else:
        j = pivoted.crossJoin(F.broadcast(totals))
    fl = F.lit(float(floor))
    pa = F.greatest(F.col("__ca") / F.greatest(F.col("__na"), F.lit(1)), fl)
    pb = F.greatest(F.col("__cb") / F.greatest(F.col("__nb"), F.lit(1)), fl)
    term = (pa - pb) * F.log(pa / pb)
    out = j.groupBy(*groups).agg(
        F.round(F.sum(term), 6).alias("psi"),
        F.first("__na").alias("n_a"),
        F.first("__nb").alias("n_b"),
        F.round(F.first("__mean_a"), 6).alias("mean_a"),
        F.round(F.first("__mean_b"), 6).alias("mean_b"),
    )
    return out


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    group_cols: str | list[str] | None = None,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov distance per group — the
    binning-free complement to psi_drift: D = sup_x |F_a(x) − F_b(x)|,
    evaluated at every observed value (the supremum of a two-sample KS
    statistic is always attained at a sample point). PSI depends on a
    bin count; KS is parameter-free and reads directly as "worst-case
    CDF gap" (0 identical, 1 disjoint supports).

    Output per group: ks (6 dp), n_a, n_b (non-null counts). A group
    seen on only one side has no defined comparison → ks NULL.

    Shape: union with a side tag → per-(group, value) side counts (ONE
    partial-combined agg: the raw value stream collapses to the
    distinct-value table before anything else touches it) → per-group
    cumulative window over distinct values → one max agg. Exchanges
    carry (group, value, 2 counts) rows — distinct-value-table-sized,
    never raw-row-sized. Exact KS is inherently distinct-value-bounded;
    where a feature is continuous at 100 TB, quantize upstream (e.g.
    round to the measurement precision) — binning then happens at WRITE
    precision, not at an arbitrary n_bins. Fully SQL-expressible →
    hash-checked vs DuckDB.
    """
    from pyspark.sql import Window as W

    groups = (
        [group_cols]
        if isinstance(group_cols, str)
        else list(group_cols or [])
    )
    v = F.col(value_col).cast("double")
    u = df_a.select(*groups, v.alias("__v")).withColumn(
        "__side", F.lit("a")
    ).unionByName(
        df_b.select(*groups, v.alias("__v")).withColumn("__side", F.lit("b"))
    ).filter(F.col("__v").isNotNull())
    per_value = u.groupBy(*groups, "__v").agg(
        F.sum(F.when(F.col("__side") == "a", 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col("__side") == "b", 1).otherwise(0)).alias("__cb"),
    )
    cum_w = W.partitionBy(*groups).orderBy("__v")
    whole = W.partitionBy(*groups)
    stepped = per_value.select(
        *groups,
        F.sum("__ca").over(cum_w).alias("__cum_a"),
        F.sum("__cb").over(cum_w).alias("__cum_b"),
        F.sum("__ca").over(whole).alias("__na"),
        F.sum("__cb").over(whole).alias("__nb"),
    )
    # try_divide: a group seen on only ONE side has no defined comparison
    # — NULL out instead of raising under ANSI mode (oracle: NULLIF)
    gap = F.abs(
        F.try_divide(F.col("__cum_a"), F.col("__na"))
        - F.try_divide(F.col("__cum_b"), F.col("__nb"))
    )
    return stepped.groupBy(*groups).agg(
        F.round(F.max(gap), 6).alias("ks"),
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
    )


def equal_frequency_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    group_cols: str | list[str] | None = None,
    tiebreak_cols: str | list[str] | None = None,
) -> DataFrame:
    """Assign each row an equal-frequency bin id (1..n_bins) per group via
    ntile — the discretization pass that turns a heavy-tailed numeric
    feature into a categorical one for mixing/stratification. Unlike
    equidepth_histogram (which REPORTS edges), this LABELS rows, and
    ntile guarantees bin populations differ by at most one row even when
    quantile edges collide under skew (duplicate-heavy columns break
    edge-based binning; ntile does not).

    Pass `tiebreak_cols` (a unique key) to make assignments reproducible
    under any partitioning: equal values split across a bin boundary are
    ordered by the tiebreak, so reruns bin identically — without it,
    boundary rows land nondeterministically (same populations, different
    members). One window exchange per group; nothing collected.

    Output: input columns + bin (int).
    """
    from pyspark.sql.window import Window as W

    gcols = (
        [group_cols] if isinstance(group_cols, str)
        else list(group_cols or [])
    )
    tcols = (
        [tiebreak_cols] if isinstance(tiebreak_cols, str)
        else list(tiebreak_cols or [])
    )
    order = [F.col(value_col)] + [F.col(c) for c in tcols]
    w = W.partitionBy(*gcols).orderBy(*order)
    return df.withColumn("bin", F.ntile(int(n_bins)).over(w))


def js_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    cat_col: str,
    group_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Jensen-Shannon divergence between two samples of a CATEGORICAL
    column, per group — the bounded, symmetric drift metric for discrete
    features (PSI explodes on empty bins; KL is asymmetric and infinite
    on disjoint support; JS is always in [0, ln 2] and defined
    everywhere, which makes it the alert-threshold-friendly choice):

        JS = ½·KL(P‖M) + ½·KL(Q‖M),  M = ½(P+Q)

    Categories seen on one side only contribute their full ½·ln 2 mass
    share instead of blowing up — no smoothing constant to tune.

    Output per group: js (rounded), n_a, n_b. One-sided groups → NULL
    (no comparison), via NULLIF on the side totals.

    Shape: identical to ks_drift's — union with a side tag, ONE
    partial-combined agg to the (group, category, c_a, c_b) table, then
    a category-table-sized agg computes both KL terms in one pass. The
    raw rows collapse before any exchange; at 100 TB the shuffle carries
    the category table. Fully SQL-expressible → hash-checked vs DuckDB.
    """
    gcols = (
        [group_cols] if isinstance(group_cols, str)
        else list(group_cols or [])
    )
    tagged = df_a.select(
        *gcols, F.col(cat_col).alias("__c"), F.lit(1).alias("__a")
    ).unionByName(
        df_b.select(
            *gcols, F.col(cat_col).alias("__c"), F.lit(0).alias("__a")
        )
    ).filter(F.col("__c").isNotNull())
    cells = tagged.groupBy(*gcols, "__c").agg(
        F.sum("__a").cast("double").alias("ca"),
        F.sum(1 - F.col("__a")).cast("double").alias("cb"),
    )
    from pyspark.sql.window import Window as W

    wg = W.partitionBy(*gcols) if gcols else W.partitionBy()
    withp = cells.select(
        *gcols,
        "ca",
        "cb",
        (F.col("ca") / F.nullif(F.sum("ca").over(wg), F.lit(0.0))).alias("p"),
        (F.col("cb") / F.nullif(F.sum("cb").over(wg), F.lit(0.0))).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2.0
    # x·ln(x/m) with the 0·ln0 = 0 convention (p or q may be 0 for
    # one-sided categories; m > 0 whenever the row exists)
    term_p = F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
    term_q = F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)).otherwise(0.0)
    return withp.groupBy(*gcols).agg(
        F.round(0.5 * F.sum(term_p) + 0.5 * F.sum(term_q), ndigits).alias("js"),
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    k: int = 5,
    smoothing: float = 20.0,
    namespace: str = "te",
    ndigits: int = 6,
) -> DataFrame:
    """K-fold out-of-fold target encoding of a categorical column — the
    standard leakage-free way to turn a high-cardinality category into a
    numeric feature: each row's encoding is the smoothed mean of the
    target over the OTHER k−1 folds, so no row's own label ever reaches
    its own feature value.

        enc(row) = (S_cat − S_cat,fold + m·prior) / (N_cat − N_cat,fold + m)

    where S/N are target sums/counts, m = `smoothing` (an m-estimate
    prior weight: rare categories shrink toward the prior instead of
    memorizing a handful of labels), and the prior is itself out-of-fold
    (the global target mean EXCLUDING the row's fold — the usual
    global-mean prior leaks a 1/k sliver through the fold's own labels).

    Folds come from sampling.fold_assign's md5-band determinism: a pure
    function of (namespace, id), so re-runs, repartitions, and appended
    rows never reassign existing encodings.

    A category entirely inside one fold (oof count 0) degrades to the
    prior ((0 + m·prior)/(0 + m)) when m > 0 — set smoothing > 0 unless
    every category is known to span folds.  NULL categories are a group
    of their own (null-safe join back).  NULL targets are ignored by the
    sums/counts on both engines.

    Output: input columns + `fold` + `{target_col}_te` (rounded).

    Shape: one fold projection (no shuffle), ONE partial-combined
    aggregation to the (category × fold) cell table, two window passes
    OVER THAT TABLE (category totals, fold totals — cell-table-sized,
    not corpus-sized), and a broadcast join back.  At 100 TB the only
    raw-row exchange is the cell aggregation.
    """
    from .sampling import fold_assign

    folded = fold_assign(df, id_col, k=k, namespace=namespace)
    t = F.col(target_col).cast("double")
    cells = folded.groupBy(cat_col, "fold").agg(
        F.coalesce(F.sum(t), F.lit(0.0)).alias("__s"),
        F.count(t).cast("double").alias("__n"),
    )
    from pyspark.sql.window import Window as W

    wc = W.partitionBy(cat_col)
    wf = W.partitionBy("fold")
    wall = W.partitionBy()
    enc = cells.select(
        F.col(cat_col).alias("__cat"),
        F.col("fold").alias("__fold"),
        (F.sum("__s").over(wc) - F.col("__s")).alias("__oof_s"),
        (F.sum("__n").over(wc) - F.col("__n")).alias("__oof_n"),
        (
            (F.sum("__s").over(wall) - F.sum("__s").over(wf))
            / F.nullif(F.sum("__n").over(wall) - F.sum("__n").over(wf), F.lit(0.0))
        ).alias("__prior"),
    )
    m = float(smoothing)
    joined = folded.join(
        F.broadcast(enc),
        F.col(cat_col).eqNullSafe(F.col("__cat"))
        & (F.col("fold") == F.col("__fold")),
    )
    return joined.select(
        *folded.columns,
        F.round(
            (F.col("__oof_s") + F.lit(m) * F.col("__prior"))
            / F.nullif(F.col("__oof_n") + F.lit(m), F.lit(0.0)),
            ndigits,
        ).alias(f"{target_col}_te"),
    )


def hash_features(
    df: DataFrame,
    feature_cols: list[str],
    id_col: str,
    n_buckets: int = 1024,
    namespace: str = "fh",
) -> DataFrame:
    """The hashing trick: map (feature name, value) pairs into a fixed
    `n_buckets`-dimensional index space with a signed hash — the
    vocabulary-free categorical encoder (no fit pass, no dictionary to
    broadcast, unbounded cardinality) used by linear/FM models at scale.

        bucket = int(md5(ns:feature:value)[:8 hex]) mod n_buckets
        sign   = +1 / −1 from the next hex digit (Weinberger's signed
                 variant: collision contributions cancel in expectation
                 instead of always adding)

    md5, not xxhash: the digest is engine-portable (DuckDB restates the
    same bytes), so the feature space is stable across the Spark pipeline
    and any SQL consumer — same rationale as sampling's md5 bands.
    One md5 per (row, feature) is the deliberate price of portability;
    swap for xxhash64 when the consumer is Spark-only.

    NULL feature values emit no row (a missing feature is absent from a
    sparse vector, not a hashed "None" token).

    Output: long format — (id_col, feature STRING, bucket BIGINT,
    sign INT), one row per non-null (row, feature) pair, ready for a
    groupBy(id, bucket).agg(sum(sign·weight)) sparse-vector assembly.

    Shape: pure narrow projection + union of per-feature selects (no
    explode buffer, no shuffle at all — the plan is a single stage);
    fully SQL-expressible → hash-checked vs DuckDB.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    parts = []
    for c in feature_cols:
        digest = F.md5(
            F.concat(
                F.lit(f"{namespace}:{c}:"), F.col(c).cast("string")
            )
        )
        parts.append(
            df.filter(F.col(c).isNotNull()).select(
                F.col(id_col),
                F.lit(c).alias("feature"),
                F.pmod(
                    F.conv(F.substring(digest, 1, 8), 16, 10).cast("long"),
                    F.lit(int(n_buckets)),
                ).alias("bucket"),
                F.when(
                    F.substring(digest, 9, 1) < "8", F.lit(1)
                ).otherwise(F.lit(-1)).alias("sign"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def wasserstein_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    group_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """EXACT 1-D Wasserstein-1 (earth-mover) distance per group — the
    magnitude-aware member of the drift family: PSI needs bins, KS reads
    only the worst CDF gap; W1 integrates the whole gap IN THE UNITS OF
    THE VALUE COLUMN:

        W1 = ∫ |F_a(x) − F_b(x)| dx
           = Σ_i |F_a(v_i) − F_b(v_i)| · (v_{i+1} − v_i)

    over the pooled distinct values (both CDFs are step functions, so
    the integral is this finite sum exactly — no quadrature). "W1 = 3.2"
    on a price column means the distributions are 3.2 currency units of
    transport apart, which thresholds far more interpretably than a KS
    0.04.

    Output per group: w1 (ndigits dp), n_a, n_b. A group seen on only
    one side yields NULL (no defined comparison), matching ks_drift.

    Shape: identical to ks_drift — union + side tag → ONE
    partial-combined agg to the per-(group, distinct value) count table
    → cumulative + lead windows sharing one sort → one final agg.
    Exchanges are distinct-value-table-sized; quantize continuous
    features upstream at write precision as with exact KS. Fully
    SQL-expressible → hash-checked vs DuckDB.
    """
    from pyspark.sql import Window as W

    groups = (
        [group_cols]
        if isinstance(group_cols, str)
        else list(group_cols or [])
    )
    v = F.col(value_col).cast("double")
    u = df_a.select(*groups, v.alias("__v")).withColumn(
        "__side", F.lit("a")
    ).unionByName(
        df_b.select(*groups, v.alias("__v")).withColumn("__side", F.lit("b"))
    ).filter(F.col("__v").isNotNull())
    per_value = u.groupBy(*groups, "__v").agg(
        F.sum(F.when(F.col("__side") == "a", 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col("__side") == "b", 1).otherwise(0)).alias("__cb"),
    )
    cum_w = W.partitionBy(*groups).orderBy("__v")
    whole = W.partitionBy(*groups)
    stepped = per_value.select(
        *groups,
        "__v",
        F.sum("__ca").over(cum_w).alias("__cum_a"),
        F.sum("__cb").over(cum_w).alias("__cum_b"),
        F.sum("__ca").over(whole).alias("__na"),
        F.sum("__cb").over(whole).alias("__nb"),
        F.lead("__v").over(cum_w).alias("__next_v"),
    )
    gap = F.abs(
        F.try_divide(F.col("__cum_a"), F.col("__na"))
        - F.try_divide(F.col("__cum_b"), F.col("__nb"))
    )
    # last distinct value: lead NULL -> zero-width step contributes 0
    seg = gap * (F.coalesce(F.col("__next_v"), F.col("__v")) - F.col("__v"))
    return stepped.groupBy(*groups).agg(
        F.round(F.sum(seg), ndigits).alias("w1"),
        F.max("__na").cast("long").alias("n_a"),
        F.max("__nb").cast("long").alias("n_b"),
    )
