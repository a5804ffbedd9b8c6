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
