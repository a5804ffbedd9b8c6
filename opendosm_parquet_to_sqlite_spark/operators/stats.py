"""Inferential statistics over grouped columns — the hypothesis-testing /
trend-fitting layer a dataset-monitoring pipeline runs on top of its drift
metrics (PSI/KS in features.py tell you *that* distributions moved; these
quantify relationships and significance).

Reference scope note: the reference (src/main.rs) has no statistics layer;
these are rebuild extensions in the SURVEY §2.13 spirit, same tables.

Design rule for everything here: sufficient statistics, ONE partial-combined
aggregation pass per operator, group-count-sized results.  Nothing in this
module shuffles raw rows a second time and nothing collects — at 100 TB an
OLS fit per group costs exactly one exchange of (group, six doubles).

Determinism: every reported statistic is rounded at the operator boundary
(6 dp) so Spark and a SQL oracle computing the same closed forms agree
hash-exactly; degenerate groups (zero variance, empty sides) yield NULL via
guarded denominators rather than NaN, matching SQL NULL semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_cols(group_cols: str | list[str] | None) -> list[str]:
    if group_cols is None:
        return []
    return [group_cols] if isinstance(group_cols, str) else list(group_cols)


def group_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group simple linear regression y = a·x + b from sufficient
    statistics (n, Σx, Σy, Σxx, Σyy, Σxy) — ONE partial-combined agg; the
    closed-form slope/intercept/r² are a driver-free projection on the
    group-sized result.  Rows where either side is NULL are excluded
    pairwise (SQL regr_* semantics).  Zero x-variance → NULL slope and
    intercept (vertical line); r² additionally NULL when y is constant
    (0/0), both via NULLIF guards so DuckDB's regr_r2 agrees.

    Output: group cols + (n BIGINT, slope, intercept, r2) rounded to
    `ndigits`.
    """
    gcols = _group_cols(group_cols)
    x, y = F.col(x_col), F.col(y_col)
    both = x.isNotNull() & y.isNotNull()
    fx, fy = F.when(both, x), F.when(both, y)
    agg = df.groupBy(*gcols).agg(
        F.count(fx).alias("__n"),
        F.sum(fx).alias("__sx"),
        F.sum(fy).alias("__sy"),
        F.sum(fx * fx).alias("__sxx"),
        F.sum(fy * fy).alias("__syy"),
        F.sum(fx * fy).alias("__sxy"),
    )
    n = F.col("__n").cast("double")
    # n·Σxy − Σx·Σy and n·Σxx − (Σx)² — the scale-invariant cov/var forms
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    varx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vary = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    slope = cov / F.nullif(varx, F.lit(0.0))
    intercept = (F.col("__sy") - slope * F.col("__sx")) / n
    r2 = (cov * cov) / F.nullif(varx * vary, F.lit(0.0))
    return agg.select(
        *gcols,
        F.col("__n").alias("n"),
        F.round(slope, ndigits).alias("slope"),
        F.round(intercept, ndigits).alias("intercept"),
        F.round(r2, ndigits).alias("r2"),
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    ndigits: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns: ONE groupBy builds the contingency table (cells = observed
    counts), marginals ride window sums OVER the cell table (category-
    count-sized, not row-count-sized), and the statistic is a final tiny
    agg.  NULL categories are excluded (SQL GROUP BY would keep them;
    a NULL level is a missing observation, not a category).

    Output: one row (chi2, dof BIGINT, n BIGINT).  dof =
    (levels_a − 1)·(levels_b − 1).
    """
    from pyspark.sql.window import Window as W

    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(col_a, col_b)
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    wa = W.partitionBy(col_a)
    wb = W.partitionBy(col_b)
    wall = W.partitionBy()
    with_marg = cells.select(
        F.col("__o").cast("double").alias("o"),
        F.sum("__o").over(wa).cast("double").alias("row_tot"),
        F.sum("__o").over(wb).cast("double").alias("col_tot"),
        F.sum("__o").over(wall).cast("double").alias("n"),
        F.col(col_a).alias("a"),
        F.col(col_b).alias("b"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    # chi2 over the FULL r x c table from observed cells only, via
    # sum_all (o-e)^2/e  =  sum_obs o^2/e - n   (zero cells contribute
    # exactly e, and sum_all e = n, sum_all o = n).  Summing (o-e)^2/e
    # over observed cells alone UNDERSTATES chi2 whenever a level pair
    # never co-occurs - which is the dependent case the test exists for.
    return with_marg.agg(
        F.round(
            F.sum(F.col("o") * F.col("o") / e) - F.max(F.col("n")), ndigits
        ).alias("chi2"),
        (
            (F.count_distinct(F.col("a")) - 1)
            * (F.count_distinct(F.col("b")) - 1)
        ).alias("dof"),
        F.max(F.col("n")).cast("long").alias("n"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a,
    group_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group two-sample Mann-Whitney U (rank-sum) with midrank tie
    handling and the tie-corrected normal approximation — the
    distribution-free "did the median move" companion to features.ks_drift.

    Ranks come from ONE window pass over the per-group sort: rank() gives
    the min rank of a tie run and a value-partitioned count gives the run
    length, so midrank = rank + (ties−1)/2 without a self-join.  The z
    statistic uses σ² = (na·nb/12)·((n+1) − Σ(t³−t)/(n(n−1))) — NULL when
    either side is empty or all values tie (σ = 0), via NULLIF.

    Output: group cols + (n_a, n_b BIGINT, u, z) rounded to `ndigits`.
    U is side_a's U statistic (midrank sum minus na(na+1)/2).
    """
    from pyspark.sql.window import Window as W

    gcols = _group_cols(group_cols)
    v = F.col(value_col)
    base = df.filter(v.isNotNull()).select(
        *gcols,
        v.alias("__v"),
        (F.col(side_col) == F.lit(side_a)).cast("int").alias("__is_a"),
    )
    wrank = W.partitionBy(*gcols).orderBy("__v")
    # peer count via a zero-width RANGE frame on the SAME sort — no second
    # exchange for a (group, value) partitioning
    wtie = (
        W.partitionBy(*gcols)
        .orderBy("__v")
        .rangeBetween(W.currentRow, W.currentRow)
    )
    ranked = base.select(
        *gcols,
        "__is_a",
        "__v",
        (
            F.rank().over(wrank).cast("double")
            + (F.count(F.lit(1)).over(wtie).cast("double") - 1.0) / 2.0
        ).alias("__midrank"),
        F.count(F.lit(1)).over(wtie).cast("double").alias("__t"),
    )
    agg = ranked.groupBy(*gcols).agg(
        F.sum("__is_a").cast("double").alias("__na"),
        F.sum(1 - F.col("__is_a")).cast("double").alias("__nb"),
        F.sum(F.col("__midrank") * F.col("__is_a")).alias("__ra"),
        # Σ(t³−t) counts each tie run t times at size t → divide by t:
        # Σ over rows of (t³−t)/t  ==  Σ over runs of (t³−t)
        F.sum(
            (F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t"))
            / F.col("__t")
        ).alias("__tie_term"),
    )
    na, nb = F.col("__na"), F.col("__nb")
    n = na + nb
    u = F.col("__ra") - na * (na + 1.0) / 2.0
    mu = na * nb / 2.0
    sigma2 = (na * nb / 12.0) * (
        (n + 1.0) - F.col("__tie_term") / F.nullif(n * (n - 1.0), F.lit(0.0))
    )
    z = (u - mu) / F.nullif(F.sqrt(sigma2), F.lit(0.0))
    return agg.select(
        *gcols,
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(u, ndigits).alias("u"),
        F.round(z, ndigits).alias("z"),
    )


def welch_ttest(
    df: DataFrame,
    value_col: str,
    cohort_col: str,
    group_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group Welch's unequal-variance t-test between the rows where
    `cohort_col` is true (side A) and false (side B) — the parametric
    A/B-comparison companion to mann_whitney_u (which compares ranks;
    this compares means when the values themselves are meaningful).

    Welch, not Student: pooled-variance t silently assumes equal
    variances, which real cohort splits (treatment vs control, discounted
    vs full-price) rarely satisfy; Welch's statistic

        t  = (mA − mB) / sqrt(vA/nA + vB/nB)
        df = (vA/nA + vB/nB)² / ((vA/nA)²/(nA−1) + (vB/nB)²/(nB−1))

    is the default recommendation in the methodological literature and
    costs the same single pass.  The p-value mapping (Student-t CDF at
    `df`) is a driver-side table lookup, deliberately out of scope —
    neither engine has the incomplete beta function, and decision
    thresholds on |t| at df ≫ 30 are the 1.96/2.58 normal constants.

    Degenerate groups — a side with n < 2, or both variances zero — yield
    NULL t/df via NULLIF-guarded denominators, never NaN/Infinity.
    NULL cohort flags and NULL values are excluded (three-valued logic
    would otherwise leak them into neither/both sides).

    Output: group cols + (n_a, n_b BIGINT, mean_a, mean_b, t_stat,
    t_df) rounded to `ndigits`.

    Shape: sufficient statistics only — ONE partial-combined aggregation
    to (group, six doubles); conditional aggregates split the cohorts
    without a union or self-join, so at 100 TB the exchange carries the
    group table.  Fully SQL-expressible → hash-checked vs DuckDB
    (var_samp has the same n−1 definition there).
    """
    gcols = _group_cols(group_cols)
    v = F.col(value_col).cast("double")
    is_a = F.col(cohort_col).cast("boolean")
    va = F.when(is_a & v.isNotNull(), v)
    vb = F.when(~is_a & v.isNotNull(), v)
    agg = df.groupBy(*gcols).agg(
        F.count(va).cast("double").alias("__na"),
        F.count(vb).cast("double").alias("__nb"),
        F.avg(va).alias("__ma"),
        F.avg(vb).alias("__mb"),
        F.var_samp(va).alias("__va"),
        F.var_samp(vb).alias("__vb"),
    )
    na, nb = F.col("__na"), F.col("__nb")
    sa = F.col("__va") / na
    sb = F.col("__vb") / nb
    se2 = sa + sb
    ok = (na >= 2) & (nb >= 2)
    t = F.when(ok, (F.col("__ma") - F.col("__mb")) / F.nullif(F.sqrt(se2), F.lit(0.0)))
    dof = F.when(
        ok,
        se2 * se2 / F.nullif(
            sa * sa / (na - 1.0) + sb * sb / (nb - 1.0), F.lit(0.0)
        ),
    )
    return agg.select(
        *gcols,
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round("__ma", ndigits).alias("mean_a"),
        F.round("__mb", ndigits).alias("mean_b"),
        F.round(t, ndigits).alias("t_stat"),
        F.round(dof, ndigits).alias("t_df"),
    )


def bh_correction(
    df: DataFrame,
    p_col: str,
    alpha: float = 0.05,
    ndigits: int = 6,
) -> DataFrame:
    """Benjamini-Hochberg FDR correction across a family of hypothesis
    tests — the multiple-testing discipline the per-group test operators
    (welch_ttest, mann_whitney_u, chi_square_independence) need before
    anyone alerts on their p-values: testing 500 segments at α=0.05
    expects 25 false alarms; BH caps the FALSE DISCOVERY RATE at α
    instead.

        rank p ascending;  adj_p(i) = min_{j ≥ i} ( p(j) · n / j ) ∧ 1;
        reject ⇔ adj_p ≤ α     (step-up procedure)

    The suffix-min makes tied p-values receive identical adj_p whatever
    their rank order, so the output is deterministic without a tiebreak
    column.  NULL p-values (degenerate tests upstream) are EXCLUDED from
    the family — they are not evidence, and counting them in n would
    dilute the correction.

    Output: input columns + p_rank BIGINT + p_adj (rounded) + reject
    BOOLEAN.

    Shape note: both windows are UNPARTITIONED (rank over the whole
    family, then a suffix running-min over the same sort) — safe by
    construction because the input is a hypothesis table, one row per
    test, group-count-sized; never feed corpus-sized data here.  Fully
    SQL-expressible → hash-checked vs DuckDB.
    """
    from pyspark.sql.window import Window as W

    base = df.filter(F.col(p_col).isNotNull())
    wrank = W.orderBy(F.col(p_col).asc())
    wall = W.partitionBy()
    ranked = base.select(
        *base.columns,
        F.row_number().over(wrank).cast("long").alias("p_rank"),
        F.count(F.lit(1)).over(wall).cast("double").alias("__n"),
    )
    cand = F.col(p_col) * F.col("__n") / F.col("p_rank")
    # default frame (unbounded preceding .. current row) over rank DESC
    # == min over all ranks >= this one: the BH step-up suffix min
    wsuffix = W.orderBy(F.col("p_rank").desc())
    adj = F.least(F.lit(1.0), F.min(cand).over(wsuffix))
    return ranked.select(
        *base.columns,
        "p_rank",
        F.round(adj, ndigits).alias("p_adj"),
        (adj <= F.lit(float(alpha))).alias("reject"),
    )


def auc_roc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group ROC AUC of a score against a binary label via the
    rank-sum (Mann-Whitney U) identity — no curve construction, no
    threshold sweep:

        AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ · n⁻)

    where R⁺ is the positives' midrank sum under the score ordering.
    Midranks give tied scores the conventional half credit, so AUC on a
    constant score is exactly 0.5.  This IS P(score⁺ > score⁻) + ½
    P(tie) — the probabilistic definition — computed exactly, where a
    binned curve integration would approximate it.

    NULL scores/labels are excluded; a group with no positives or no
    negatives yields NULL AUC (undefined, not 0/1) via NULLIF.

    Output: group cols + (n_pos, n_neg BIGINT, auc) rounded.

    Shape: identical to mann_whitney_u — ONE per-group window sort
    (midranks + tie runs from a zero-width RANGE frame on the same
    sort) and one partial-combined agg to the group table.  Fully
    SQL-expressible → hash-checked vs DuckDB.
    """
    from pyspark.sql.window import Window as W

    gcols = _group_cols(group_cols)
    s = F.col(score_col)
    y = F.col(label_col).cast("boolean")
    base = df.filter(s.isNotNull() & y.isNotNull()).select(
        *gcols, s.alias("__s"), y.cast("int").alias("__pos")
    )
    wrank = W.partitionBy(*gcols).orderBy("__s")
    wtie = (
        W.partitionBy(*gcols)
        .orderBy("__s")
        .rangeBetween(W.currentRow, W.currentRow)
    )
    ranked = base.select(
        *gcols,
        "__pos",
        (
            F.rank().over(wrank).cast("double")
            + (F.count(F.lit(1)).over(wtie).cast("double") - 1.0) / 2.0
        ).alias("__midrank"),
    )
    agg = ranked.groupBy(*gcols).agg(
        F.sum("__pos").cast("double").alias("__np"),
        F.sum(1 - F.col("__pos")).cast("double").alias("__nn"),
        F.sum(F.col("__midrank") * F.col("__pos")).alias("__rp"),
    )
    np_, nn = F.col("__np"), F.col("__nn")
    auc = (F.col("__rp") - np_ * (np_ + 1.0) / 2.0) / F.nullif(
        np_ * nn, F.lit(0.0)
    )
    return agg.select(
        *gcols,
        np_.cast("long").alias("n_pos"),
        nn.cast("long").alias("n_neg"),
        F.round(auc, ndigits).alias("auc"),
    )


def classification_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    thresholds: list[float],
    group_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Precision / recall / F1 at each decision threshold (score ≥ t →
    predicted positive), per group — the operating-point companion to
    auc_roc (AUC says whether the score ranks well; this says what you
    get at the cutoffs you could actually deploy).

    NULL scores/labels are excluded.  Zero-denominator cells (no
    predicted positives → precision; no actual positives → recall)
    yield NULL, and F1 is NULL whenever either side is — never a
    fabricated 0.

    Output: group cols + threshold + (tp, fp, fn, tn BIGINT) +
    (precision, recall, f1) rounded.

    Shape: each row replicates once per threshold (|thresholds| is a
    handful — the explode factor is a constant, not data-sized), then
    ONE partial-combined agg to the (group × threshold) table; no join,
    no second pass over the data.  Fully SQL-expressible → hash-checked
    vs DuckDB.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    gcols = _group_cols(group_cols)
    s = F.col(score_col)
    y = F.col(label_col).cast("boolean")
    base = df.filter(s.isNotNull() & y.isNotNull()).select(
        *gcols,
        s.alias("__s"),
        y.alias("__y"),
        F.explode(
            F.array(*[F.lit(float(t)) for t in thresholds])
        ).alias("threshold"),
    )
    pred = F.col("__s") >= F.col("threshold")
    yy = F.col("__y")
    agg = base.groupBy(*gcols, "threshold").agg(
        F.sum((pred & yy).cast("long")).alias("tp"),
        F.sum((pred & ~yy).cast("long")).alias("fp"),
        F.sum((~pred & yy).cast("long")).alias("fn"),
        F.sum((~pred & ~yy).cast("long")).alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = tp / F.nullif(tp + fp, F.lit(0)).cast("double")
    rec = tp / F.nullif(tp + fn, F.lit(0)).cast("double")
    f1 = 2.0 * prec * rec / F.nullif(prec + rec, F.lit(0.0))
    return agg.select(
        *gcols,
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, ndigits).alias("precision"),
        F.round(rec, ndigits).alias("recall"),
        F.round(f1, ndigits).alias("f1"),
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    tiebreak_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Decile lift / cumulative-gains table — the campaign-targeting
    view of a score: bin rows into `n_bins` equal-frequency score bins
    (decile 1 = HIGHEST scores), then per decile report the response
    rate, its lift over the global rate, and the cumulative share of
    all positives captured down to that decile.

    Binning reuses features.equal_frequency_bins (ntile over the score
    with a tiebreak key for reproducible boundary assignment — pass the
    row's unique id).  NULL scores/labels are excluded first.

    Output: (decile INT, n, n_pos BIGINT, response_rate, lift,
    cum_gain, cum_lift) rounded; exactly n_bins rows.

    Shape: one window exchange for the binning (ntile is a global sort
    at this signature — at 100 TB hand equal_frequency_bins group_cols,
    or pre-bucket on approx quantile edges, and this table inherits the
    fix), ONE partial-combined agg to the n_bins-row table, then
    windows OVER THAT TABLE for totals and cumulative sums.  Fully
    SQL-expressible → hash-checked vs DuckDB.
    """
    from .features import equal_frequency_bins
    from pyspark.sql.window import Window as W

    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    s = F.col(score_col)
    y = F.col(label_col).cast("boolean")
    base = df.filter(s.isNotNull() & y.isNotNull())
    binned = equal_frequency_bins(
        base, score_col, n_bins, tiebreak_cols=tiebreak_cols
    ).select(
        (F.lit(int(n_bins) + 1) - F.col("bin")).alias("decile"),
        y.cast("int").alias("__pos"),
    )
    per = binned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__pos").cast("long").alias("n_pos"),
    )
    wall = W.partitionBy()
    wcum = W.orderBy(F.col("decile").asc())
    tot_n = F.sum("n").over(wall).cast("double")
    tot_p = F.sum("n_pos").over(wall).cast("double")
    cum_n = F.sum("n").over(wcum).cast("double")
    cum_p = F.sum("n_pos").over(wcum).cast("double")
    rate = F.col("n_pos").cast("double") / F.col("n")
    grate = tot_p / tot_n
    return per.select(
        "decile",
        "n",
        "n_pos",
        F.round(rate, ndigits).alias("response_rate"),
        F.round(rate / F.nullif(grate, F.lit(0.0)), ndigits).alias("lift"),
        F.round(cum_p / F.nullif(tot_p, F.lit(0.0)), ndigits).alias(
            "cum_gain"
        ),
        F.round(
            (cum_p / cum_n) / F.nullif(grate, F.lit(0.0)), ndigits
        ).alias("cum_lift"),
    )


def survival_curve(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival estimate per group — the right-censoring-
    aware retention curve (the naive "fraction still alive at t" is
    biased the moment observation windows differ: subjects whose window
    ends before they churn are CENSORED, not survivors, and KM is the
    standard estimator that uses them correctly — they count in the
    at-risk denominator up to their censoring time and never as events).

        S(t) = Π_{u ≤ t, d_u > 0} (1 − d_u / n_u)

    with d_u = events at duration u and n_u = subjects still at risk
    (duration ≥ u, censored or not).  Output rows are the EVENT times
    only (where the curve steps), but censored subjects shape n_u.

    The running product is exp of a running sum of logs — except that a
    time where everyone at risk dies (d_u = n_u) makes the factor 0 and
    ln diverges DIFFERENTLY across engines (Spark NULL, DuckDB −inf),
    so absorbing states are handled explicitly: a cumulative flag zeroes
    the curve from the first such time on.

    NULL durations/flags are excluded.  `event_col` is boolean-castable
    (1/true = observed event, 0/false = censored).

    Output: group cols + (duration, n_at_risk, n_events BIGINT,
    survival) rounded, at event times, curve non-increasing from 1.

    Shape: ONE partial-combined agg to the (group, duration) table,
    then three windows OVER THAT TABLE (at-risk suffix sum, log running
    sum, absorbing flag) sharing one duration sort per group.  At 100 TB
    the exchange carries distinct (group, duration) rows only.  Fully
    SQL-expressible → hash-checked vs DuckDB.
    """
    from pyspark.sql.window import Window as W

    gcols = _group_cols(group_cols)
    d = F.col(duration_col)
    e = F.col(event_col).cast("boolean")
    base = df.filter(d.isNotNull() & e.isNotNull()).select(
        *gcols, d.alias("__t"), e.cast("int").alias("__e")
    )
    cells = base.groupBy(*gcols, "__t").agg(
        F.sum("__e").cast("double").alias("__d"),
        F.count(F.lit(1)).cast("double").alias("__total"),
    )
    # at risk at t = subjects with duration >= t: suffix sum over t desc
    wdesc = W.partitionBy(*gcols).orderBy(F.col("__t").desc())
    wasc = W.partitionBy(*gcols).orderBy(F.col("__t").asc())
    at_risk = cells.withColumn("__n", F.sum("__total").over(wdesc))
    factor = 1.0 - F.col("__d") / F.col("__n")
    stepped = at_risk.select(
        *gcols,
        "__t",
        "__n",
        "__d",
        F.sum(F.when(factor > 0, F.log(factor)).otherwise(0.0))
        .over(wasc)
        .alias("__logsum"),
        F.sum((factor <= 0).cast("int")).over(wasc).alias("__absorbed"),
    )
    surv = F.when(F.col("__absorbed") > 0, 0.0).otherwise(
        F.exp(F.col("__logsum"))
    )
    return stepped.filter(F.col("__d") > 0).select(
        *gcols,
        F.col("__t").alias("duration"),
        F.col("__n").cast("long").alias("n_at_risk"),
        F.col("__d").cast("long").alias("n_events"),
        F.round(surv, ndigits).alias("survival"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    group_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group average precision (the area under the precision-recall
    curve by the step-function convention every retrieval library uses):

        AP = (1/n⁺) Σ_{k : y_(k)=1} precision@k

    over the ranking by score DESC.  Ties are broken by `id_col` ASC —
    an explicit total order, because AP (unlike the rank-sum AUC) is NOT
    tie-invariant and an unpinned tie order would make the result
    nondeterministic across engines and shuffles.  The id tie-break is
    part of the operator's contract, stated here so the oracle can (and
    does) encode the identical order.

    PR-AUC is the right eval when positives are rare (class-imbalanced
    quality labels, contamination flags): ROC AUC saturates near 1 while
    AP still moves with the top of the ranking.

    NULL scores/labels are excluded; a group with zero positives yields
    NULL (undefined, matching the macro-average-with-care convention —
    filter or coalesce downstream as policy dictates).

    Output: group cols + (n BIGINT, n_pos BIGINT, ap) rounded.

    Shape: ONE per-group window sort (row_number + running positive
    count share the same sort) and one partial-combined agg to the
    group table — the mann_whitney/auc_roc shape exactly.  Fully
    SQL-expressible → hash-checked vs DuckDB.
    """
    from pyspark.sql.window import Window as W

    gcols = _group_cols(group_cols)
    s = F.col(score_col)
    y = F.col(label_col).cast("boolean")
    base = df.filter(s.isNotNull() & y.isNotNull()).select(
        *gcols,
        s.alias("__s"),
        y.cast("int").alias("__pos"),
        F.col(id_col).alias("__id"),
    )
    word = W.partitionBy(*gcols).orderBy(F.desc("__s"), F.asc("__id"))
    wrun = word.rowsBetween(W.unboundedPreceding, W.currentRow)
    ranked = base.select(
        *gcols,
        "__pos",
        F.row_number().over(word).cast("double").alias("__k"),
        F.sum("__pos").over(wrun).cast("double").alias("__cum_pos"),
    )
    agg = ranked.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__pos").cast("long").alias("n_pos"),
        F.sum(
            F.when(F.col("__pos") == 1, F.col("__cum_pos") / F.col("__k"))
        ).alias("__psum"),
    )
    ap = F.col("__psum") / F.nullif(F.col("n_pos").cast("double"), F.lit(0.0))
    return agg.select(
        *gcols, "n", "n_pos", F.round(ap, ndigits).alias("ap")
    )


def cohens_kappa(
    df: DataFrame,
    rater_a_col: str,
    rater_b_col: str,
    group_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group Cohen's kappa — chance-corrected agreement between two
    categorical labelings:

        κ = (p_o − p_e) / (1 − p_e),
        p_o = Σ_c p(a=c, b=c),   p_e = Σ_c p(a=c)·p(b=c)

    The inter-annotator-agreement number a labeling pipeline reports
    before trusting human (or LLM-judge) labels — raw percent agreement
    (p_o alone) overstates reliability whenever the label marginals are
    skewed, which labeled training data always is.

    Rows with a NULL on either side are excluded (a missing label is an
    unscored item, not a category).  Perfect chance agreement (p_e = 1:
    both raters constant) yields NULL via the guarded denominator —
    kappa is undefined there, not 0.

    Output: group cols + (n BIGINT, po, pe, kappa) rounded.

    Shape: ONE groupBy builds the (group, a, b) contingency cells; the
    marginal products ride a full-outer join of the two marginal tables
    OVER the cell table (category-count-sized, never row-count-sized) —
    the chi_square cell-table idiom.  Fully SQL-expressible →
    hash-checked vs DuckDB.
    """
    gcols = _group_cols(group_cols)
    a, b = F.col(rater_a_col), F.col(rater_b_col)
    cells = (
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(*gcols, a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    per_group = cells.groupBy(*gcols).agg(
        F.sum("__o").alias("__n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__o")).otherwise(0))
        .alias("__diag"),
    )
    ma = cells.groupBy(*gcols, F.col("__a").alias("__c")).agg(
        F.sum("__o").alias("__na")
    )
    mb = cells.groupBy(*gcols, F.col("__b").alias("__c")).agg(
        F.sum("__o").alias("__nb")
    )
    joint = ma.join(mb, [*gcols, "__c"], "full_outer").groupBy(*gcols).agg(
        F.sum(
            F.coalesce(F.col("__na"), F.lit(0)).cast("double")
            * F.coalesce(F.col("__nb"), F.lit(0)).cast("double")
        ).alias("__pe_num")
    )
    out = per_group.join(joint, gcols) if gcols else per_group.crossJoin(joint)
    n = F.col("__n").cast("double")
    po = F.col("__diag").cast("double") / n
    pe = F.col("__pe_num") / (n * n)
    kappa = (po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0))
    return out.select(
        *gcols,
        F.col("__n").cast("long").alias("n"),
        F.round(po, ndigits).alias("po"),
        F.round(pe, ndigits).alias("pe"),
        F.round(kappa, ndigits).alias("kappa"),
    )


def cramers_v(
    df: DataFrame,
    col_a: str,
    col_b: str,
    group_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """Per-group Cramér's V — the [0, 1]-normalized effect size of the
    chi-square association between two categorical columns:

        V = sqrt( (χ²/n) / min(r−1, c−1) )

    chi_square_independence answers "is there ANY dependence" (scales
    with n — at 100 TB everything is 'significant'); V answers "how
    strong", comparable across column pairs and table sizes, which is
    what a feature-redundancy or leakage audit actually ranks by.

    NULL categories are excluded.  A column with a single observed level
    (min(r−1, c−1) = 0) yields NULL via the guarded denominator.

    Output: group cols + (n BIGINT, levels_a BIGINT, levels_b BIGINT,
    chi2, v) rounded.

    Shape: identical to chi_square_independence with group columns
    threaded through the cell-table windows — one groupBy to cells,
    marginals over the cell table, one tiny final agg per group.  Fully
    SQL-expressible → hash-checked vs DuckDB.
    """
    from pyspark.sql.window import Window as W

    gcols = _group_cols(group_cols)
    cells = (
        df.filter(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(*gcols, F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    wa = W.partitionBy(*gcols, "__a")
    wb = W.partitionBy(*gcols, "__b")
    wall = W.partitionBy(*gcols)
    with_marg = cells.select(
        *gcols,
        "__a",
        "__b",
        F.col("__o").cast("double").alias("o"),
        F.sum("__o").over(wa).cast("double").alias("row_tot"),
        F.sum("__o").over(wb).cast("double").alias("col_tot"),
        F.sum("__o").over(wall).cast("double").alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    agg = with_marg.groupBy(*gcols).agg(
        # full-table chi2 from observed cells: sum_obs o^2/e - n (zero
        # cells contribute e; see chi_square_independence).
        (F.sum(F.col("o") * F.col("o") / e) - F.max(F.col("n"))).alias(
            "__chi2"
        ),
        F.count_distinct(F.col("__a")).alias("__ra"),
        F.count_distinct(F.col("__b")).alias("__rb"),
        F.max(F.col("n")).alias("__n"),
    )
    mindim = F.least(F.col("__ra") - 1, F.col("__rb") - 1).cast("double")
    v = F.sqrt(
        (F.col("__chi2") / F.col("__n"))
        / F.nullif(mindim, F.lit(0.0))
    )
    return agg.select(
        *gcols,
        F.col("__n").cast("long").alias("n"),
        F.col("__ra").cast("long").alias("levels_a"),
        F.col("__rb").cast("long").alias("levels_b"),
        F.round(F.col("__chi2"), ndigits).alias("chi2"),
        F.round(v, ndigits).alias("v"),
    )


def anova_oneway(
    df: DataFrame,
    value_col: str,
    group_col: str,
    family_cols: str | list[str] | None = None,
    ndigits: int = 6,
) -> DataFrame:
    """One-way ANOVA F statistic per family — does the mean of
    `value_col` differ across the levels of `group_col`?  The k-group
    generalization of welch_ttest's question (classic equal-variance
    form), run per `family_cols` slice:

        F = (SSB / (k−1)) / (SSW / (N−k)),
        SSB = Σ_g n_g (m_g − m)²,   SSW = Σ_g (Σx²_g − n_g m_g²)

    computed from per-(family, level) sufficient statistics (n, Σx, Σx²)
    — no second data pass, no residual materialization.  Also reports
    eta² = SSB / (SSB + SSW), the effect size (share of variance
    explained by the grouping), which survives the everything-is-
    significant problem at scale the same way cramers_v does for
    categorical pairs.

    NULL values are excluded.  Degenerate families — fewer than two
    levels, or zero within-group variance (SSW = 0, e.g. constant
    values) — yield NULL F via guarded denominators; eta² is still
    reported when defined.

    Output: family cols + (k BIGINT, n BIGINT, f_stat, eta_sq) rounded.

    Shape: TWO stacked partial-combined aggs — rows → (family, level)
    sufficient stats → family table.  The first exchange carries three
    doubles per (family, level); the second is level-count-sized.
    Fully SQL-expressible → hash-checked vs DuckDB.
    """
    fcols = _group_cols(family_cols)
    x = F.col(value_col).cast("double")
    per_level = (
        df.filter(x.isNotNull() & F.col(group_col).isNotNull())
        .groupBy(*fcols, F.col(group_col).alias("__g"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("__ng"),
            F.sum(x).alias("__sg"),
            F.sum(x * x).alias("__ssg"),
        )
    )
    mg = F.col("__sg") / F.col("__ng")
    fam = per_level.groupBy(*fcols).agg(
        F.count(F.lit(1)).alias("__k"),
        F.sum("__ng").alias("__n"),
        F.sum("__sg").alias("__s"),
        F.sum(F.col("__ng") * mg * mg).alias("__sum_nm2"),
        F.sum(F.col("__ssg") - F.col("__ng") * mg * mg).alias("__ssw"),
    )
    grand_mean = F.col("__s") / F.col("__n")
    ssb = F.col("__sum_nm2") - F.col("__n") * grand_mean * grand_mean
    ssw = F.col("__ssw")
    k = F.col("__k").cast("double")
    nn = F.col("__n")
    f_stat = (ssb / F.nullif(k - 1.0, F.lit(0.0))) / F.nullif(
        ssw / F.nullif(nn - k, F.lit(0.0)), F.lit(0.0)
    )
    eta = ssb / F.nullif(ssb + ssw, F.lit(0.0))
    return fam.select(
        *fcols,
        F.col("__k").cast("long").alias("k"),
        F.col("__n").cast("long").alias("n"),
        F.round(f_stat, ndigits).alias("f_stat"),
        F.round(eta, ndigits).alias("eta_sq"),
    )
