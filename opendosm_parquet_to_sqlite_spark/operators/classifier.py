"""Learned document-quality classifier: hashing-trick bag-of-words +
logistic regression trained as Spark DataFrame aggregations (north-star M5).

The production pattern (fastText-style quality filters a la CCNet/GPT-3:
train a linear text classifier on weak labels, score the whole corpus, gate
on the score) expressed Spark-first:

- featurize: tokenize -> xxhash64 -> pmod into 2^b buckets -> (doc, bucket,
  log1p(count)) sparse rows. Pure narrow maps + one keyed partial agg; the
  hashing trick means NO vocabulary pass, no driver-side dictionary, and a
  fixed-width model whatever the corpus size.
- train: full-batch gradient descent where each iteration is ONE Spark job:
  margins via a broadcast join of the (2^b)-row weight table, per-doc
  sigmoid residuals, then a bucket-keyed partial aggregation of x*residual
  — the gradient — collected to the driver (2^b doubles, model-sized, not
  corpus-sized) for the update. The feature frame is hash-partitioned by
  doc_id ONCE and persist_tracked, so every iteration's doc-side join
  reuses the same partitioning instead of re-shuffling the corpus.
- score: same broadcast-join margin, sigmoid, no shuffle beyond the
  pre-partitioned features.

pyspark.ml.classification.LogisticRegression would also fit here; the
hand-rolled loop keeps the whole pipeline in DataFrame algebra (exactly
mirrorable in NumPy for the test oracle, like the distributed k-means
trainer in similarity.py) and avoids materializing MLlib vector columns.

Weak labels come from any upstream signal — the registered demo distills
the heuristic text.quality_score gate into a learnable scorer, the
standard bootstrap when no human labels exist.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import persist_tracked
from .text import tokens


def hashed_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """(doc_id, bucket, x): sparse hashed bag-of-words, x = log1p(tf).

    log1p tames Zipfian token counts (a 100-repeat token is ~5x a
    single occurrence, not 100x). Empty docs yield no rows — the scorer
    gives them bias-only scores."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("t"),
    )
    return (
        toks.select(
            "doc_id",
            F.pmod(F.xxhash64(F.lower("t")), F.lit(n_buckets))
            .cast("long")
            .alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.log1p(F.count(F.lit(1))).alias("x"))
    )


def _margins(feats: DataFrame, w: np.ndarray, bias: float) -> DataFrame:
    """(doc_id, margin) via broadcast join of the model-sized weight table.

    sum() order inside a doc's partition varies with partitioning — scores
    are reproducible to float dust, which the 6-dp output round absorbs."""
    spark = feats.sparkSession
    wdf = F.broadcast(
        spark.createDataFrame(
            [(int(b), float(x)) for b, x in enumerate(w)],
            schema="bucket long, w double",
        )
    )
    return (
        feats.join(wdf, "bucket")
        .groupBy("doc_id")
        .agg((F.sum(F.col("x") * F.col("w")) + F.lit(bias)).alias("margin"))
    )


def train_logreg(
    feats: DataFrame,
    labels: DataFrame,
    n_buckets: int,
    n_iters: int = 10,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> tuple[np.ndarray, float]:
    """Full-batch GD on log-loss; returns (weights[n_buckets], bias).

    labels: (doc_id, y) with y in {0,1}. Each iteration runs one Spark
    job whose only driver-sized artifact is the 2^b-double gradient. The
    update uses mean gradients (1/n) so lr is corpus-size-independent,
    and L2 excludes the bias (standard).

    The doc-keyed partition count is pinned to defaultParallelism (the
    core count), not spark.sql.shuffle.partitions: the loop touches the
    persisted frame 2x per iteration, so per-partition task overhead
    multiplies by 2*n_iters — with the 200-partition default a small
    training set spends more time scheduling than computing (measured
    ~3x end-to-end on the sf0.01 demo)."""
    par = feats.sparkSession.sparkContext.defaultParallelism
    feats = persist_tracked(feats.repartition(par, "doc_id"))
    labels = persist_tracked(labels.select("doc_id", F.col("y").cast("double")))
    n = labels.count()
    if n == 0:
        raise ValueError("no labeled rows — cannot train")
    # ONE action per iteration (round-14 opt, guide §2.6): the bias
    # gradient Σr used to be a second collect whose job re-executed the
    # whole resid subtree (margins broadcast join + label join) — two
    # sequential driver round-trips per iteration. Appending a synthetic
    # bias feature (bucket −1, x = 1) for every LABELED doc folds Σr
    # into the same per-bucket aggregation (g[−1] = Σ 1·r ≡ Σr, and docs
    # without real features still carry their bias row because resid is
    # label-anchored), so each iteration is exactly one job over one
    # resid execution. Float-sum order for Σr moves from a single-frame
    # agg to the partial-agg combine — same 1e-9 NumPy-parity envelope
    # the tests pin (the consuming queries are rows-only).
    bias_rows = labels.select(
        "doc_id",
        F.lit(-1).cast("long").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    feats_aug = feats.select("doc_id", "bucket", "x").unionByName(bias_rows)
    w = np.zeros(n_buckets)
    bias = 0.0
    for _ in range(n_iters):
        resid = (
            _margins(feats, w, bias)
            .join(labels, "doc_id", "right")  # docs w/o features: bias-only
            .select(
                "doc_id",
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-F.coalesce("margin", F.lit(bias))))
                    - F.col("y")
                ).alias("r"),
            )
        )
        grad_rows = (
            feats_aug.join(resid, "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
            .collect()
        )
        g = np.zeros(n_buckets)
        g_bias = 0.0
        for row in grad_rows:
            if row["bucket"] < 0:
                g_bias = row["g"]
            else:
                g[row["bucket"]] = row["g"]
        w -= lr * (g / n + l2 * w)
        bias -= lr * (g_bias / n)
    return w, bias


def score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    w: np.ndarray,
    bias: float,
    n_buckets: int | None = None,
) -> DataFrame:
    """(doc_id, score, pred): sigmoid quality score for every row of `df`
    (docs with no tokens score sigmoid(bias))."""
    nb = n_buckets or len(w)
    feats = hashed_features(df, text_col, id_col, nb)
    margins = _margins(feats, w, bias)
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(margins, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-F.coalesce("margin", F.lit(float(bias))))),
                6,
            ).alias("score"),
        )
        .withColumn("pred", (F.col("score") >= 0.5).cast("int"))
    )


def distill_quality_gate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label_col,
    n_buckets: int = 1024,
    n_iters: int = 10,
) -> DataFrame:
    """Train on weak labels from `label_col` (a boolean/0-1 Column over
    `df`) and score every document — heuristic-to-model distillation in
    one call. Two corpus passes per iteration + one scoring pass."""
    feats = hashed_features(df, text_col, id_col, n_buckets)
    labels = df.select(
        F.col(id_col).alias("doc_id"), label_col.cast("int").alias("y")
    )
    w, bias = train_logreg(feats, labels, n_buckets, n_iters=n_iters)
    return score(df, text_col, id_col, w, bias, n_buckets)


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    ndigits: int = 6,
) -> DataFrame:
    """Reliability-diagram table + expected calibration error for a
    probabilistic scorer (the quality classifier, a reward model, any
    [0,1] score): scores bucket into `n_bins` equal-width bins; each bin
    reports mean predicted score (confidence) vs empirical positive rate
    (accuracy); every row carries the overall ECE
    Σ_b (n_b/N)·|acc_b − conf_b| — the number a score consumer checks
    before trusting thresholds.

    Scores outside [0, 1] raise via an assert embedded in the bin
    column itself (the merge_plan idiom: when(assert_true(ok) is null,
    bin) — a standalone guard column would be pruned by Catalyst; a
    silent clamp would fake calibration). Score exactly 1.0 joins the
    top bin (floor guard). NULL scores/labels are excluded pairwise.

    Shape: narrow bin projection → ONE partial-combined (bin) agg
    (≤ n_bins rows) → window ECE over the bin table. Hash-checkable.

    Output per bin: (bin BIGINT, n BIGINT, confidence, accuracy, ece).
    """
    from pyspark.sql.window import Window as W

    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    guard = F.assert_true(
        (s >= 0.0) & (s <= 1.0), F.lit("calibration_report: score outside [0, 1]")
    )
    b_raw = F.least(
        F.floor(s * int(n_bins)), F.lit(int(n_bins) - 1)
    ).cast("long")
    b = F.when(guard.isNull(), b_raw)
    bins = (
        df.filter(s.isNotNull() & y.isNotNull())
        .select(b.alias("bin"), s.alias("__s"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__s").alias("__conf"),
            F.avg("__y").alias("__acc"),
        )
    )
    wall = W.partitionBy()
    ece = F.sum(
        F.col("n") * F.abs(F.col("__acc") - F.col("__conf"))
    ).over(wall) / F.sum("n").over(wall)
    return bins.select(
        "bin",
        "n",
        F.round("__conf", ndigits).alias("confidence"),
        F.round("__acc", ndigits).alias("accuracy"),
        F.round(ece, ndigits).alias("ece"),
    )


def label_noise_candidates(
    df: DataFrame,
    id_col: str,
    label_col: str,
    score_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Confident-learning label-noise screen [Northcutt et al. 2021,
    binary instantiation] — the label-quality pass a weak-label training
    set needs before the labels are trusted: an example is a NOISE
    CANDIDATE when the model is confidently on the other side of its
    given label, where "confidently" is calibrated per class from the
    data itself (no fixed 0.5 threshold — a skewed or miscalibrated
    scorer moves both bars together):

        t1 = mean score among examples LABELED 1   (class-1 self-confidence)
        t0 = mean (1−score) among examples LABELED 0

        label 0, score     ≥ t1  → candidate, suggested_label 1
        label 1, 1−score   ≥ t0  → candidate, suggested_label 0

    Output: (id, label, score, suggested_label, margin) for candidates
    only — margin is how far past the class bar the score sits (rank by
    it for a fixed relabeling budget). NULL labels/scores drop.

    Shape: ONE partial-combined agg for the two class means (2-row
    broadcast back), then a narrow filter — the corpus never shuffles.
    Fully SQL-expressible → hash-checked vs DuckDB.
    """
    s = F.col(score_col).cast("double")
    lab = F.col(label_col).cast("int")
    base = df.filter(
        s.isNotNull() & lab.isin(0, 1)
    ).select(F.col(id_col), lab.alias("label"), s.alias("score"))
    bars = base.agg(
        F.avg(F.when(F.col("label") == 1, F.col("score"))).alias("t1"),
        F.avg(
            F.when(F.col("label") == 0, 1.0 - F.col("score"))
        ).alias("t0"),
    )
    joined = base.crossJoin(F.broadcast(bars))
    flips_up = (F.col("label") == 0) & F.col("t1").isNotNull() & (
        F.col("score") >= F.col("t1")
    )
    flips_down = (F.col("label") == 1) & F.col("t0").isNotNull() & (
        (1.0 - F.col("score")) >= F.col("t0")
    )
    margin = F.when(
        flips_up, F.col("score") - F.col("t1")
    ).otherwise((1.0 - F.col("score")) - F.col("t0"))
    return (
        joined.filter(flips_up | flips_down)
        .select(
            id_col,
            "label",
            F.round("score", ndigits).alias("score"),
            F.when(flips_up, F.lit(1)).otherwise(F.lit(0)).alias(
                "suggested_label"
            ),
            F.round(margin, ndigits).alias("margin"),
        )
    )


def _pav(rates: list[float], weights: list[float]) -> list[float]:
    """Pool-adjacent-violators: the isotonic (non-decreasing) weighted
    least-squares fit to `rates`. Classic stack formulation: each block
    carries (weighted mean, weight); a new block merges backward while
    it violates monotonicity. O(n); deterministic."""
    blocks: list[list[float]] = []  # [mean, weight, count]
    for r, w in zip(rates, weights):
        blocks.append([r, w, 1])
        while len(blocks) > 1 and blocks[-2][0] > blocks[-1][0]:
            m2, w2, c2 = blocks.pop()
            m1, w1, c1 = blocks.pop()
            wt = w1 + w2
            blocks.append([(m1 * w1 + m2 * w2) / wt, wt, c1 + c2])
    out: list[float] = []
    for m, _, c in blocks:
        out.extend([m] * c)
    return out


def calibrate_isotonic(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 100,
    ndigits: int = 6,
) -> DataFrame:
    """Isotonic score calibration (binned PAV) — the monotone
    recalibration step a scorer gets AFTER calibration_report says its
    probabilities drift: fit the best non-decreasing map from score to
    empirical positive rate and return the per-bin calibration table
    (bin, n, confidence, rate, calibrated) a serving layer joins
    against.

    Exact per-row PAV needs a global sort of every (score, label) pair;
    binning first makes the sufficient statistics a ≤ n_bins-row table
    — per-bin (count, positive rate, mean score) — and PAV over the
    bins is the isotonic fit to the data weighted by bin mass (the
    standard large-scale recipe; resolution is the bin width, which is
    the knob). Scores outside [0, 1] raise (the calibration_report
    guard idiom); NULL scores/labels are excluded pairwise.

    Shape: narrow bin projection → ONE partial-combined (bin) agg →
    ≤ n_bins-row driver collect (model-sized by construction) → PAV in
    plain Python → the result ships back as a ≤ n_bins-row DataFrame.
    The corpus never shuffles; the only exchange carries bin partials.
    Rows-only driver check (PAV is not SQL-expressible); pytest pins
    exact parity vs the pure-Python fit, monotonicity, and weighted-
    mass preservation.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    guard = F.assert_true(
        (s >= 0.0) & (s <= 1.0),
        F.lit("calibrate_isotonic: score outside [0, 1]"),
    )
    b_raw = F.least(
        F.floor(s * int(n_bins)), F.lit(int(n_bins) - 1)
    ).cast("long")
    b = F.when(guard.isNull(), b_raw)
    rows = (
        df.filter(s.isNotNull() & y.isNotNull())
        .select(b.alias("bin"), s.alias("__s"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("__s").alias("__conf"),
            F.avg("__y").alias("__rate"),
        )
        .orderBy("bin")
        .collect()  # ≤ n_bins rows — bounded by construction
    )
    fitted = _pav([r["__rate"] for r in rows], [float(r["n"]) for r in rows])
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (
                int(r["bin"]),
                int(r["n"]),
                round(r["__conf"], ndigits),
                round(r["__rate"], ndigits),
                round(c, ndigits),
            )
            for r, c in zip(rows, fitted)
        ],
        "bin long, n long, confidence double, rate double, "
        "calibrated double",
    )
