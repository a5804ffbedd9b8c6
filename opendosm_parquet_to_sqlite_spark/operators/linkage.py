"""Probabilistic record linkage (entity resolution) — blocked candidate
pairs scored by weighted field similarity, the Fellegi–Sunter shape every
data-integration pipeline runs before a golden-record merge.

The dedup family (operators/dedup.py, neardup.py) answers "same TEXT?";
linkage answers "same ENTITY?" across records whose fields each carry
partial, noisy evidence — a name that almost matches, a balance that
nearly agrees, a segment that matches exactly. No reference analog
(src/main.rs has no multi-field matching); SURVEY §2.13 extension.

Scale design: candidates come ONLY from equi-joins inside caller-chosen
blocks — never an all-pairs product. Pair volume is Σ_b n_b², so the
block key choice (plus the `max_block` hot-block cap, same idiom as
dedup_levenshtein's prefix blocks) is the declared scale lever. The
similarity math is all JVM expressions (levenshtein, abs, greatest) —
no Python in the pair loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

FIELD_KINDS = ("string", "exact", "numeric")

# Within-block pair-volume cap the valve enforces by default — the same
# 50M figure as mediadedup.DEFAULT_MAX_PAIRS (its exact-dup clique valve
# closed the identical hazard in round 11). ~10k rows in one hot block is
# the break-even: C(10k, 2) ≈ 50M.
DEFAULT_MAX_PAIRS = 50_000_000


def _check_block_pair_volume(
    base: DataFrame, block_cols: list[str], max_pairs: int
) -> None:
    """The max_pairs safety valve: compute the EXACT pair volume of the
    HOTTEST block — max_b c_b·(c_b−1)/2 over non-NULL block keys — and
    refuse to build the pair plan when any single block exceeds the cap.
    A degenerate block key (constant, NULL-ish placeholder, or a
    fixed-width band whose occupancy grows with n) concentrates the
    volume in single blocks quadratically with no error; the valve turns
    that silent blow-up into a fail-fast.

    Scoped PER BLOCK, not to the total (round-13 sf10 lesson): a healthy
    occupancy-bounded layout (scaled_numeric_band) has pair volume
    LINEAR in n — diffuse volume grows with data by design and crossing
    a fixed total is not a hazard, it is the workload. The hazard the
    valve exists for is the quadratic single block, and that property is
    scale-invariant: occupancy-bounded layouts pass at any corpus size,
    while a planted hot block trips regardless of what the rest of the
    table looks like. One block-keyed count + scalar agg
    (partial-combined, no pair row ever built); runs eagerly, which is
    the point of a valve. NULL block keys are excluded — they never pair
    (NULL equality is false, the operator's stated contract)."""
    nonnull = base
    for c in block_cols:
        nonnull = nonnull.filter(F.col(c).isNotNull())
    row = (
        nonnull.groupBy(*block_cols)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.max(F.col("c") * (F.col("c") - 1) / 2).alias("hot"),
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("total"),
        )
        .first()
    )
    hot = int(row["hot"] or 0)
    if hot > int(max_pairs):
        raise ValueError(
            f"hottest block's pair volume {hot} exceeds max_pairs="
            f"{int(max_pairs)} (total within-block volume "
            f"{int(row['total'] or 0)}): a hot block makes "
            f"record_linkage's candidate output quadratic in block "
            f"size. Tighten the block key — for numeric bands use "
            f"scaled_numeric_band (data-scaled width, the "
            f"record_linkage_scaled parameterization) — or cap hot "
            f"blocks with max_block; pass max_pairs=None to explicitly "
            f"accept the volume."
        )


def _field_sim(kind: str, a: Column, b: Column) -> Column:
    """Similarity in [0, 1], or NULL when either side is NULL (missing =
    no evidence; the field drops out and its weight is renormalized away,
    the Fellegi–Sunter missing-data convention)."""
    defined = a.isNotNull() & b.isNotNull()
    if kind == "string":
        sim = F.lit(1.0) - F.levenshtein(a, b) / F.greatest(
            F.length(a), F.length(b), F.lit(1)
        ).cast("double")
    elif kind == "exact":
        sim = F.when(a == b, 1.0).otherwise(0.0)
    elif kind == "numeric":
        ax, bx = F.abs(a.cast("double")), F.abs(b.cast("double"))
        sim = F.when(
            (a.cast("double") == 0.0) & (b.cast("double") == 0.0), 1.0
        ).otherwise(
            F.greatest(
                F.lit(0.0),
                F.lit(1.0)
                - F.abs(a.cast("double") - b.cast("double"))
                / F.greatest(ax, bx),
            )
        )
    else:
        raise ValueError(f"kind must be one of {FIELD_KINDS}, got {kind!r}")
    return F.when(defined, sim)


def scaled_numeric_band(
    df: DataFrame,
    col: str,
    target_occupancy: int = 64,
    out_col: str = "band",
    scale: int = 100,
) -> DataFrame:
    """Append a DATA-SCALED integer banding column for numeric blocking —
    the scale-safe replacement for a fixed band width.

    A fixed width (`floor(x / 500)`) is a quadratic time bomb: the value
    RANGE is a property of the domain, not the table, so the band count
    is constant and per-band occupancy — hence within-band pair volume,
    quadratically — grows with n. The sf1 probe measured exactly that:
    the fixed-dial record_linkage query ran 24.8× slower for 10× the
    rows. This helper derives the width from the table instead
    (width ∝ range/n, the sorted-neighborhood sizing rule): band count
    grows linearly with n, expected occupancy stays ~`target_occupancy`,
    and pair volume stays LINEAR in n at any scale.

    Engine-reproducible by construction: values are fixed-pointed to
    integers (`round(x·scale)` — `scale=100` for 2-decimal money), and
    the width derivation is pure bigint arithmetic on (count, min, max):

        n_bands = max(1, n div target_occupancy)
        width   = max(1, ceil_div(hi − lo + 1, n_bands))
        band    = (round(x·scale) − lo) div width

    so DuckDB restates it exactly (`//` floor-div on non-negative
    bigints == Spark `div`) and the banded query stays hash-checkable —
    no float width, no engine-specific rounding at band edges.

    Shape: one scalar aggregate (count/min/max — partial-combined, no
    keyed exchange) broadcast-cross-joined back onto the table; the
    banding itself is a narrow JVM expression. Lazy end to end — the
    stats live in the plan, not in a driver-side collect. NULL values
    get a NULL band (they never pair — the same NULL-block contract as
    record_linkage's equi-join).
    """
    fixed = F.round(F.col(col) * int(scale)).cast("long")
    stats = df.agg(
        F.count(fixed).alias("__band_n"),
        F.min(fixed).alias("__band_lo"),
        F.max(fixed).alias("__band_hi"),
    )
    # ceil_div(span, n_bands) via (span + n_bands − 1) div n_bands — one
    # integer division, so DuckDB's // restates it exactly
    n_bands_sql = f"greatest(cast(1 as bigint), __band_n div {int(target_occupancy)})"
    width_sql = (
        f"greatest(cast(1 as bigint), "
        f"(__band_hi - __band_lo + 1 + {n_bands_sql} - 1) div {n_bands_sql})"
    )
    banded = df.crossJoin(F.broadcast(stats)).withColumn(
        out_col,
        F.expr(
            f"(cast(round({col} * {int(scale)}) as bigint) - __band_lo) "
            f"div {width_sql}"
        ),
    )
    return banded.drop("__band_n", "__band_lo", "__band_hi")


def record_linkage(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[tuple[str, str, float]],
    threshold: float = 0.9,
    max_block: int | None = None,
    ndigits: int = 6,
    max_pairs: int | None = DEFAULT_MAX_PAIRS,
) -> DataFrame:
    """Score every within-block record pair by weighted field similarity
    and classify matches — self-linkage (dedup-shaped: id_a < id_b, each
    unordered pair once).

    `fields` = [(column, kind, weight)]:
      string  — 1 − levenshtein/max(len)     (edit-distance similarity)
      exact   — 1.0 / 0.0                    (categorical agreement)
      numeric — 1 − |a−b| / max(|a|, |b|)    (relative closeness,
                clipped at 0; 0-vs-0 is 1.0)

    score = Σ wᵢ·simᵢ / Σ wᵢ over the fields DEFINED for the pair
    (either side NULL → the field abstains and its weight leaves the
    denominator — missing data neither helps nor hurts).  All-fields-
    missing pairs get NULL score and NULL matched.  `matched` compares
    the ROUNDED score to `threshold` so the decision is reproducible
    across engines.

    Blocks: equi-join on `block_cols` (rows with a NULL block key never
    pair — NULL equality is false, stated contract).  `max_block` drops
    blocks with more rows than the cap BEFORE the join (window count on
    the block key) — the skew guard for degenerate keys; dropped volume
    is the caller's to monitor via block_stats-style preflight.

    `max_pairs` is the default-ON hot-block valve (50M, same figure and
    idiom as mediadedup's exact-dup clique valve): the exact pair volume
    of the HOTTEST block — max over blocks of c·(c−1)/2 — is computed
    eagerly (after any `max_block` filter) and the operator raises —
    steering to scaled_numeric_band / max_block — rather than build a
    quadratic candidate plan. Per-block rather than total (round-13):
    an occupancy-bounded blocking's TOTAL volume is linear in n and
    grows with data by design — that is the workload, not the hazard;
    the scale-invariant hazard is the single quadratic block, and only
    that trips the valve. Pass `max_pairs=None` to explicitly accept
    unbounded per-block volume (the legacy fixed-band
    parameterization's documented escape hatch).

    Output: (id_a, id_b, sim_<col> per field, score, matched) — pair
    rows, sims rounded.

    Shape: one hash exchange of the record table on the block key (both
    sides of the self-join share it), the pair predicate id_a < id_b
    halves the output, and every similarity is a JVM scalar expression
    on the joined row — no UDFs, no second corpus exchange. Fully
    SQL-expressible → hash-checked vs DuckDB.
    """
    for _, kind, _ in fields:
        if kind not in FIELD_KINDS:
            raise ValueError(
                f"kind must be one of {FIELD_KINDS}, got {kind!r}"
            )
    if not fields:
        raise ValueError("fields must be non-empty")
    keep = [id_col, *block_cols, *[c for c, _, _ in fields]]
    base = df.select(*dict.fromkeys(keep))
    if max_block is not None:
        wblock = Window.partitionBy(*block_cols)
        base = (
            base.withColumn("__bn", F.count(F.lit(1)).over(wblock))
            .filter(F.col("__bn") <= int(max_block))
            .drop("__bn")
        )
    if max_pairs is not None:
        _check_block_pair_volume(base, block_cols, max_pairs)
    # The build side broadcasts (record tables are dim-sized relative to
    # the pair volume they generate); the PROBE side must carry the
    # parallelism — a freshly scanned single-file table arrives as one
    # input split, which would run every similarity on one task. The
    # block-keyed repartition is the operator's one declared exchange.
    a = base.repartition(*[F.col(c) for c in block_cols]).select(
        *[F.col(c).alias(f"__a_{c}") for c in base.columns]
    )
    b = base.select(
        *[F.col(c).alias(f"__b_{c}") for c in base.columns]
    )
    cond = [
        F.col(f"__a_{c}") == F.col(f"__b_{c}") for c in block_cols
    ] + [F.col(f"__a_{id_col}") < F.col(f"__b_{id_col}")]
    pairs = a.join(b, on=cond)
    sims = {
        c: _field_sim(kind, F.col(f"__a_{c}"), F.col(f"__b_{c}"))
        for c, kind, _ in fields
    }
    wsum = None
    ssum = None
    for c, _, w in fields:
        wterm = F.when(sims[c].isNotNull(), F.lit(float(w))).otherwise(0.0)
        sterm = F.coalesce(sims[c] * float(w), F.lit(0.0))
        wsum = wterm if wsum is None else wsum + wterm
        ssum = sterm if ssum is None else ssum + sterm
    score = F.round(
        F.try_divide(ssum, F.nullif(wsum, F.lit(0.0))), ndigits
    )
    return pairs.select(
        F.col(f"__a_{id_col}").alias("id_a"),
        F.col(f"__b_{id_col}").alias("id_b"),
        *[
            F.round(sims[c], ndigits).alias(f"sim_{c}")
            for c, _, _ in fields
        ],
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("matched"),
    )
