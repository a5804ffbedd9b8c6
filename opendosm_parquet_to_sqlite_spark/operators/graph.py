"""Distributed connected components — the Spark-native union-find.

The standard large-scale dedup semantics (MinHashLSH / C4 / GPT-3 style)
cluster near-duplicate PAIRS into components and keep one document per
component. A greedy per-pair drop (remove id_b of every pair) over-deletes:
for pairs (A,B), (B,C) with A≁C it keeps only A even though C duplicates
nothing that survives. Component semantics keep exactly one doc per
connected component of the similarity graph.

No Spark primitive exists (GraphX is RDD/Scala-only and GraphFrames is an
external package), so this is iterative min-label propagation with pointer
jumping, expressed as DataFrame joins:

- propagate: label(v) <- min(label(v), min label among v's neighbors)
  — one shuffle join (edges x labels) + one min-aggregate per round.
- pointer jump: label(v) <- label(label(v)) — a self-join that halves the
  depth of label chains, turning O(diameter) convergence into
  O(log diameter) (the alternating small/large-star trick from the
  MapReduce connected-components literature).

Scale shape: the edge list is the near-dup PAIR set — orders of magnitude
smaller than the corpus (docs in no pair never enter the graph; they are
implicit singletons). Each round shuffles only (node, label) longs. Lineage
is truncated every round with an eager localCheckpoint, so the plan does
not grow with iterations (the classic iterative-algorithm trap). The
convergence check (count of changed labels) is the per-round action that
materializes the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(doc_id, cluster_id) for every node appearing in `edges`.

    cluster_id is the MINIMUM node id of the component — deterministic,
    partitioning-independent, and directly usable as the canonical
    representative (the kept document in dedup).

    Raises RuntimeError if labels have not converged after max_iter rounds
    (with pointer jumping, max_iter=20 covers components of diameter
    ~2^20 — any real similarity graph converges in a handful of rounds).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Materialize the symmetric edge list ONCE: it is consumed every round,
    # and the upstream pair pipeline (e.g. the whole inverted-index Jaccard
    # DAG) must not re-execute per iteration.
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(max_iter):
        nbr_min = sym.join(
            labels.select(F.col("node").alias("v"), "label"), "v"
        ).select(F.col("u").alias("node"), "label")
        merged = (
            labels.unionByName(nbr_min)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: follow label -> label(label); every label value is
        # itself a node, so the lookup join always resolves (left + coalesce
        # is belt-and-braces for the self-label case).
        lookup = merged.select(
            F.col("node").alias("__ln"), F.col("label").alias("__ll")
        )
        jumped = (
            merged.join(lookup, merged["label"] == lookup["__ln"], "left")
            .select("node", F.coalesce("__ll", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        # isEmpty short-circuits at the FIRST changed row (take(1) under
        # the hood) — non-final rounds stop scanning immediately, only the
        # converged final round pays a full pass. The check doubles as the
        # action materializing this round's eager checkpoint.
        converged = (
            jumped.select("node", F.col("label").alias("__new"))
            .join(labels, "node")
            .filter(F.col("__new") != F.col("label"))
            .isEmpty()
        )
        labels = jumped
        if converged:
            return labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def cluster_representatives(components: DataFrame) -> DataFrame:
    """Distinct (cluster_id) representative set = the kept doc per cluster.

    Because cluster_id IS the min member id, the representative table is
    just the distinct labels — no extra aggregation over members.
    """
    return components.select(
        F.col("cluster_id").alias("doc_id")
    ).distinct()
