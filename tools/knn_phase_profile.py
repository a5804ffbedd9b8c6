#!/usr/bin/env python3
"""Phase-level breakdown of knn_clusters at a given fixture dir.

The sf10 probe showed the query total (353.8 s round 11) splits into a
~40 s component loop, a 3.2 s singleton fill, and ~310 s of kNN graph
BUILD — but the build itself is four distinct Spark shapes (bucket
explode+shuffle, per-bucket BLAS scoring, multi-table distinct, top-k
window). This tool materializes each boundary with a noop write so the
next optimization targets the measured phase, not a guess.

Usage: python3 tools/knn_phase_profile.py [--sf /tmp/sf1] [--k 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf1")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--n-tables", type=int, default=8)
    args = ap.parse_args()

    from opendosm_parquet_to_sqlite_spark.caching import (
        persist_tracked,
        release_cached,
    )
    from opendosm_parquet_to_sqlite_spark.operators import graph, similarity
    from opendosm_parquet_to_sqlite_spark.session import get_spark

    spark = get_spark(app_name="knn_phase_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    phases: dict[str, float] = {}

    def clock(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        phases[name] = round(time.perf_counter() - t0, 2)
        print(f"[phase] {name}: {phases[name]}s", file=sys.stderr)
        return out

    def noop(df):
        df.write.format("noop").mode("overwrite").save()
        return df

    emb = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])
    n = clock("count", lambda: emb.count())
    import math

    n_planes = max(0, math.ceil(math.log2(max(n, 1) / 512)))
    print(f"n={n} dim={dim} planes={n_planes} "
          f"E[bucket]={n / (1 << n_planes):.0f}", file=sys.stderr)

    # phase 1: bucket explode + shuffle + BLAS scoring + distinct
    pairs = persist_tracked(
        similarity.lsh_cosine_pairs(
            emb, -1.0, dim, n_planes=n_planes, n_tables=args.n_tables,
            per_node_topk=args.k,
        )
    )
    clock("pairs_score", lambda: noop(pairs))

    # phase 2: symmetrize + top-k window (knn_graph's tail)
    from pyspark.sql.window import Window as W

    directed = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "cosine"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "cosine"
        )
    )
    w = W.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst"))
    knn = (
        directed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= args.k)
    )
    edges = persist_tracked(knn.select("src", "dst"))
    clock("topk_window", lambda: noop(edges))

    # phase 3: reciprocity semi-join
    mutual = persist_tracked(
        edges.join(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            ["src", "dst"],
            "left_semi",
        ).filter(F.col("src") < F.col("dst"))
    )
    clock("mutual_semijoin", lambda: noop(mutual))

    # phase 4: connected components (CC_DEBUG prints per-round times)
    comps = clock(
        "components",
        lambda: noop(graph.connected_components(mutual, src="src", dst="dst")),
    )

    # phase 5: singleton fill
    labeled = comps.select(
        F.col("doc_id").alias("node"), F.col("cluster_id").alias("cluster")
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    clock(
        "singleton_fill",
        lambda: noop(
            nodes.join(labeled, "node", "left").select(
                "node",
                F.coalesce(F.col("cluster"), F.col("node")).alias("cluster"),
            )
        ),
    )

    release_cached()
    phases["total"] = round(sum(phases.values()), 2)
    print(json.dumps({"sf_dir": args.sf, "n": n, "planes": n_planes,
                      "phases": phases}))


if __name__ == "__main__":
    main()
