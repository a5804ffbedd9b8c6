#!/usr/bin/env python3
"""A/B experiment: one session conf vs default, same queries, medians.

Usage:
  python3 tools/opt_experiment.py --queries a,b --conf k=v[,k=v] \
      [--warmup 2] [--runs 3] [--sf DIR]

Run it twice (with and without --conf) in FRESH processes and compare.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--conf", default="")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from opendosm_parquet_to_sqlite_spark.caching import release_cached
    from opendosm_parquet_to_sqlite_spark.plans.queries import (
        QUERIES,
        ensure_ivf_index,
    )
    from opendosm_parquet_to_sqlite_spark.session import get_spark

    extra = {}
    if args.conf:
        for kv in args.conf.split(","):
            k, v = kv.split("=", 1)
            extra[k] = v
    spark = get_spark(app_name="opt_experiment", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    ensure_ivf_index(spark, args.sf, quantize=True)

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, args.sf).write.format("noop").mode(
            "overwrite").save()
        return time.perf_counter() - t0

    out = {}
    for name in args.queries.split(","):
        for _ in range(args.warmup):
            run_one(name)
            release_cached()
        reps = []
        for _ in range(args.runs):
            reps.append(run_one(name))
            release_cached()
        reps.sort()
        med = reps[len(reps) // 2] if len(reps) % 2 else (
            reps[len(reps) // 2 - 1] + reps[len(reps) // 2]) / 2
        out[name] = round(med, 3)
        print(json.dumps({"query": name, "median": out[name],
                          "runs": [round(r, 3) for r in reps]}), flush=True)
        spark._jvm.System.gc()
    print(json.dumps({"conf": extra, "medians": out}))


if __name__ == "__main__":
    main()
