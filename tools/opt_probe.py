#!/usr/bin/env python3
"""Isolated per-query optimization probe (round-13 tooling).

For each named query: fresh-JVM semantics are up to the caller (run one
probe per process for full isolation); inside the process it times
`QUERIES[name](spark, sf_dir)` + noop write with N warmups and R timed
runs, reports the median, and optionally dumps `.explain("formatted")`
to a file (the plans/r13 deliverable).

Usage:
  python3 tools/opt_probe.py --queries a,b,c [--sf DIR] [--warmup 2]
      [--runs 3] [--explain-dir plans/r13 --suffix before]
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
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from opendosm_parquet_to_sqlite_spark.caching import release_cached
    from opendosm_parquet_to_sqlite_spark.plans.queries import (
        QUERIES,
        ensure_ivf_index,
    )
    from opendosm_parquet_to_sqlite_spark.session import get_spark

    names = args.queries.split(",")
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="opt_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(f"{args.sf}/{t}.parquet").limit(1).count()
        except Exception:
            pass
    ensure_ivf_index(spark, args.sf, quantize=True)

    def run_one(name: str) -> float:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"opt_probe:{name}")
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = QUERIES[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(
                args.explain_dir, f"{name}_{args.suffix}.txt"
            )
            with open(path, "w", encoding="utf-8") as f:
                f.write(txt)
            release_cached()
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
        out[name] = {
            "median": round(med, 3),
            "min": round(reps[0], 3),
            "runs": [round(r, 3) for r in reps],
        }
        print(json.dumps({"query": name, **out[name]}), flush=True)
        spark._jvm.System.gc()
    print(json.dumps({"probe": out}))


if __name__ == "__main__":
    main()
