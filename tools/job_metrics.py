#!/usr/bin/env python3
"""Per-stage empirical breakdown of one query run (guide §1.1/§7.1).

Runs QUERIES[name] once (after optional warmups) and dumps, from the
Spark UI REST API, every job/stage triggered by the timed run: task
counts, durations, shuffle read/write bytes, input bytes. This is the
"open the Stages tab" loop in headless form: it answers where the wall
time of an sf0.1 query actually goes (task dispatch? shuffle? compute?)
before any optimization is attempted.

Usage: python3 tools/job_metrics.py --query dup_clusters [--sf DIR]
           [--warmup 1] [--out /tmp/metrics.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", required=True, help="name or comma-list")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from opendosm_parquet_to_sqlite_spark.caching import release_cached
    from opendosm_parquet_to_sqlite_spark.plans.queries import (
        QUERIES,
        ensure_ivf_index,
    )
    from opendosm_parquet_to_sqlite_spark.session import get_spark

    spark = get_spark(app_name=f"job_metrics_{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    ensure_ivf_index(spark, args.sf, quantize=True)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/{path}"
        ) as r:
            return json.load(r)

    results = []
    for qname in args.query.split(","):
        results.append(profile_one(
            spark, qname, args, rest, release_cached, QUERIES))
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            json.dump(results, f, indent=1)


def profile_one(spark, qname, args, rest, release_cached, QUERIES):
    def run_one() -> float:
        t0 = time.perf_counter()
        df = QUERIES[qname](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for _ in range(args.warmup):
        run_one()
        release_cached()
    jobs_before = {j["jobId"] for j in rest("jobs")}
    wall = run_one()
    release_cached()
    jobs = [j for j in rest("jobs") if j["jobId"] not in jobs_before]
    stages = {s["stageId"]: s for s in rest("stages")}
    rows = []
    tot = {
        "n_jobs": len(jobs), "n_stages": 0, "n_tasks": 0,
        "executorRunTime_ms": 0, "shuffle_read_mb": 0.0,
        "shuffle_write_mb": 0.0, "input_mb": 0.0,
        "stage_wall_ms": 0,
    }
    for j in sorted(jobs, key=lambda x: x["jobId"]):
        for sid in j["stageIds"]:
            s = stages.get(sid)
            if not s or s["status"] == "SKIPPED":
                continue
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                t0 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                t1 = datetime.strptime(s["completionTime"], fmt)
                dur = (t1 - t0).total_seconds() * 1000
            rows.append({
                "job": j["jobId"],
                "stage": sid,
                "tasks": s["numCompleteTasks"],
                "wall_ms": round(dur or 0),
                "exec_ms": s["executorRunTime"],
                "in_mb": round(s["inputBytes"] / 1e6, 2),
                "sr_mb": round(s["shuffleReadBytes"] / 1e6, 2),
                "sw_mb": round(s["shuffleWriteBytes"] / 1e6, 2),
                "name": s["name"][:60],
            })
            tot["n_stages"] += 1
            tot["n_tasks"] += s["numCompleteTasks"]
            tot["executorRunTime_ms"] += s["executorRunTime"]
            tot["stage_wall_ms"] += round(dur or 0)
            tot["shuffle_read_mb"] += s["shuffleReadBytes"] / 1e6
            tot["shuffle_write_mb"] += s["shuffleWriteBytes"] / 1e6
            tot["input_mb"] += s["inputBytes"] / 1e6
    for k in ("shuffle_read_mb", "shuffle_write_mb", "input_mb"):
        tot[k] = round(tot[k], 2)
    out = {"query": qname, "wall_sec": round(wall, 3),
           "totals": tot, "stages": rows}
    print(json.dumps({k: out[k] for k in ("query", "wall_sec", "totals")}))
    spark._jvm.System.gc()
    return out


if __name__ == "__main__":
    main()
