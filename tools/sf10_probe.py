#!/usr/bin/env python3
"""sf10 micro-probe of the iterative family (round-9 verdict item 6).

The sf1 probe established 0.9-5.2x growth for 10x data across the suite;
the remaining scale question is whether the ITERATIVE operators (label
propagation, pointer jumping, kNN-graph compositions) hold one more
decade — their round counts could creep with diameter or density in a
way a single 10x step cannot reveal. This probe builds sf10 fixtures
(100x the driver's sf0.1, via the same deterministic replication as the
sf1 probe — tools/make_scale.py --replicas 100) and times the top-5
iterative queries by sf1 cost with the sf1 method (1 untimed warm-up +
1 timed run, fixed cores).

Reading the ratios: 10x data on fixed cores makes ~10x the zero-headroom
linear bound; BASELINE.md's documented probe rule applies — anything
> 8x here (tighter than the suite-wide 15x because these five are the
queries whose round counts COULD grow) needs a named cause.

Round 11 extends the probe beyond the iterative family: `--heavy` runs
the top non-iterative compositions (HEAVY below) and merges their rows
into the same accumulated artifact, so BENCH_SF10.json grows toward the
full heavy set without re-paying for rows already measured.

Usage: python3 tools/sf10_probe.py [--out /tmp/sf10] [--skip-build]
       [--heavy] [--isolate] [--only q1,q2]
Prints per-query JSON lines, markdown rows for BASELINE.md, and one
summary JSON line; writes BENCH_SF10.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# top-5 iterative-family queries by sf1 cost (BASELINE.md sf1 table)
PROBE = [
    "knn_clusters",
    "lof_outliers",
    "knn_graph",
    "dup_communities",
    "dup_clusters",
    "dup_core",
]

# --heavy: the top NON-iterative queries by sf1 cost (round 11 — after
# the iterative family held two decades, these compositions are the
# next-most-expensive plans that had only sf1 evidence). Merged into the
# same artifact so BENCH_SF10.json accumulates the full heavy set.
HEAVY = [
    "prepare_training_data",
    "corpus_clean_clustered",
    "link_prediction",
    "event_pagerank",
    "dedup_simhash",
    "dedup_keep_best",
]


# Named causes for every adjudicated >4x sf10 row — embedded in the
# artifact (round-11 verdict item 4: adjudications live in the JSON, not
# BASELINE.md prose). Keyed like bench.py's SCALE_CAUSES; any >4x row
# without an entry surfaces as UNTRIAGED so fresh discoveries are loud.
SF10_CAUSES = {
    "link_prediction": (
        "sub-linear in WORK: wedge volume sum(deg*(deg-1))/2 is 87.2M at "
        "sf1 vs 872.2M at sf10 — exactly 10.0x candidate pairs for 10x "
        "rows; 8.2x wall for 10.0x work on fixed cores"
    ),
    "dup_core": (
        "k-core peel rounds grow with the densified replica graph's "
        "degeneracy; per-round work is edge-linear (keyed-checkpoint "
        "layout) — wall tracks rounds x edges, re-probed in isolation"
    ),
    "lof_outliers": (
        "composes knn_graph (5.5x) + two edge-keyed joins for reach-dist "
        "and lrd ratios; growth is the knn build plus join fan-in, no "
        "quadratic term — re-probed in isolation"
    ),
    "knn_graph": (
        "LSH-bucketed candidate gen: bucket occupancy grows with density "
        "at fixed band params; work is sum of per-bucket pair volume, "
        "bounded by the bucket cap — not all-pairs"
    ),
    "prepare_training_data": (
        "seven partial-combined stages; growth tracks the dedup + "
        "quality + split cascade's shuffle volume, each stage "
        "hash-checked linear"
    ),
    "record_linkage_scaled": (
        "SUB-linear in WORK — the fixture, not the plan: make_scale "
        "replicas clone (c_nationkey, c_mktsegment, c_acctbal) verbatim, "
        "and identical fixed-point values cannot be split by narrower "
        "bands, so every base customer is a clone clique of size R "
        "inside its block; measured within-block pair volume (the exact "
        "Sum c(c-1)/2 the valve computes) is 713.5k at sf1 vs 74.67M at "
        "sf10 — 104.7x WORK for 16.6x wall. On non-cloned data the "
        "data-scaled width holds occupancy at the 64 target and pair "
        "volume stays linear (scaled_numeric_band's contract; max block "
        "200 = 2x target even under cloning, so the hot-block valve "
        "stays quiet)"
    ),
    "wordpiece_vocab": (
        "work-LINEAR on this fixture, sub-linear wall: the replica "
        "mutation grows the DISTINCT-word table 11.0x (9,112 words at "
        "sf1 vs 99,912 at sf10, measured), so every per-round pair-"
        "score agg carries 11x rows; 4.3x wall for 11x work on fixed "
        "cores is scheduler-floor amortization, no quadratic term. On "
        "natural corpora Heaps' law keeps the word table sub-linear in "
        "corpus size, so per-round cost grows SLOWER than the corpus"
    ),
    "hard_negatives": (
        "composes knn_graph's LSH-bucketed candidate gen (5.5x in "
        "isolation at this scale; bucket occupancy grows with replica "
        "density, per-bucket pair work capped) plus two node-keyed "
        "label joins and a per-anchor WindowGroupLimit over the k*n "
        "edge list — all edge-linear stages; 8.7x wall for 10x rows "
        "stays under the 10x zero-headroom linear bound, no quadratic "
        "term"
    ),
    "doremi_mix": (
        "work-linear by construction: composes doremi_weights' R "
        "Group-DRO rounds — each round is two model-sized aggs that "
        "SCAN the once-partitioned persisted feature frame (corpus-"
        "linear per round by design; driver state stays K-vector-"
        "sized) — plus domain_mix's narrow expand-and-keep; 8.8x "
        "wall for exactly 10.0x rows on fixed cores is the zero-"
        "headroom linear bound, not a quadratic term"
    ),
}


def _merged_artifact(
    artifact: str,
    timings: dict[str, float],
    ratios: dict[str, float],
    fresh: bool,
    provenance: dict[str, dict],
) -> dict:
    """Merge this run's rows into the accumulated BENCH_SF10.json (the
    artifact accumulates the full heavy set across subset runs — round-11
    ADVICE: the default no-flag path used to clobber it) unless --fresh
    asked for an intentional rebuild. Attaches SF10_CAUSES to every >4x
    row so adjudications live in the artifact.

    Provenance is PER QUERY ROW (round-12 ADVICE: a single artifact-level
    `isolated` flag from the CURRENT run mislabeled carried-over rows
    measured under the other mode, and dropped their loadavg fields) —
    each row's {isolated, loadavg_*} merges exactly like queries/ratios.
    A prior artifact written before this change carries a top-level flag;
    its rows inherit that flag so carried rows stay truthfully labeled."""
    if not fresh and os.path.exists(artifact):
        prior = json.load(open(artifact, encoding="utf-8"))
        prior_prov = prior.get("provenance")
        if prior_prov is None:
            # legacy artifact: one top-level flag covered every row
            legacy = {"isolated": prior.get("isolated", False)}
            for k in ("loadavg_before", "loadavg_after"):
                if k in prior:
                    legacy[k] = prior[k]
            prior_prov = {n: dict(legacy) for n in prior.get("queries", {})}
        timings = {**prior.get("queries", {}), **timings}
        ratios = {**prior.get("ratios_vs_sf1", {}), **ratios}
        provenance = {**prior_prov, **provenance}
    out = {
        "metric": "sf10_scale_probe_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 10.0,
        "queries": timings,
        "ratios_vs_sf1": ratios,
        "provenance": provenance,
        "n_over_8x": sum(1 for r in ratios.values() if r > 8.0),
        "causes": {
            n: SF10_CAUSES.get(n, "UNTRIAGED — fresh discovery")
            for n, r in sorted(ratios.items(), key=lambda kv: -kv[1])
            if r > 4.0
        },
    }
    with open(artifact, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    return out


def _sf1_seconds() -> dict[str, float]:
    """Per-query sf1 seconds: BENCH_SF1.json when a --sf1-gate run exists
    (fresh, same box), else BASELINE.md's recorded sf1 probe table."""
    # prefer the freshest sf1 artifact: the full-suite run covers every
    # query; the standing gate covers the top-N — whichever ran last has
    # the numbers measured against the current code.
    cands = [os.path.join(REPO, n)
             for n in ("BENCH_SF1_FULL.json", "BENCH_SF1.json")]
    cands = [p for p in cands if os.path.exists(p)]
    if cands:
        p = max(cands, key=os.path.getmtime)
        return json.load(open(p, encoding="utf-8"))["queries"]
    out: dict[str, float] = {}
    text = open(os.path.join(REPO, "BASELINE.md"), encoding="utf-8").read()
    for m in re.finditer(
        r"^\| ([a-z0-9_]+) \| ([0-9.]+) \| [0-9.]+ \| [0-9.]+ .?\|$",
        text,
        re.M,
    ):
        out[m.group(1)] = float(m.group(2))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf10")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--only", default=None, help="comma-separated subset")
    ap.add_argument(
        "--heavy", action="store_true",
        help="probe the top non-iterative heavy set (merges into the "
        "artifact like --only)",
    )
    ap.add_argument(
        "--isolate", action="store_true",
        help="run each query in its own subprocess/JVM — at 100x scale "
        "one JVM accumulating several heavy plans lost a Python worker "
        "in round 10's first session; isolation is part of the method "
        "(queries are independent, so per-session timings compare)",
    )
    ap.add_argument(
        "--fresh", action="store_true",
        help="intentionally rebuild BENCH_SF10.json from only this run's "
        "rows instead of merging into the accumulated artifact",
    )
    ap.add_argument("--_child", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.heavy and not args.only:
        # behaves exactly like --only over the heavy set: subset run,
        # merged into the accumulated artifact
        args.only = ",".join(HEAVY)

    if args.isolate and "--_child" not in sys.argv:
        results: dict[str, float] = {}
        for name in (args.only.split(",") if args.only else PROBE):
            cmd = [sys.executable, os.path.abspath(__file__), "--out",
                   args.out, "--only", name, "--_child"]
            if args.skip_build:
                cmd.append("--skip-build")
            r = subprocess.run(cmd, capture_output=True, text=True)
            for ln in r.stdout.splitlines():
                if ln.startswith('{"query"'):
                    row = json.loads(ln)
                    results[row["query"]] = row["sf10_sec"]
                    print(ln)
            if r.returncode != 0:
                print(f"FAILED {name}: tail of stderr:\n" +
                      "\n".join(r.stderr.splitlines()[-5:]), file=sys.stderr)
            args.skip_build = True  # first child built the fixtures
        sf1 = _sf1_seconds()
        ratios = {n: round(v / sf1[n], 1) for n, v in results.items()
                  if sf1.get(n)}
        # ALWAYS merge into the accumulated artifact (each child also
        # merge-wrote its 1-query row; the parent's merge is the record)
        out = _merged_artifact(
            os.path.join(REPO, "BENCH_SF10.json"), results, ratios,
            fresh=args.fresh,
            provenance={n: {"isolated": True} for n in results},
        )
        print(json.dumps(out))
        return

    if not args.skip_build and not os.path.exists(
        os.path.join(args.out, "lineitem.parquet")
    ):
        print(f"building sf10 fixtures at {args.out} ...", file=sys.stderr)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_scale.py"),
             "--out", args.out, "--replicas", "100"],
            check=True,
        )

    from opendosm_parquet_to_sqlite_spark.caching import release_cached
    from opendosm_parquet_to_sqlite_spark.plans.queries import QUERIES
    from opendosm_parquet_to_sqlite_spark.session import get_spark

    probe = args.only.split(",") if args.only else PROBE
    sf1 = _sf1_seconds()
    spark = get_spark(app_name="sf10_probe")
    spark.sparkContext.setLogLevel("ERROR")
    load_before = [round(x, 2) for x in os.getloadavg()]
    spark.range(1).count()

    timings: dict[str, float] = {}
    ratios: dict[str, float] = {}
    for name in probe:
        def run() -> float:
            t0 = time.perf_counter()
            QUERIES[name](spark, args.out).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0

        run()  # warm-up, untimed
        release_cached()
        timings[name] = round(run(), 3)
        release_cached()
        if sf1.get(name):
            ratios[name] = round(timings[name] / sf1[name], 1)
        print(json.dumps({"query": name, "sf10_sec": timings[name],
                          "ratio_vs_sf1": ratios.get(name)}))
        spark._jvm.System.gc()

    print("\nBASELINE.md rows (| query | sf10 (s) | sf1 (s) | ratio |):")
    for n in probe:
        print(f"| {n} | {timings[n]} | {sf1.get(n, '?')} | "
              f"{ratios.get(n, '?')} |")

    # ALWAYS merge into the accumulated artifact — a default (no --only)
    # run used to clobber the heavy-set rows (round-11 ADVICE); --fresh
    # is the explicit rebuild path.
    load_after = [round(x, 2) for x in os.getloadavg()]
    out = _merged_artifact(
        os.path.join(REPO, "BENCH_SF10.json"), timings, ratios,
        fresh=args.fresh,
        provenance={
            n: {"isolated": False, "loadavg_before": load_before,
                "loadavg_after": load_after}
            for n in timings
        },
    )
    print(json.dumps({k: out[k] for k in (
        "metric", "value", "unit", "sf", "n_over_8x", "ratios_vs_sf1",
        "causes")}))


if __name__ == "__main__":
    main()
