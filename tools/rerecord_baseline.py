#!/usr/bin/env python3
"""Re-record the subset-caveat baseline rows from a FULL-suite run.

Round-7 appended ~60 first-measurement rows to BASELINE.md from
`--only` subset runs (documented as up to ~40% optimistic vs in-suite
steady state). The round-7/8 verdicts' standing ask: once a full-suite
`--warmup 1 --runs 3` run exists, replace those rows' medians/mins with
the methodology-consistent full-run values and retire the caveat
wording. This script does exactly that — it touches ONLY rows inside
the caveat sections (from the wave-3 marker to the end of the wave
tables) plus the ks_drift stray, and rewrites each `| name | med |
min |` row from the run's BENCH_LOCAL map.

Usage: python3 tools/rerecord_baseline.py [BENCH_LOCAL.json]
Prints a per-row old->new diff summary; edits BASELINE.md in place.
"""

from __future__ import annotations

import json
import re
import sys

REPO = "/root/repo"


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/BENCH_LOCAL.json"
    bench = json.load(open(bench_path, encoding="utf-8"))
    med = bench["queries"]
    mins = bench.get("queries_min", {})

    path = f"{REPO}/BASELINE.md"
    lines = open(path, encoding="utf-8").read().splitlines(keepends=True)

    start = next(
        i for i, ln in enumerate(lines) if ln.startswith("Round-7 wave-3 rows")
    )
    end = next(
        i for i, ln in enumerate(lines) if ln.startswith("## sf1 scale probe")
    )
    # the stray subset row above the wave tables
    extra_names = {"ks_drift"}

    n_changed = 0
    row_re = re.compile(r"^\| ([a-z0-9_]+) \| ([0-9.]+) \| ([0-9.]+) \|$")
    for i, ln in enumerate(lines):
        m = row_re.match(ln.strip())
        if not m:
            continue
        name = m.group(1)
        in_section = start <= i < end
        if not in_section and name not in extra_names:
            continue
        if name not in med:
            print(f"SKIP (not in run): {name}")
            continue
        new_med, new_min = med[name], mins.get(name, med[name])
        old_med, old_min = float(m.group(2)), float(m.group(3))
        lines[i] = f"| {name} | {new_med} | {new_min} |\n"
        tag = "=" if abs(new_med - old_med) < 1e-9 else (
            "^" if new_med > old_med else "v"
        )
        print(f"{tag} {name}: {old_med}/{old_min} -> {new_med}/{new_min}")
        n_changed += 1

    open(path, "w", encoding="utf-8").write("".join(lines))
    print(f"re-recorded {n_changed} rows from {bench_path}")


if __name__ == "__main__":
    main()
