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
import os
import re
import sys

# repo root derived from this file's location (tools/..), not hardcoded,
# so the tool keeps working from a checkout anywhere on disk
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SECTION_START = "Round-7 wave-3 rows"
SECTION_END = "## sf1 scale probe"


def _find_marker(lines: list[str], prefix: str) -> int:
    for i, ln in enumerate(lines):
        if ln.startswith(prefix):
            return i
    raise SystemExit(
        f"BASELINE.md section marker not found: a line starting with "
        f"{prefix!r} — the file layout changed; update SECTION_START/"
        f"SECTION_END in {__file__}"
    )


def main() -> None:
    bench_path = (
        sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_LOCAL.json")
    )
    bench = json.load(open(bench_path, encoding="utf-8"))
    med = bench["queries"]
    mins = bench.get("queries_min", {})

    path = os.path.join(REPO, "BASELINE.md")
    lines = open(path, encoding="utf-8").read().splitlines(keepends=True)

    start = _find_marker(lines, SECTION_START)
    end = _find_marker(lines, SECTION_END)
    # the stray subset row above the wave tables
    extra_names = {"ks_drift"}

    n_changed = 0
    n_unparsed = 0
    row_re = re.compile(r"^\| ([a-z0-9_]+) \| ([0-9.]+) \| ([0-9.]+) \|$")
    # looser shape check: anything that LOOKS like a 3-cell data row but
    # fails the strict single-space format would otherwise be skipped
    # silently — count and report those so formatting drift is visible
    loose_re = re.compile(r"^\|\s*[a-z0-9_]+\s*\|\s*[0-9.]+\s*\|\s*[0-9.]+\s*\|$")
    for i, ln in enumerate(lines):
        stripped = ln.strip()
        m = row_re.match(stripped)
        in_section = start <= i < end
        if not m:
            if in_section and loose_re.match(stripped):
                n_unparsed += 1
                print(f"UNPARSED in-section row (spacing?): {stripped}")
            continue
        name = m.group(1)
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
    if n_unparsed:
        print(
            f"WARNING: {n_unparsed} in-section row(s) failed to parse and "
            f"were left untouched (see UNPARSED lines above)"
        )


if __name__ == "__main__":
    main()
