#!/usr/bin/env python3
"""Commit the previous round's driver-written artifacts.

Run at the START of each round (before any code work) so the judge sees
a clean `git status` apart from the current round's just-written files.
Stages every untracked/modified BENCH_r*.json / CORRECTNESS_r*.json /
BENCH_LOCAL_r*.json plus the rolling artifacts (PROGRESS.jsonl,
LEAKCHECK.json, COPYCHECK.json, VERDICT.md, ADVICE.md) and commits them
in one "round N artifacts" commit. No-op when nothing is dirty.

Usage: python tools/commit_round_artifacts.py [--dry-run]
"""
from __future__ import annotations

import subprocess
import sys

ARTIFACT_PATTERNS = [
    "BENCH_r*.json",
    "CORRECTNESS_r*.json",
    "BENCH_LOCAL_r*.json",
    # BENCH_LOCAL.json is gitignored (scratch output of every bench run);
    # only the per-round BENCH_LOCAL_r*.json snapshots are committed.
    "BENCH_SF1.json",
    "BENCH_SF10.json",
    "BENCH_SF1_FULL.json",
    "PROGRESS.jsonl",
    "LEAKCHECK.json",
    "COPYCHECK.json",
    "VERDICT.md",
    "ADVICE.md",
]


def git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], check=True, capture_output=True, text=True
    ).stdout


def main() -> int:
    dry = "--dry-run" in sys.argv
    dirty = git("status", "--porcelain", "--", *ARTIFACT_PATTERNS).strip()
    if not dirty:
        print("commit_round_artifacts: nothing to commit")
        return 0
    print(dirty)
    if dry:
        return 0
    git("add", "--", *ARTIFACT_PATTERNS)
    git("commit", "-m", "Commit prior-round driver artifacts")
    print(git("log", "--oneline", "-1").strip())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
