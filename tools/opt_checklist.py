#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r13.md checklist table: every headline
query with before/after suite seconds, baseline ratio, and the action
taken this round.

Usage: python3 tools/opt_checklist.py /tmp/bench_before_map.json BENCH_LOCAL_r13.json
"""

from __future__ import annotations

import json
import re
import sys

REPO = "/root/repo"

# action tags per query (round-13 optimization); queries not listed get
# the default "floor" examination note (the session-wide AQE floor
# change affected every multi-exchange plan).
ACTIONS: dict[str, str] = {}

LOOP_CC = (
    "loop width (measured-E, clamp [1,conf]) + fused convergence + "
    "cache-lifetime fixes"
)
for q in [
    "dup_clusters", "corpus_clean_clustered", "dedup_keep_best",
    "split_leakage_free", "knn_clusters", "dedup_media_clusters",
    "dedup_urls",
]:
    ACTIONS[q] = LOOP_CC
ACTIONS["event_pagerank"] = (
    "loop width + edge-DAG checkpointed once + cache-lifetime fixes"
)
ACTIONS["dup_communities"] = "loop width (LPA) + cache-lifetime fixes"
ACTIONS["dup_core"] = (
    "loop width (k-core widen) + lazy-count fusion + cache-lifetime fixes"
)
ACTIONS["bootstrap_ci"] = "fan_out before the xB explode (was ONE task)"
ACTIONS["dedup_simhash"] = "fan_out before the 63-accumulator fold"
for q in ["wordpiece_vocab", "wordpiece_segment"]:
    ACTIONS[q] = "lazy merge-round checkpoints (1 job fewer/round) + _ckpt_ids"
for q in ["bpe_merges", "unigram_lm_vocab", "unigram_segment"]:
    ACTIONS[q] = "_ckpt_ids cleanup scoping (no friendly-fire unpersist)"
for q in ["dedup_image_phash", "dedup_audio_fp"]:
    ACTIONS[q] = "indirect: cache-lifetime fix stops decode re-runs"
ACTIONS["link_prediction"] = (
    "floor; sym persist tried+REVERTED (2.54->3.67)"
)
ACTIONS["dedup_ngram_jaccard"] = (
    "floor; fan_out tried+REVERTED (1.44->1.96)"
)


def load(path):
    return json.load(open(path))


def baselines():
    text = open(f"{REPO}/BASELINE.md", encoding="utf-8").read()
    idx = text.find("Official WARM baseline")
    out = {}
    for line in text[idx:].splitlines():
        m = re.match(
            r"\|\s*([a-z0-9_]+)\s*\|\s*([0-9.]+)\s*\|\s*([0-9.]+)\s*\|\s*$",
            line,
        )
        if m and m.group(1) != "query":
            out[m.group(1)] = float(m.group(2))
    return out


def main():
    before = load(sys.argv[1])["queries"]
    after = load(sys.argv[2])["queries"]
    base = baselines()
    rows = []
    for q in sorted(after, key=lambda q: -after[q]):
        b, a = before.get(q), after[q]
        rows.append((q, b, a, base.get(q), ACTIONS.get(q, "")))
    print("| query | before s | after s | vs warm baseline | action (r13 opt) |")
    print("|---|---|---|---|---|")
    for q, b, a, bl, act in rows:
        ratio = f"{a / bl:.2f}x" if bl else "-"
        bs = f"{b:.2f}" if b else "-"
        act = act or "examined; session AQE floor applies; left alone"
        print(f"| {q} | {bs} | {a:.2f} | {ratio} | {act} |")


if __name__ == "__main__":
    main()
