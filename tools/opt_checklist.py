#!/usr/bin/env python3
"""Generate the OPTIMIZATION_r14.md checklist table: every headline
query with before/after suite seconds, baseline ratio, and the action
taken this round.

Usage: python3 tools/opt_checklist.py /tmp/bench_before_map.json BENCH_LOCAL_r14.json
"""

from __future__ import annotations

import json
import re
import sys

REPO = "/root/repo"

# action tags per query (round-14 optimization); queries not listed get
# the default "floor" examination note (the session-wide AQE floor
# change affected every multi-exchange plan).
ACTIONS: dict[str, str] = {}

PAIRS_FIRST = (
    "pairs-first CC/LPA materialization (upstream runs once; one keyed "
    "layout at final width)"
)
for q in [
    "dup_clusters", "corpus_clean_clustered", "dedup_keep_best",
    "split_leakage_free", "knn_clusters", "dedup_media_clusters",
    "dedup_urls", "dup_communities",
]:
    ACTIONS[q] = PAIRS_FIRST
ACTIONS["event_pagerank"] = (
    "2-iter checkpoint batching tried+REVERTED (171->230 jobs); floor is "
    "driver planning"
)
for q in ["quality_classifier", "quality_classifier_2iter", "release_gate"]:
    ACTIONS[q] = "train_logreg: bias gradient folded into the bucket agg (1 action/iter)"
for q in ["doremi_weights", "doremi_mix"]:
    ACTIONS[q] = "stats+gradient legs unioned: 1 collect/round instead of 2"
ACTIONS["tfidf_per_doc"] = (
    "df via count window over the term layout (tokenize once; "
    "1.65->1.21 isolated)"
)
for q in ["winnow_pairs", "span_dedup_exact", "remove_repeated_spans",
          "remove_repeated_spans_within"]:
    ACTIONS[q] = "spread_small_input before the winnow gram stage"
ACTIONS["fd_violations"] = "narrow projection + fan_out before the partial agg"
ACTIONS["link_prediction"] = (
    "bucket-explode wedges (one centers exchange, wall-neutral, kept "
    "for scale)"
)
ACTIONS["prepare_training_data"] = (
    "2 sharing arms tried+REVERTED (persist red 6.9->9.4; eager "
    "materialize 6.9->7.4)"
)
ACTIONS["dedup_ngram_jaccard"] = (
    "eager shingle materialization tried: NEUTRAL, left lazy"
)
for q in ["bootstrap_ci", "dedup_simhash"]:
    ACTIONS[q] = "fan_out estimate refined (maxSplitBytes + row-group cap)"


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
    print("| query | before s | after s | vs warm baseline | action (r14 opt) |")
    print("|---|---|---|---|---|")
    for q, b, a, bl, act in rows:
        ratio = f"{a / bl:.2f}x" if bl else "-"
        bs = f"{b:.2f}" if b else "-"
        act = act or "examined; profiled family clean or floor-bound; left alone"
        print(f"| {q} | {bs} | {a:.2f} | {ratio} | {act} |")


if __name__ == "__main__":
    main()
