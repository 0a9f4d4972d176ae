"""Driver-window staleness telemetry: per-key "last driver-checked
round" from the committed CORRECTNESS_r*.json files, plus the expected
next-round window (first 50 registry keys).

Usage: python tools/staleness.py            # markdown table to stdout

The driver records ~50 correctness rows per round in registry order
(`workload/__init__.py` PRIORITY_KEYS + module order). Run this when
planning a rotation: keys listed under "never", then the oldest round
tags, are the next PRIORITY_KEYS head. ROUND{N}.md embeds this table
each round (VERDICT r5 #7).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds: dict[int, dict] = {}
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnum = int(p.rsplit("_r", 1)[1].split(".")[0])
        with open(p) as f:
            rounds[rnum] = json.load(f)

    from machine_learning_algorithm_sparkml__spark import workload

    keys = list(workload.all_queries())
    window = set(keys[:WINDOW])
    last = {k: max((r for r in rounds if k in rounds[r]), default=None) for k in keys}

    groups: dict[str, list[str]] = {}
    for k in keys:
        tag = "never" if last[k] is None else f"r{last[k]}"
        groups.setdefault(tag, []).append(k)

    print("| last driver row | n | keys (→ = in the next ~50-key window) |")
    print("|---|---|---|")
    for tag in sorted(groups, key=lambda t: -1 if t == "never" else int(t[1:])):
        ks = sorted(groups[tag])
        shown = ", ".join(("→" if k in window else "") + k for k in ks)
        print(f"| {tag} | {len(ks)} | {shown} |")

    uncovered = [k for k in keys if last[k] is None and k not in window]
    if uncovered:
        print(f"\nWARNING: never-checked keys OUTSIDE the window: {uncovered}")


if __name__ == "__main__":
    main()
