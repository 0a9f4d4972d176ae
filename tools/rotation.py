"""Propose the next round's PRIORITY_KEYS head from the committed
CORRECTNESS history — never-checked keys first, then ascending by the
round of each key's most recent driver row (ties in registry order).

Usage: python tools/rotation.py [window]

Prints a ready-to-paste Python list of the first `window` (default 50)
keys plus a summary of what falls outside. This automates the
per-round hand-assembly that produced the r8 off-by-one comment
(caught in review): the ordering rule lives HERE, the round notes
only explain deviations (e.g. slotting brand-new keys ahead of
merely-stale ones).
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds: dict[int, dict] = {}
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnum = int(p.rsplit("_r", 1)[1].split(".")[0])
        with open(p) as f:
            rounds[rnum] = json.load(f)

    from machine_learning_algorithm_sparkml__spark import workload

    keys = list(workload.all_queries())
    order = {k: i for i, k in enumerate(keys)}
    last = {k: max((r for r in rounds if k in rounds[r]), default=-1) for k in keys}
    proposed = sorted(keys, key=lambda k: (last[k], order[k]))

    head, tail = proposed[:window], proposed[window:]
    print(f"# proposed PRIORITY_KEYS head ({window} of {len(keys)} keys)")
    print("PRIORITY_KEYS = [")
    prev_round = None
    for k in head:
        tag = "never" if last[k] < 0 else f"r{last[k]}"
        if tag != prev_round:
            print(f"    # last driver row: {tag}")
            prev_round = tag
        print(f'    "{k}",')
    print("]")
    stale_out = [k for k in tail if last[k] < max(rounds, default=0)]
    if stale_out:
        print(f"\n# outside the window and NOT current ({len(stale_out)}):")
        for k in stale_out:
            print(f"#   {k} (r{last[k]})" if last[k] >= 0 else f"#   {k} (never)")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closed the pipe — not an error
        pass
