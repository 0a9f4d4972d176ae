"""Per-key bench comparison with ambient-regime adjudication.

Usage:
    python tools/bench_diff.py [OLD.json] [NEW.json]   # default: git HEAD's
                                                       # BENCH_FULL.json vs
                                                       # the working-tree one

Mechanizes the adjudication rule ROUND8/9 applied by hand: host-level
drift moves almost every key by a similar factor (uniform co-movement),
so per-key deltas are only meaningful RELATIVE to the run's median
ratio. A key is flagged as a real regression candidate iff its ratio
exceeds the median ratio by more than REL_FACTOR on a key big enough
to be above the noise floor — those are the only rows worth reading
code over. Everything else is ambient.

Prints: the two totals, the median ratio over keys >NOISE_SEC, and the
flagged outliers (ratio, old, new) sorted worst-first.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

NOISE_SEC = 0.3
REL_FACTOR = 1.5


def load(path: str) -> dict:
    if path == "HEAD":
        out = subprocess.run(
            ["git", "show", "HEAD:BENCH_FULL.json"], capture_output=True, text=True
        )
        d = json.loads(out.stdout)
    else:
        with open(path) as f:
            d = json.load(f)
    # the driver's BENCH_r{N}.json wraps the bench JSON line under
    # "parsed" (and its "queries" omits sub-noise keys — the diff then
    # covers the driver-visible keys only)
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d


def main() -> int:
    old_path = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    new_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_FULL.json"
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    if not common:
        print("no common keys")
        return 2
    big = [k for k in common if oq[k] > NOISE_SEC]
    med = statistics.median(nq[k] / oq[k] for k in big) if big else 1.0
    print(
        json.dumps(
            {
                "old_total": round(sum(oq[k] for k in common), 1),
                "new_total": round(sum(nq[k] for k in common), 1),
                "n_common": len(common),
                "median_ratio": round(med, 3),
                "old_isolated": old.get("isolation", {}).get("clean"),
                "new_isolated": new.get("isolation", {}).get("clean"),
            }
        )
    )
    flagged = [
        (nq[k] / oq[k], k)
        for k in big
        if nq[k] / oq[k] > med * REL_FACTOR
    ]
    for r, k in sorted(flagged, reverse=True):
        print(
            json.dumps(
                {
                    "key": k,
                    "ratio": round(r, 2),
                    "rel_to_median": round(r / med, 2),
                    "old_sec": round(oq[k], 2),
                    "new_sec": round(nq[k], 2),
                }
            )
        )
    if not flagged:
        print('{"flagged": 0, "verdict": "all deltas co-move with the ambient regime"}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
