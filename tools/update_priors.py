"""Maintain BENCH_PRIORS.json — the committed per-key timing floor
bench.py consults for spike detection (bench.merge_priors docstring
has the r13 incident that motivates it).

BENCH_PRIORS.json is CURATED: bench runs read it and never write it,
so a contaminated sweep that overwrites BENCH_FULL.json cannot poison
the floor. This tool is the only writer. It takes the per-key MINIMUM
over:

  - the existing BENCH_PRIORS.json (floors only ratchet down),
  - every committed revision of BENCH_FULL.json in git history,
  - the current working-tree BENCH_FULL.json,

then prunes keys no longer in the live registry (renamed/removed keys
must not linger as dead floors). Run after a clean isolated bench at
certification time:

    python tools/update_priors.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import merge_priors  # noqa: E402


SF = 0.1  # the bench scale factor; floors from other SFs are not comparable


def _historical_queries() -> list[dict]:
    revs = subprocess.run(
        ["git", "log", "--format=%H", "--", "BENCH_FULL.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    out = []
    for rev in revs:
        blob = subprocess.run(
            ["git", "show", f"{rev}:BENCH_FULL.json"],
            cwd=REPO, capture_output=True, text=True,
        )
        if blob.returncode != 0:
            continue
        try:
            data = json.loads(blob.stdout)
        except json.JSONDecodeError:
            continue
        if data.get("sf") == SF:
            out.append(data.get("queries", {}))
    return out


def main() -> None:
    sources = _historical_queries()
    for fname in ("BENCH_FULL.json", "BENCH_PRIORS.json"):
        try:
            with open(os.path.join(REPO, fname)) as f:
                data = json.load(f)
            if data.get("sf") == SF:
                sources.append(data.get("queries", {}))
        except Exception:
            pass
    floors = merge_priors(sources)

    from machine_learning_algorithm_sparkml__spark import workload

    live = set(workload.all_queries())
    pruned = sorted(set(floors) - live)
    floors = {k: v for k, v in floors.items() if k in live}

    with open(os.path.join(REPO, "BENCH_PRIORS.json"), "w") as f:
        json.dump(
            {
                "note": (
                    "Per-key timing floor (sec, sf0.1 local[32]) — curated by "
                    "tools/update_priors.py, read-only to bench.py; min over "
                    "all committed BENCH_FULL.json history"
                ),
                "queries": {k: round(v, 3) for k, v in sorted(floors.items())},
                "sf": SF,
            },
            f, indent=1, sort_keys=True,
        )
        f.write("\n")
    print(f"BENCH_PRIORS.json: {len(floors)} keys"
          + (f", pruned {len(pruned)}: {pruned}" if pruned else ""))


if __name__ == "__main__":
    main()
