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

EPOCH RESETS (VERDICT r15 #3): minima-folding must not immortalize a
floor read under a RETIRED measurement protocol. When a key's pricing
protocol changes (e.g. 9723599 made the session-memo fit-carrier keys
pay the one shared RF fit in their single timed run — before it, a
shared-session sweep read ml_confusion post-fit at 2.252 s, a cost no
current-protocol run can ever reproduce, so the key read >2x floor
forever), register the key here with the commit that changed its
protocol: history readings from revisions NOT descending from that
commit are excluded for that key, and the old BENCH_PRIORS floor is
recomputed from post-epoch history only.
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

#: key -> first commit of its CURRENT pricing protocol. Readings from
#: revisions not descending from that commit are excluded for the key
#: (module docstring has the rule and the ml_confusion incident).
EPOCH_RESETS = {
    # 9723599 "Price the shared RF fit honestly in the bench": the
    # fit-carrier keys get ONE timed run that pays the shared seeded
    # RF fit; pre-epoch shared-session sweeps read them post-memo.
    "ml_confusion": "97235995821be9b923f710a5615b3edf4f0e921c",
    "ml_pipeline": "97235995821be9b923f710a5615b3edf4f0e921c",
    # 470deca "Session-memoize join_bucketed's table writes; price
    # with one timed run": same shape — pre-epoch repeats read the key
    # with its bucketed tables already written.
    "join_bucketed": "470decab1de7fc4c279ce822554f50678c040433",
}


def _post_epoch(rev: str, epoch: str, cache: dict) -> bool:
    """True iff ``epoch`` is an ancestor of ``rev`` (the reading was
    taken under the current pricing protocol)."""
    k = (rev, epoch)
    if k not in cache:
        cache[k] = (
            subprocess.run(
                ["git", "merge-base", "--is-ancestor", epoch, rev],
                cwd=REPO, capture_output=True,
            ).returncode
            == 0
        )
    return cache[k]


def _historical_queries() -> list[dict]:
    revs = subprocess.run(
        ["git", "log", "--format=%H", "--", "BENCH_FULL.json"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    out = []
    anc_cache: dict = {}
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
            queries = data.get("queries", {})
            queries = {
                k: v
                for k, v in queries.items()
                if k not in EPOCH_RESETS
                or _post_epoch(rev, EPOCH_RESETS[k], anc_cache)
            }
            out.append(queries)
    return out


def main() -> None:
    sources = _historical_queries()
    # working-tree BENCH_FULL is by definition current-protocol; the
    # existing BENCH_PRIORS may carry pre-epoch folds for the reset
    # keys, so those entries are dropped and recomputed from history
    for fname in ("BENCH_FULL.json", "BENCH_PRIORS.json"):
        try:
            with open(os.path.join(REPO, fname)) as f:
                data = json.load(f)
            if data.get("sf") == SF:
                queries = data.get("queries", {})
                if fname == "BENCH_PRIORS.json":
                    queries = {
                        k: v for k, v in queries.items() if k not in EPOCH_RESETS
                    }
                sources.append(queries)
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
