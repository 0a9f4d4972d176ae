"""Micro-bench: time a subset of query keys at a given SF dir.

Usage: python tools/microbench.py [key ...]   (env: SPARK_GRAFT_SF_DIR)
Prints one JSON line {key: sec}. Same noop-sink forcing and cache
hygiene as bench.py, minus the full sweep — the iterate-fast loop for
optimizing a single operator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import _force  # same plan-forcing recipe as the official bench
    from machine_learning_algorithm_sparkml__spark import get_session
    from machine_learning_algorithm_sparkml__spark.sources import load_table
    import __spark_entry__ as entrymod

    spark = get_session("microbench")
    qs = entrymod.queries()
    keys = sys.argv[1:] or ["dedup_clusters"]
    load_table(spark, sf_dir, "lineitem").count()  # warm-up, not recorded

    timings = {}
    for name in keys:
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
