"""sf1 scale witness for the dedup family (VERDICT r8 #8).

Generates a synthetic 10x documents corpus ("sf1": 50k docs from the
sf0.1 5k-doc table) and times the three headline dedup-family keys at
sf0.1 vs sf1, recording the scaling factor the 100 TB claims rest on:
banded/bucketed plans whose cost tracks duplicate density, not n^2.

Corpus construction: 10 replicas of sf0.1 documents, replica k
shifting doc_id by k*|docs| and suffixing EVERY word with ``_rk``.
Token renaming is injective per replica, so within-replica Jaccard
structure (and thus the planted near-dup pairs) is preserved exactly,
while cross-replica shingle sets are disjoint — duplicate density
stays constant as the corpus grows 10x, the organic-crawl shape. A
naive 10x copy WITHOUT renaming would instead give every doc 9 clones
(pair count x45, not x10) and measure a different workload.

Usage:
    python tools/scale_witness.py            # writes JSON lines to stdout
Timing protocol: bench.py's (lower median of 3, machine idle —
the foreign-workload stamp is reused).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = ["dedup_minhash", "decontaminate_fuzzy_large", "split_leakage_safe"]
REPLICAS = 10
SF01 = "/root/testdata/sf0.1"


def build_sf1(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from machine_learning_algorithm_sparkml__spark.sources import load_table

    docs = load_table(spark, SF01, "documents")
    n = docs.count()
    parts = []
    for k in range(REPLICAS):
        suffix = f"_r{k}"
        renamed = (
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit(suffix)),
                ),
                " ",
            )
            if k
            else F.col("text")  # replica 0 = the original corpus
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * n)).alias("doc_id"),
                renamed.alias("text"),
                "lang",
                "source",
                F.length(renamed).alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def time_key(spark, qs, key: str, sf_dir: str) -> float:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    return sorted(runs)[1]


def main() -> int:
    import tempfile

    import bench

    offenders = bench.foreign_workloads()
    if offenders:
        print(f"machine not idle, refusing to time: {offenders}", file=sys.stderr)
        return 2

    # measure the operators, not the truth passes (same rule as bench)
    os.environ["SPARK_GRAFT_SELF_VERIFY"] = "0"
    from machine_learning_algorithm_sparkml__spark import get_session
    import __spark_entry__ as entry

    spark = get_session("scale-witness")
    qs = entry.queries()

    sf1_dir = os.path.join(tempfile.gettempdir(), "spark_graft_sf1")
    build_sf1(spark, sf1_dir)
    from machine_learning_algorithm_sparkml__spark.sources import load_table

    n1 = load_table(spark, sf1_dir, "documents").count()
    print(json.dumps({"sf1_docs": n1, "replicas": REPLICAS}), flush=True)

    # warm-up
    load_table(spark, SF01, "documents").count()
    for key in KEYS:
        t01 = time_key(spark, qs, key, SF01)
        t1 = time_key(spark, qs, key, sf1_dir)
        print(
            json.dumps(
                {
                    "key": key,
                    "sf0.1_sec": round(t01, 2),
                    "sf1_sec": round(t1, 2),
                    "scale_factor": round(t1 / t01, 2),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
