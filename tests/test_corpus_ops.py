"""Planted-scenario tests for the corpus-hygiene operators:
benchmark decontamination and deterministic hash splitting."""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.functions.text import (
    doc_fingerprint,
    hash_split_label,
)
from machine_learning_algorithm_sparkml__spark.operators.dedup import (
    decontaminate_by_shingle,
)


def test_decontaminate_drops_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # verbatim 4-gram lifted from the benchmark -> contaminated
            (10, "witness the quick brown fox escaping again"),
            # shares words but never a 4-gram -> clean
            (11, "a brown dog and a quick cat nap"),
            (12, "entirely unrelated text about spark plans"),
        ],
        "doc_id long, text string",
    )
    kept = decontaminate_by_shingle(corpus, bench, "doc_id", "text", n=4)
    assert sorted(r["doc_id"] for r in kept.collect()) == [11, 12]


def test_decontaminate_keeps_schema(spark):
    bench = spark.createDataFrame([(1, "alpha beta gamma delta")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(2, "some other words entirely here")], "doc_id long, text string"
    )
    kept = decontaminate_by_shingle(corpus, bench, "doc_id", "text", n=4)
    assert kept.columns == corpus.columns
    assert kept.count() == 1


def test_hash_split_deterministic_and_leakage_free(spark):
    # duplicate texts (different ids) must land in the SAME split when
    # keyed on the content fingerprint
    df = spark.createDataFrame(
        [(i, f"document number {i % 50} body text") for i in range(200)],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        "text",
        hash_split_label(doc_fingerprint(F.col("text"))).alias("split"),
    )
    per_text = out.groupBy("text").agg(F.countDistinct("split").alias("k"))
    assert per_text.filter(F.col("k") > 1).isEmpty()
    # rerun => identical assignment
    again = df.select(
        "doc_id", hash_split_label(doc_fingerprint(F.col("text"))).alias("split")
    )
    first = out.select("doc_id", "split")
    assert first.exceptAll(again).isEmpty() and again.exceptAll(first).isEmpty()


def test_hash_split_proportions(spark):
    # over 2000 distinct keys the 12/2/2 hex split should be ~75/12.5/12.5
    df = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    got = {
        r["split"]: r["n"]
        for r in df.select(hash_split_label(F.col("k")).alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == {"train", "val", "test"}
    assert 0.70 <= got["train"] / 2000 <= 0.80
    assert 0.08 <= got["val"] / 2000 <= 0.17
    assert 0.08 <= got["test"] / 2000 <= 0.17


def test_mixture_weighted_sample_respects_thresholds(spark, sf_dir):
    """Full-weight sources keep every doc; keep-rates otherwise can
    only shrink with the threshold; verdicts are deterministic."""
    from machine_learning_algorithm_sparkml__spark.sources import load_table
    from machine_learning_algorithm_sparkml__spark.workload.llm import (
        q_mixture_weighted_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    kept = q_mixture_weighted_sample(spark, sf_dir)
    total = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept_by = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for i in range(5):  # weight 1.0 -> everything kept
        src = f"src{i}"
        assert kept_by.get(src, 0) == total[src], src
    # deterministic: second run identical
    kept2 = {r["doc_id"] for r in q_mixture_weighted_sample(spark, sf_dir).collect()}
    assert kept2 == {r["doc_id"] for r in kept.collect()}


def test_passage_dedup_constructed_set(spark):
    """Hand-built corpus: a 64-token doc (2 passages), an exact copy
    (later id -> both passages dropped), a doc sharing only the FIRST
    passage (drops 1, keeps 1), a unique doc, and empty/NULL docs."""
    import hashlib

    from machine_learning_algorithm_sparkml__spark.operators.dedup import passage_dedup

    p1 = " ".join(f"w{i}" for i in range(32))           # passage A
    p2 = " ".join(f"x{i}" for i in range(32))           # passage B
    p3 = " ".join(f"y{i}" for i in range(32))           # passage C
    rows = [
        (1, f"{p1} {p2}"),      # original: keeps A+B
        (2, f"{p1} {p2}"),      # exact copy: drops both
        (3, f"{p1} {p3}"),      # shares A only: keeps C
        (4, "unique short doc"),
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    out = {r["doc_id"]: r for r in passage_dedup(df, "doc_id", "text", passage_tokens=32).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()

    assert (out[1]["n_passages"], out[1]["n_kept"], out[1]["n_dropped"]) == (2, 2, 0)
    assert out[1]["rebuilt_md5"] == md5(f"{p1} {p2}")
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (0, 2)
    assert out[2]["rebuilt_md5"] == md5("")
    assert (out[3]["n_kept"], out[3]["n_dropped"]) == (1, 1)
    assert out[3]["rebuilt_md5"] == md5(p3)
    assert (out[4]["n_passages"], out[4]["n_kept"]) == (1, 1)
    assert out[4]["rebuilt_md5"] == md5("unique short doc")
    for empty_id in (5, 6):  # token-less docs: zero passages, md5('')
        assert (out[empty_id]["n_passages"], out[empty_id]["n_kept"]) == (0, 0)
        assert out[empty_id]["rebuilt_md5"] == md5("")


def test_bigram_familiarity_hand_computed(spark):
    """Semantic anchor independent of the oracle (which mirrors the
    implementation): 3-doc corpus small enough to hand-compute.
    Corpus bigrams: d0 'a b', 'b a'; d1 'a b', 'b c'; d2: none.
    C2: (a,b)=2, (b,a)=1, (b,c)=1; total_bigrams=4.
    C1 (unigrams): a=3, b=3, c=1 (d2 contributes 'a').
    d0: sum_big = C2(a,b)+C2(b,a) = 3; sum_first = C1(a)+C1(b) = 6
        familiarity = 3/(2*4) = 0.375; conditional = 3/6 = 0.5
    d1: sum_big = 2+1 = 3; sum_first = C1(a)+C1(b) = 6 -> same values
    d2: single token -> zeros."""
    from machine_learning_algorithm_sparkml__spark.operators.lm import bigram_familiarity

    df = spark.createDataFrame(
        [(0, "a b a"), (1, "a b c"), (2, "a")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in bigram_familiarity(df).collect()}
    assert (got[0].n_bigrams, got[0].sum_bigram_count) == (2, 3)
    assert got[0].bigram_familiarity == 3 / 8 and got[0].conditional_score == 0.5
    assert (got[1].n_bigrams, got[1].sum_bigram_count) == (2, 3)
    assert got[1].bigram_familiarity == 3 / 8 and got[1].conditional_score == 0.5
    assert (got[2].n_bigrams, got[2].sum_bigram_count) == (0, 0)
    assert got[2].bigram_familiarity == 0.0 and got[2].conditional_score == 0.0


def test_leakage_safe_split_keeps_near_dups_together(spark, sf_dir):
    """The defining property, checked directly (not via the oracle):
    every near-duplicate pair ends up in ONE split, and group_id is a
    member of its own group (a real doc_id)."""
    from machine_learning_algorithm_sparkml__spark.workload.llm import (
        q_split_leakage_safe,
        q_dedup_ngram_jaccard,
    )

    import pytest

    split = {r.doc_id: (r.group_id, r.split) for r in q_split_leakage_safe(spark, sf_dir).collect()}
    pairs = [(r.id_a, r.id_b) for r in q_dedup_ngram_jaccard(spark, sf_dir).collect()]
    if not pairs:  # regenerated testdata without planted near-dups
        pytest.skip("no near-dup pairs at this scale factor")
    for a, b in pairs:
        assert split[a][1] == split[b][1], (a, b, split[a], split[b])
        assert split[a][0] == split[b][0]
    assert all(g in split for g, _ in split.values())


def test_token_budget_mixture_greedy_semantics(spark):
    """Hand-checked greedy fill: docs ordered by md5(doc_id) within
    the source; the first doc whose cumulative tokens exceed the
    budget is excluded along with everything after it — even if a
    LATER, smaller doc would still have fit (greedy prefix, not
    knapsack: reproducibility beats packing efficiency)."""
    import hashlib

    from machine_learning_algorithm_sparkml__spark.operators.lm import (
        token_budget_mixture,
    )

    rows = [(i, "s", "tok " * 4) for i in range(5)]  # 4 tokens each
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in token_budget_mixture(df, {}, default_budget=10).collect()}
    order = sorted(range(5), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    # cumulative 4, 8, 12, ... -> exactly the first two in md5 order fit
    kept = [i for i in order if out[i].kept]
    assert kept == order[:2], (order, {i: out[i].cum_tokens for i in order})
    assert [out[i].cum_tokens for i in order] == [4, 8, 12, 16, 20]
