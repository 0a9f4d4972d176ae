"""Byte-pair-encoding subword tokenization (VERDICT r14 #5 — SURVEY
§7.4 north-star, no reference citation; the reference's scripts never
tokenized below whitespace granularity).

Training-data budgets are denominated in SUBWORD tokens, not
whitespace words — a pipeline that packs/budgets on whitespace counts
misprices every document by the word/subword fan-out (1.2-1.5x on
English). This module runs the REAL BPE inference algorithm against a
caller-supplied merge table, the exact contract of a trained
tokenizer's ``merges.txt``: starting from characters, repeatedly merge
the adjacent pair with the best (lowest) rank, all occurrences
leftmost-first, until no adjacent pair is in the vocabulary.

The kernel is an Arrow-batched pandas UDF (the codec-suite rule: the
per-word loop is genuinely data-dependent iteration no builtin
expresses), with a per-batch word memo — natural-language batches
repeat words heavily, so the amortized cost per row is a dict lookup.
Scale shape: a pure projection, no shuffle, no state; the merge table
ships once per executor via closure capture (vocabularies are
10k-100k pairs — broadcast-variable territory on a real cluster, a
plain closure at fixture size).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.functions.text import tokens
from machine_learning_algorithm_sparkml__spark.operators.spread import spread_rows


def bpe_word_tokens(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize ONE word with the standard BPE inference loop: find
    the best-ranked adjacent pair present, merge ALL its occurrences
    (leftmost-first, non-overlapping — 'aaa' under ('a','a') gives
    ['aa', 'a']), repeat. Works for arbitrary multi-level merge tables
    (('th','e') merging a previously-merged token is fine); the
    workload FIXTURE restricts itself to single-character pairs so the
    merge sequence is closed-form SQL-replayable, but the algorithm
    takes no shortcut from that."""
    toks = list(word)
    while len(toks) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (toks[i], toks[i + 1])
        if best_pair is None:
            break
        left, right = best_pair
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def bpe_count_udf(merges: list[tuple[str, str]]) -> Column:
    """Arrow-batched per-text BPE token count: whitespace-split (the
    shared ``tokens()`` rule: any-whitespace runs, no empty
    fragments), BPE per word, sum of per-word token counts. NULL and
    whitespace-only texts count 0."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("int")
    def counts(texts: Iterator[pd.Series]) -> Iterator[pd.Series]:
        memo: dict[str, int] = {}

        def word_count(w: str) -> int:
            n = memo.get(w)
            if n is None:
                n = len(bpe_word_tokens(w, ranks))
                memo[w] = n
            return n

        for s in texts:
            yield s.map(
                lambda t: 0
                if t is None
                else sum(word_count(w) for w in t.split())
            ).astype("int32")

    return counts


def learn_bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    *,
    min_pair_count: int = 2,
    max_vocab_rows: int = 1_000_000,
) -> list[tuple[str, str]]:
    """BPE TRAINING (not just inference): learn a merge table from the
    corpus, the standard Sennrich formulation. The insight that makes
    this Spark-friendly is that training state is the WORD-FREQUENCY
    table, not the corpus: one distributed hash-aggregate reduces any
    corpus to (word, count) rows, and the merge-learning loop runs on
    that bounded table driver-side — per iteration, count adjacent
    token pairs weighted by word count, adopt the most frequent pair
    (ties broken lexicographically, so the learned table is
    deterministic on any engine), merge it everywhere, repeat.

    ``max_vocab_rows`` bounds the driver-side table (the codebook-fit
    contract of operators/simsearch.py): past the cap, training keeps
    the MOST FREQUENT words (count desc, word asc — deterministic) —
    the standard practice, since rare-word tails contribute ~nothing
    to pair counts. Stops early when no pair reaches
    ``min_pair_count``. Returns the merge list in learned priority
    order, directly consumable by :func:`bpe_count_udf` /
    :func:`bpe_tokenize`."""
    toks = tokens(F.col(text_col))
    counts = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_vocab_rows)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in counts:
        vocab[tuple(r["w"])] = vocab.get(tuple(r["w"]), 0) + int(r["c"])

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, c in vocab.items():
            for i in range(len(word) - 1):
                p = (word[i], word[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < min_pair_count:
            break
        merges.append(best)
        left, right = best
        merged = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == left and word[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def bpe_tokenize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Per-document subword accounting: ``(id, n_tokens, n_chars_ws,
    bpe_token_count)`` — whitespace token count, non-whitespace char
    count (the BPE starting length: counts before any merge), and the
    post-merge subword count. ``n_chars_ws - bpe_token_count`` is
    exactly the number of merges applied, the compression the merge
    table buys on this corpus."""
    toks = tokens(F.col(text_col))
    counter = bpe_count_udf(merges)
    # spread first: the merge-loop UDF + HOF fold are per-row compute
    # inside the scan stage (single-task on small inputs; no-op at
    # cluster scale — see operators/spread.py)
    df = spread_rows(df, id_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.length(t)
        ).alias("n_chars_ws"),
        counter(F.col(text_col)).alias("bpe_token_count"),
    )
