"""Gopher-style document-quality signals (additive, SURVEY.md §7.4).

Heuristic quality rules in the style of the Gopher/MassiveText
filtering pipeline (Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", §A1.1): word-count
band, mean word length band, alphabetic-word ratio, and repeated-token
ratio. Like ``functions/text.py``, every signal is a pure
``pyspark.sql.functions`` composition — one projection, no shuffle, no
UDF — because these run as the first filtering pass over the full
corpus.

Determinism contract (driver hashes exact values): every ratio here is
an integer-over-integer single division — bit-identical on any IEEE
engine regardless of row or partition order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.functions.text import token_bigrams, tokens

#: Gopher-style acceptance bands (policy constants; the engine
#: guarantees determinism, the bands are tunable).
GOPHER_MIN_WORDS = 40
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 12.0
GOPHER_MIN_ALPHA_RATIO = 0.7
GOPHER_MAX_REPETITION = 0.4
#: Bigram-repetition acceptance bands (Gopher's n-gram repetition
#: family, word-bigram variant; occurrence fractions, not char
#: fractions — policy constants, not tuned claims).
BIGRAM_MAX_TOP_FRAC = 0.20
BIGRAM_MAX_DUP_FRAC = 0.90


def word_repetition_ratio(text: Column) -> Column:
    """Fraction of tokens that are repeats of an earlier token:
    ``1 - distinct/total``. High values flag boilerplate / keyword
    stuffing (the doc-level cousin of Gopher's duplicate-line
    fraction). 0.0 for empty docs. Exact: two int counts, one
    division."""
    toks = tokens(text)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - n_distinct.cast("double") / n.cast("double")
    )


def mean_word_length(text: Column) -> Column:
    """Mean characters per whitespace token. 0.0 for empty docs.
    Exact: total non-whitespace chars (int) / token count (int)."""
    toks = tokens(text)
    n = F.size(toks)
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.when(n == 0, F.lit(0.0)).otherwise(
        total_chars.cast("double") / n.cast("double")
    )


def alpha_word_ratio(text: Column) -> Column:
    """Fraction of tokens containing at least one ASCII letter —
    Gopher's "80% of words contain an alphabetic character" rule.
    0.0 for empty docs."""
    toks = tokens(text)
    n = F.size(toks)
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return F.when(n == 0, F.lit(0.0)).otherwise(
        n_alpha.cast("double") / n.cast("double")
    )


def bigram_signals(df: DataFrame, id_cols: list[str], text_col: str = "text") -> DataFrame:
    """Word-bigram repetition signals as a SHUFFLE-FREE projection —
    the n-gram cousin of :func:`word_repetition_ratio`. Returns
    ``id_cols`` + (n_bigrams, distinct_bigrams, top_bigram_count,
    top_bigram_frac, dup_bigram_frac, bigram_repetition_ok).

    Plan shape is the point, twice over:

    1. No shuffle: the naive formulation explodes bigrams and
       aggregates twice (shuffling ~n_tokens rows per doc, twice);
       here bigrams are built by zipping the token array with itself
       shifted by one, and all three integer stats come from ONE
       ``F.aggregate`` fold over the SORTED bigram array — total
       count, distinct count (= number of run starts), and the top
       bigram's multiplicity (= max run length).
    2. No re-evaluation: interpreted higher-order functions get no
       common-subexpression elimination, so emitting each stat as its
       own column would rebuild the tokenize→zip→sort pipeline per
       column (measured 4× the single-column cost at sf0.1). The fold
       returns one struct, materialized ONCE per row through
       ``F.inline`` — a generator, which blocks projection collapse —
       and the fractions then derive from plain attribute columns.

    Zero shuffles, zero Python. Counts are ints; each fraction is one
    final double division (bit-exact on any IEEE engine).
    """
    toks = tokens(F.col(text_col))
    bigrams = F.array_sort(
        token_bigrams(toks, combine=lambda a, b: F.concat_ws(" ", a, b))
    )

    def _step(acc, x):
        is_run = x.eqNullSafe(acc["prev"])
        run = F.when(is_run, acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(run, acc["best"]).alias("best"),
            (acc["cnt"] + 1).alias("cnt"),
            (acc["distinct"] + F.when(is_run, F.lit(0)).otherwise(F.lit(1))).alias(
                "distinct"
            ),
        )

    stats = F.aggregate(
        bigrams,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(0).alias("cnt"),
            F.lit(0).alias("distinct"),
        ),
        _step,
        lambda acc: F.struct(
            acc["cnt"].alias("n_bigrams"),
            acc["distinct"].alias("distinct_bigrams"),
            acc["best"].alias("top_bigram_count"),
        ),
    )
    mid = df.select(*id_cols, F.inline(F.array(stats)))
    n = F.col("n_bigrams")
    top_frac = F.when(n == 0, F.lit(0.0)).otherwise(
        F.col("top_bigram_count").cast("double") / n.cast("double")
    )
    dup_frac = F.when(n == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.col("distinct_bigrams").cast("double") / n.cast("double")
    )
    return mid.select(
        *id_cols,
        "n_bigrams",
        "distinct_bigrams",
        "top_bigram_count",
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_bigram_frac"),
        ((top_frac <= BIGRAM_MAX_TOP_FRAC) & (dup_frac <= BIGRAM_MAX_DUP_FRAC)).alias(
            "bigram_repetition_ok"
        ),
    )


def gopher_signals(df: DataFrame, id_cols: list[str], text_col: str = "text") -> DataFrame:
    """The Gopher rule metrics + verdicts as ONE fold per row — the
    production path for :func:`gopher_flags` (which remains the
    readable per-column spec; equivalence is pinned in tests).

    Same two plan-shape points as :func:`bigram_signals`: interpreted
    higher-order functions get no common-subexpression elimination, so
    the per-column formulation rebuilds the token array for every
    metric (~3.5× the single-metric cost at sf0.1). Here a single
    ``F.aggregate`` over the SORTED token array accumulates (count,
    total chars, alphabetic tokens, distinct tokens = run starts) in
    one pass, materialized once per row via the ``F.inline`` generator;
    ratios and verdicts then derive from plain attribute columns.
    Integer-exact: every ratio is one final double division."""
    toks_sorted = F.array_sort(tokens(F.col(text_col)))

    def _step(acc, x):
        is_new = ~x.eqNullSafe(acc["prev"])
        return F.struct(
            x.alias("prev"),
            (acc["cnt"] + 1).alias("cnt"),
            (acc["chars"] + F.length(x)).alias("chars"),
            (acc["alpha"] + F.when(x.rlike("[A-Za-z]"), F.lit(1)).otherwise(F.lit(0))).alias(
                "alpha"
            ),
            (acc["distinct"] + F.when(is_new, F.lit(1)).otherwise(F.lit(0))).alias(
                "distinct"
            ),
        )

    stats = F.aggregate(
        toks_sorted,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("cnt"),
            F.lit(0).alias("chars"),
            F.lit(0).alias("alpha"),
            F.lit(0).alias("distinct"),
        ),
        _step,
        lambda acc: F.struct(
            acc["cnt"].alias("n_words"),
            acc["chars"].alias("_chars"),
            acc["alpha"].alias("_alpha"),
            acc["distinct"].alias("_distinct"),
        ),
    )
    mid = df.select(*id_cols, F.inline(F.array(stats)))
    n = F.col("n_words")
    mwl = F.when(n == 0, F.lit(0.0)).otherwise(
        F.col("_chars").cast("double") / n.cast("double")
    )
    alpha = F.when(n == 0, F.lit(0.0)).otherwise(
        F.col("_alpha").cast("double") / n.cast("double")
    )
    rep = F.when(n == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.col("_distinct").cast("double") / n.cast("double")
    )
    len_ok = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    mwl_ok = (mwl >= GOPHER_MIN_MEAN_WORD_LEN) & (mwl <= GOPHER_MAX_MEAN_WORD_LEN)
    alpha_ok = alpha >= GOPHER_MIN_ALPHA_RATIO
    rep_ok = rep <= GOPHER_MAX_REPETITION
    return mid.select(
        *id_cols,
        "n_words",
        mwl.alias("mean_word_len"),
        alpha.alias("alpha_ratio"),
        rep.alias("repetition_ratio"),
        len_ok.alias("len_ok"),
        mwl_ok.alias("mean_word_len_ok"),
        alpha_ok.alias("alpha_ok"),
        rep_ok.alias("repetition_ok"),
        (len_ok & mwl_ok & alpha_ok & rep_ok).alias("gopher_ok"),
    )


def token_entropy_signals(df: DataFrame, id_cols: list[str], text_col: str = "text") -> DataFrame:
    """Per-document token Shannon entropy — the distribution-shape
    quality signal the count-based Gopher rules can't see (a doc that
    repeats five words in rotation passes ``repetition_ratio`` checks
    scaled to the TOP token but scores near log2(5) here, far below a
    natural-text entropy).

    Same SHUFFLE-FREE plan shape as :func:`gopher_signals` — the point
    at 100 TB: the naive formulation explodes tokens and aggregates
    twice (shuffling ~n_tokens rows per doc across the cluster, with
    the (doc, token) term-frequency frame as an intermediate); here
    term frequencies are RUN LENGTHS of the sorted token array, and
    one ``F.aggregate`` fold accumulates Σ c·log2(c) as each run
    closes — zero exchanges, zero Python, one pass per row,
    materialized once via the ``F.inline`` generator (interpreted
    higher-order functions get no CSE — the bigram_signals rule).

    entropy = log2(n) − (Σ c·log2(c))/n, rounded to 6 (the one
    non-integer: log2 is irrational, and the oracle's per-group SUM
    order differs — same rounding contract as the cosine keys).
    Zero-token docs score (0, 0, 0.0)."""
    toks_sorted = F.array_sort(tokens(F.col(text_col)))

    def _close(run):
        # a closing run of length c contributes c*log2(c); log2(1)=0
        return F.when(run > 1, run.cast("double") * F.log2(run.cast("double"))).otherwise(F.lit(0.0))

    def _step(acc, x):
        is_run = x.eqNullSafe(acc["prev"])
        return F.struct(
            x.alias("prev"),
            (F.when(is_run, acc["run"] + 1).otherwise(F.lit(1))).alias("run"),
            (acc["clog"] + F.when(is_run, F.lit(0.0)).otherwise(_close(acc["run"]))).alias("clog"),
            (acc["types"] + F.when(is_run, F.lit(0)).otherwise(F.lit(1))).alias("types"),
            (acc["cnt"] + 1).alias("cnt"),
        )

    stats = F.aggregate(
        toks_sorted,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0.0).alias("clog"),
            F.lit(0).alias("types"),
            F.lit(0).alias("cnt"),
        ),
        _step,
        lambda acc: F.struct(
            acc["cnt"].alias("n_tokens"),
            acc["types"].alias("n_types"),
            (acc["clog"] + _close(acc["run"])).alias("_clog"),
        ),
    )
    mid = df.select(*id_cols, F.inline(F.array(stats)))
    n = F.col("n_tokens")
    entropy = F.when(n == 0, F.lit(0.0)).otherwise(
        F.round(F.log2(n.cast("double")) - F.col("_clog") / n.cast("double"), 6)
    )
    return mid.select(
        *id_cols,
        "n_tokens",
        "n_types",
        entropy.alias("token_entropy"),
    )


def gopher_flags(text: Column) -> dict[str, Column]:
    """The individual Gopher rule verdicts plus the conjunction.
    Returned as named columns so a pipeline can log WHY a doc was
    dropped (per-rule rejection rates are the standard corpus-health
    dashboard). NOTE: this per-column form re-evaluates the token
    array per metric (no CSE for interpreted higher-order functions) —
    the corpus-scale scoring pass is :func:`gopher_signals`, which
    computes identical values in one fold (equivalence pinned in
    tests); this form remains the readable spec and the building block
    for ad-hoc single-metric use."""
    n = F.size(tokens(text))
    mwl = mean_word_length(text)
    alpha = alpha_word_ratio(text)
    rep = word_repetition_ratio(text)
    len_ok = (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
    mwl_ok = (mwl >= GOPHER_MIN_MEAN_WORD_LEN) & (mwl <= GOPHER_MAX_MEAN_WORD_LEN)
    alpha_ok = alpha >= GOPHER_MIN_ALPHA_RATIO
    rep_ok = rep <= GOPHER_MAX_REPETITION
    return {
        "n_words": n,
        "mean_word_len": mwl,
        "alpha_ratio": alpha,
        "repetition_ratio": rep,
        "len_ok": len_ok,
        "mean_word_len_ok": mwl_ok,
        "alpha_ok": alpha_ok,
        "repetition_ok": rep_ok,
        "gopher_ok": len_ok & mwl_ok & alpha_ok & rep_ok,
    }
