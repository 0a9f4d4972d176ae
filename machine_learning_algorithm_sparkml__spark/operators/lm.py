"""Corpus unigram language-model scoring (additive, SURVEY.md §7.4).

The classic cheap LM-quality signal for training-data curation: build
a corpus unigram frequency table, then score each document by how
"familiar" its tokens are. Real pipelines (CCNet-style) use a KenLM
perplexity; the engine analogue keeps the same dataflow shape —
corpus-wide token aggregate, then a token-level join back — with
arithmetic that stays oracle-exact (integer sums, one final division;
no ``ln`` whose libm rounding differs across engines).

Scale shape (100 TB): the vocab aggregate is one hash-aggregate with
map-side combine over exploded tokens (zipf-bounded output, far
smaller than the corpus); the score join shuffles by token — the
heavy-hitter tokens are exactly the ones AQE's skew-join splitting
handles, and the per-doc re-aggregate is another map-side-combinable
sum. No driver-side state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.functions.text import token_bigrams, tokens
from machine_learning_algorithm_sparkml__spark.operators.spread import spread_rows


def exploded_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, token) rows — empty/NULL docs contribute no rows. Spread
    first: tokenize+explode is scan-stage per-row work, single-task on
    small inputs (see operators/spread.py; no-op at cluster scale)."""
    return spread_rows(docs, id_col).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )


def unigram_vocab(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus unigram counts: one hash-aggregate (partial + final) over
    the exploded tokens."""
    return exploded_tokens(docs, id_col, text_col).groupBy("token").agg(
        F.count("*").alias("tok_count")
    )


def unigram_familiarity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram familiarity.

    ``familiarity = sum(corpus_count(tok)) / (n_tok * corpus_total)``
    — the mean corpus relative-frequency of the document's tokens.
    High = common/natural text, low = rare-token noise. The numerator
    and both denominator factors are exact integers; the single double
    division at the end is IEEE-deterministic, so the driver's exact
    value hash is stable.

    Docs with no tokens score (0, 0, 0.0) via the left join back to
    the document spine.
    """
    tok = exploded_tokens(docs, id_col, text_col)
    vocab = unigram_vocab(docs, id_col, text_col)
    total = vocab.agg(F.sum("tok_count").alias("n_total"))
    per_doc = (
        tok.join(vocab, "token")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_tok"),
            F.sum("tok_count").alias("sum_count"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
            F.coalesce("sum_count", F.lit(0)).cast("bigint").alias("sum_count"),
            F.when(F.coalesce("n_tok", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("sum_count").cast("double")
                / (F.col("n_tok").cast("double") * F.col("n_total").cast("double"))
            )
            .alias("familiarity"),
        )
    )


def exploded_bigrams(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, w1, w2) rows — one per bigram OCCURRENCE. Projection-only
    construction (two literal-offset slices zipped), no shuffle; docs
    with <2 tokens contribute no rows."""
    pairs = token_bigrams(tokens(F.col(text_col)))
    return spread_rows(docs, id_col).select(
        F.col(id_col), F.explode(pairs).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def bigram_familiarity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document bigram familiarity — the conditional-structure
    step up from :func:`unigram_familiarity` (a document of common
    words in an uncommon ORDER scores high on unigrams but low here).

    Two corpus tables: bigram counts C2(w1,w2) and unigram counts
    C1(w). Per document, over its bigram occurrences:

    - ``bigram_familiarity = sum(C2) / (n_bigrams * total_bigrams)``
      — mean corpus relative-frequency of the document's bigrams;
    - ``conditional_score = sum(C2) / sum(C1(w1))`` — ratio-of-sums
      estimate of next-token predictability given the observed
      first-token mass (the log-free, oracle-exact stand-in for a
      KenLM-style conditional perplexity: numerator and denominator
      are exact integer sums, one IEEE division each — no ``ln``
      whose libm rounding differs across engines).

    Scale shape: both count tables are hash-aggregates with map-side
    combine (zipf-bounded output); the score joins shuffle on the
    bigram and on w1 — hot tokens are AQE-skew-split; the per-doc
    re-aggregate combines map-side. Docs with <2 tokens score zeros
    via the spine left-join.
    """
    bg = exploded_bigrams(docs, id_col, text_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("big_count"))
    c1 = unigram_vocab(docs, id_col, text_col).withColumnRenamed("token", "w1")
    total = c2.agg(F.sum("big_count").alias("n_total_bigrams"))
    per_doc = (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.sum("big_count").cast("bigint").alias("sum_bigram_count"),
            F.sum("tok_count").cast("bigint").alias("sum_first_count"),
        )
    )
    n_big = F.coalesce("n_bigrams", F.lit(0))
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            n_big.alias("n_bigrams"),
            F.coalesce("sum_bigram_count", F.lit(0)).cast("bigint").alias("sum_bigram_count"),
            F.when(n_big == 0, F.lit(0.0))
            .otherwise(
                F.col("sum_bigram_count").cast("double")
                / (n_big.cast("double") * F.col("n_total_bigrams").cast("double"))
            )
            .alias("bigram_familiarity"),
            F.when(n_big == 0, F.lit(0.0))
            .otherwise(
                F.col("sum_bigram_count").cast("double")
                / F.col("sum_first_count").cast("double")
            )
            .alias("conditional_score"),
        )
    )


def token_budget_mixture(
    docs: DataFrame,
    budgets: dict[str, int],
    *,
    default_budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    token_count: "Column | None" = None,
) -> DataFrame:
    """Greedy per-source token-budget fill — the final mixture-
    construction step of a training-data pipeline: each source
    contributes documents (in a deterministic, unbiased md5-of-id
    order) until its token budget is reached; the first document that
    would overshoot, and everything after it, is excluded.

    ``token_count`` overrides the budget denomination (default:
    whitespace ``tokens()`` count) — pass a subword counter column
    (operators/bpe.bpe_count_udf) to budget in the units a training
    run actually pays for.

    Output: one row per input document —
    ``(id, source, n_tokens, cum_tokens, kept)`` where ``cum_tokens``
    is the running total INCLUDING the row, in mixture order, and
    ``kept = cum_tokens <= budget(source)``. All integer arithmetic
    (token counts + cumulative sums), so the verdict is exact on any
    engine — no sampling noise, rerun-identical.

    Scale shape: ONE hash-partition shuffle on the source plus a sort
    within each source partition for the running sum (bounded window
    state; sources are coarse, so AQE's skew handling covers a
    dominant source). The md5 order makes the greedy fill unbiased by
    ingest order and stable under repartitioning — the properties a
    reproducible mixture needs.
    """
    from pyspark.sql import Window

    order_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(source_col).orderBy(order_key).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    budget = F.coalesce(
        *[
            F.when(F.col(source_col) == src, F.lit(b))
            for src, b in sorted(budgets.items())
        ],
        F.lit(default_budget),
    ) if budgets else F.lit(default_budget)
    n_tokens = (
        token_count if token_count is not None else F.size(tokens(F.col(text_col)))
    )
    out = docs.select(
        F.col(id_col),
        F.col(source_col),
        n_tokens.cast("int").alias("n_tokens"),
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
    return out.withColumn("kept", F.col("cum_tokens") <= budget)
