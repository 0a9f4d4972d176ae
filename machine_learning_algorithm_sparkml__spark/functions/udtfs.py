"""Python user-defined table functions (Spark 4 UDTF API).

The extension point for one-row-to-N-rows logic with PER-ROW
SEQUENTIAL STATE — tokenize-and-merge passes, parser emitters, run
encoders — where a built-in explode() gives the rows but not the
running state between them. A UDTF class's ``eval`` yields any
number of output rows per input row and participates in SQL as a
lateral table function, so the call site stays declarative and
Catalyst still prunes/pushes around it.

Scale contract: the UDTF crossing is Python (Arrow-batched when
``useArrow`` is on) and sees ONE input row at a time — keep it off
the widest hot path when a built-in composition exists, and keep
per-call state bounded by the row (these are, by construction,
embarrassingly parallel: no state survives between input rows, so
the operator scales like a map).

``TokenRuns`` is the demonstrator: run-length encoding of each
document's token stream. The sequential merge is natural imperative
code here, while the declarative equivalent needs the two-window
change-point trick (lag + running sum) — which is exactly what the
DuckDB oracle runs, so the whole UDTF crossing is value-checked
against the windowed form.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.types import IntegerType, StringType, StructType
from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult


@udtf(returnType="run_idx: int, token: string, run_len: int", useArrow=True)
class TokenRuns:
    """Lateral table function: split ``text`` on single spaces and
    merge consecutive equal tokens into runs, yielding one row per
    run with a 1-based running index. Empty tokens (leading/trailing
    or doubled spaces) participate like any other token so the
    semantics stay exactly string_split-compatible."""

    def eval(self, text: str):
        if text is None:
            return
        run_idx = 0
        current = None
        count = 0
        for tok in text.split(" "):
            if current is not None and tok == current:
                count += 1
                continue
            if current is not None:
                run_idx += 1
                yield (run_idx, current, count)
            current, count = tok, 1
        if current is not None:
            run_idx += 1
            yield (run_idx, current, count)


@udtf(
    returnType=(
        "source: string, n_docs: bigint, n_tokens: bigint, "
        "max_tokens: bigint, top_doc_id: bigint"
    )
)
class PartitionTokenStats:
    """Polymorphic table function over a TABLE argument with
    ``PARTITION BY``: consumes every row of one partition through
    ``eval`` while accumulating state, then emits a single EPILOGUE
    row from ``terminate()`` — the per-partition-summary shape
    (per-shard digests, parser footers, batch manifests) that a
    per-row UDTF cannot express because no per-row call knows it is
    the last. Spark instantiates the class once per distinct
    partition value and calls ``terminate()`` at partition end, so
    the state never crosses partitions and the operator scales like
    a shuffle + streaming fold.

    The accumulated facts (count, token total, max, min-id argmax)
    are order-independent, so the epilogue is deterministic under any
    row order within the partition — which is what lets a plain
    GROUP BY replay the whole imperative crossing in the oracle."""

    def __init__(self):
        self.source = None
        self.n_docs = 0
        self.n_tokens = 0
        self.max_tokens = -1
        self.top_doc_id = None

    def eval(self, row):
        self.source = row["source"]
        self.n_docs += 1
        if row["text"] is None:
            # SQL aggregate semantics (ADVICE r9): a NULL text has a
            # NULL token length, which SUM/MAX and the argmax all
            # ignore — only n_docs (COUNT(*)) sees the row. An
            # all-NULL partition therefore emits NULL stats, exactly
            # what the GROUP BY oracle computes.
            return
        ntok = len(row["text"].split(" "))
        self.n_tokens += ntok
        if ntok > self.max_tokens or (
            ntok == self.max_tokens and row["doc_id"] < self.top_doc_id
        ):
            self.max_tokens = ntok
            self.top_doc_id = row["doc_id"]

    def terminate(self):
        if self.n_docs:
            all_null = self.top_doc_id is None
            yield (
                self.source,
                self.n_docs,
                None if all_null else self.n_tokens,
                None if all_null else self.max_tokens,
                self.top_doc_id,
            )


class _SplitCols:
    """Polymorphic-SCHEMA table function (Spark 4 ``analyze()``): the
    output schema is COMPUTED from the call's constant argument at
    plan time — ``split_cols(text, 3)`` resolves to columns
    (tok0..tok2, n_extra) before any data moves, so Catalyst prunes
    and type-checks against the call-site-specific shape. This is the
    third UDTF capability next to the per-row lateral (TokenRuns) and
    the terminate()-epilogue fold (PartitionTokenStats): schema as a
    function of arguments — the CSV-splitter / pivot-like shape where
    the column count is a parameter, not a constant of the class.
    ``analyze`` REQUIRES the width to be a foldable literal
    (``isConstantExpression``): a data-dependent width has no plan-
    time schema, and the assertion turns that mistake into an analysis
    error instead of a runtime surprise."""

    @staticmethod
    def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
        assert n.isConstantExpression and isinstance(n.value, int) and n.value > 0, (
            "split_cols width must be a positive integer literal"
        )
        schema = StructType()
        for i in range(n.value):
            schema = schema.add(f"tok{i}", StringType())
        schema = schema.add("n_extra", IntegerType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, n: int):
        toks = ("" if text is None else text).split(" ")
        yield tuple(toks[i] if i < len(toks) else None for i in range(n)) + (
            max(0, len(toks) - n),
        )


SplitCols = udtf(_SplitCols)


def register_udtfs(spark) -> None:
    """Idempotent session registration of the UDTF surface."""
    spark.udtf.register("token_runs", TokenRuns)
    spark.udtf.register("partition_token_stats", PartitionTokenStats)
    spark.udtf.register("split_cols", SplitCols)
