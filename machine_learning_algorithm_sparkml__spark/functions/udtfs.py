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


def register_udtfs(spark) -> None:
    """Idempotent session registration of the UDTF surface."""
    spark.udtf.register("token_runs", TokenRuns)
