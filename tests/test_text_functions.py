"""Unit + property tests for the text-analysis column expressions,
including NULL/empty/degenerate inputs the parquet testdata never
produces."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.functions.text import (
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    word_token_count,
)


def _eval(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "text string")
    return [r.out for r in df.select(col_fn(F.col("text")).alias("out")).collect()]


def test_token_count_edge_cases(spark):
    out = _eval(spark, token_count, [None, "", "   ", "one", "a b  c", " padded  words "])
    assert out == [0, 0, 0, 1, 3, 2]


def test_word_token_count_mixed(spark):
    out = _eval(spark, word_token_count, [None, "", "hello, world!", "a.b.c"])
    assert out == [0, 0, 4, 5]  # hello , world ! / a . b . c


def test_ratios_bounded(spark):
    vals = [None, "", "...", "no punct here", "a, b; c!"]
    for fn in (punct_ratio, stopword_ratio):
        out = _eval(spark, fn, vals)
        assert all(v is not None and 0.0 <= v <= 1.0 for v in out), (fn, out)


def test_quality_score_bounded(spark):
    out = _eval(spark, quality_score, [None, "", "the of and to in is a " * 10, "x" * 500])
    assert all(v is not None and 0.0 <= v <= 1.0 for v in out), out


def test_lang_id_markers(spark):
    out = _eval(
        spark,
        lang_id,
        [
            "the cat is in the house and it is warm",
            "el gato es de la casa y los perros",
            "der hund ist nicht die katze und",
            "le chat est une belle bete et les",
            "xyzzy qwerty plugh",
            None,
        ],
    )
    assert out == ["en", "es", "de", "fr", "und", "und"]


def test_fingerprint_normalization_invariance(spark):
    out = _eval(
        spark,
        doc_fingerprint,
        ["Hello  World", "hello world", "  HELLO   WORLD  ", "hello worlds"],
    )
    assert out[0] == out[1] == out[2]
    assert out[3] != out[0]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet="ab .,x", max_size=30), min_size=1, max_size=8))
def test_token_count_matches_python_split(spark, texts):
    out = _eval(spark, token_count, texts)
    expected = [len(t.split()) if t else 0 for t in texts]
    assert out == expected


def test_tokens_handle_tabs_newlines_and_padding(spark):
    """trim() strips only spaces — tokenization must still yield no
    empty tokens for tab/newline-only or whitespace-padded text
    (hypothesis-caught on '\\t')."""
    from machine_learning_algorithm_sparkml__spark.functions.text import token_count, tokens

    rows = [(1, "\t"), (2, "\n\n"), (3, "\ta b\n"), (4, "  x  "), (5, None), (6, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n"], r["toks"]) for r in df.select(
        "doc_id",
        token_count(F.col("text")).alias("n"),
        tokens(F.col("text")).alias("toks"),
    ).collect()}
    assert out[1] == (0, [])
    assert out[2] == (0, [])
    assert out[3] == (2, ["a", "b"])
    assert out[4] == (1, ["x"])
    assert out[5] == (0, [])
    assert out[6] == (0, [])
