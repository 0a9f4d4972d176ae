"""Unit + property tests for the text-analysis column expressions,
including NULL/empty/degenerate inputs the parquet testdata never
produces."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.sources import load_table
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


def test_canonicalize_url_rules(spark):
    """Each canonicalization rule on a crafted URL, plus the
    non-rules: non-default ports, path/query case, and scheme are
    preserved (merging across those would be semantic corruption)."""
    from machine_learning_algorithm_sparkml__spark.functions.text import canonicalize_url

    cases = [
        # (id, raw, expected-canonical)
        (1, "HTTPS://WWW.Ex.COM:443/Docs/A/?b=2&a=1#frag",
            "https://www.ex.com/Docs/A?a=1&b=2"),
        (2, "https://www.ex.com/docs/a", "https://www.ex.com/docs/a"),
        (3, "http://ex.com:80/", "http://ex.com/"),
        (4, "http://ex.com", "http://ex.com/"),
        (5, "https://ex.com:8443/x", "https://ex.com:8443/x"),  # non-default port kept
        (6, "http://ex.com:443/x", "http://ex.com:443/x"),      # 443 is not http's default
        (7, "https://ex.com/CaseSensitive?Q=V", "https://ex.com/CaseSensitive?Q=V"),
        (8, "http://ex.com/a", "http://ex.com/a"),               # scheme preserved
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases], "id long, url string")
    got = {r["id"]: r["c"] for r in df.select("id", canonicalize_url(F.col("url")).alias("c")).collect()}
    for i, _, want in cases:
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_dedup_url_merges_variants_not_schemes(spark, sf_dir):
    """The three https spellings of a (source, path) merge into one
    canonical row with their min doc_id; the http twin stays its own
    row (scheme is semantic)."""
    from machine_learning_algorithm_sparkml__spark.workload.llm import q_dedup_url

    rows = q_dedup_url(spark, sf_dir).collect()
    by_url = {r["canonical_url"]: r for r in rows}
    https = [u for u in by_url if u.startswith("https://")]
    http = [u for u in by_url if u.startswith("http://")]
    assert https and http
    # every https row merged at least 2 variants somewhere in the set
    assert any(by_url[u]["n_variants"] >= 2 for u in https)
    # no canonical url carries a port, a fragment, or an unsorted query
    for u, r in by_url.items():
        assert ":443" not in u and ":80" not in u and "#" not in u
        if "?" in u:
            params = u.split("?", 1)[1].split("&")
            assert params == sorted(params)
    # keeper = min doc_id per canonical group: recompute the grouping
    # independently from the fixture's construction rule
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    groups = {}
    for d in docs:
        scheme = "http" if d["doc_id"] % 4 == 3 else "https"
        key = f"{scheme}://www.{d['source']}.example.com/docs/{d['doc_id'] % 50}?a=1&b=2"
        groups.setdefault(key, []).append(d["doc_id"])
    assert len(groups) == len(by_url)
    for key, ids in groups.items():
        assert by_url[key]["keep_doc_id"] == min(ids)
        assert by_url[key]["n_variants"] == len(ids)


def test_html_extraction_blocks_entities_and_plan(spark, sf_dir):
    """html_main_text: block removal before tag stripping (a script's
    bare ``1 < 2`` must never leak into the text), nav/footer
    boilerplate dropped, entities decoded exactly once, and the whole
    key stays a shuffle-free projection."""
    from machine_learning_algorithm_sparkml__spark.functions.text import (
        html_escape,
        html_main_text,
        html_title,
        html_unescape,
    )
    from machine_learning_algorithm_sparkml__spark.plans import formatted_plan
    from machine_learning_algorithm_sparkml__spark.workload.quality import (
        q_text_html_extract,
    )

    page = (
        "<html><head><title>T &amp; U</title><style>a { x: 1; }</style>"
        "</head><body><nav>Home | About</nav>"
        "<script>if (1 < 2 && 3 > 0) { track(); }</script>"
        "<h1>Heading</h1><p>alpha &lt;tag&gt; &amp;amp; beta</p>"
        "<footer>footer text</footer></body></html>"
    )
    df = spark.createDataFrame([(1, page)], "id long, html string")
    row = df.select(
        html_title(F.col("html")).alias("t"),
        html_main_text(F.col("html")).alias("m"),
    ).collect()[0]
    assert row["t"] == "T & U"
    # script body, nav, footer, style all gone; entities decoded ONCE
    # (&amp;amp; -> &amp;, never cascading to &)
    assert row["m"] == "Heading alpha <tag> &amp; beta"

    # escape -> unescape is the identity, including on pre-escaped text
    tricky = 'a & b < c > d "q" &lt;already&gt; &#39;'
    got = (
        spark.createDataFrame([(tricky,)], "text string")
        .select(html_unescape(html_escape(F.col("text"))).alias("x"))
        .collect()[0]["x"]
    )
    assert got == tricky

    # the workload key is a pure projection: no Exchange anywhere
    plan = formatted_plan(q_text_html_extract(spark, sf_dir))
    assert "Exchange" not in plan, "HTML extraction must stay shuffle-free"


def test_html_links_edge_list(spark, sf_dir):
    """Outlink extraction yields exactly the fixture's three nav links
    per doc with the closed-form targets, anchors entity-decoded, and
    the key stays a shuffle-free projection+explode. The main-text
    keys must NOT see the anchors (nav is dropped wholesale)."""
    from machine_learning_algorithm_sparkml__spark.functions.text import (
        fixture_html_page,
        html_links,
        html_main_text,
    )
    from machine_learning_algorithm_sparkml__spark.plans import formatted_plan
    from machine_learning_algorithm_sparkml__spark.workload.quality import (
        q_text_html_links,
    )

    rows = q_text_html_links(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["href"], r["anchor"]))
    for did, edges in list(by_doc.items())[:20]:
        assert sorted(edges) == sorted(
            (f"/docs/{(did * 7 + k * 13) % 1000}", f"ref {k}") for k in range(3)
        )
    assert all(len(v) == 3 for v in by_doc.values())

    # anchors with entities decode once; main text never sees the nav
    df = spark.createDataFrame([(1, "body words")], "doc_id long, text string")
    page = df.select(
        "doc_id", fixture_html_page(F.col("doc_id"), F.col("text")).alias("html")
    )
    links = page.select(html_links(F.col("html")).alias("l")).collect()[0]["l"]
    assert [e["anchor"] for e in links] == ["ref 0", "ref 1", "ref 2"]
    main = page.select(html_main_text(F.col("html")).alias("m")).collect()[0]["m"]
    assert "ref 0" not in main and "/docs/" not in main

    plan = formatted_plan(q_text_html_links(spark, sf_dir))
    assert "Exchange" not in plan, "link extraction must stay shuffle-free"
