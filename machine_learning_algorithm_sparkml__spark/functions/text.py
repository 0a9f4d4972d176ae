"""Text-analysis column expressions (SURVEY.md §7.4, north-star).

Everything here is a pure ``pyspark.sql.functions`` composition —
JVM-side, whole-stage-codegen'd, zero Python in the hot path. These
are the per-document scorers a 100 TB training-data pipeline runs
during its first filtering pass, so cost-per-row is the design
constraint: one projection, no shuffles, no UDFs.

Regex discipline: only patterns with identical semantics in Java
regex (Spark) and DuckDB's RE2 (`\\s`, simple alternation, character
classes) so every function stays oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny multilingual marker lexicons for the lang-id heuristic.
#: Deliberately small: at 100 TB the cost is one array-filter pass per doc.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "los", "que", "y", "es"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2", "you3"),
}

#: English stopwords used by the quality score.
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization as an array column: split on runs of ANY
    whitespace, drop empty fragments. NULL / empty / whitespace-only
    text (including tabs and newlines — ``trim`` only strips spaces,
    a bug hypothesis caught on '\\t') all yield an empty array, and
    leading/trailing whitespace never produces empty edge tokens, so
    every downstream count/ratio is total."""
    parts = F.split(F.coalesce(text, F.lit("")), r"\s+")
    return F.filter(parts, lambda t: F.length(t) > 0)


def token_bigrams(toks: Column, combine=None) -> Column:
    """Adjacent-token bigram array from a token array: two
    literal-offset slices zipped ONCE (O(tokens), projection-only);
    <2 tokens -> empty array. ``combine(a, b)`` builds each bigram
    cell — default a (w1, w2) struct; the repetition scorer passes a
    concat for sortable strings. ONE definition of "word bigram"
    shared by functions/quality.bigram_signals and
    operators/lm.exploded_bigrams, so the two can never drift."""
    if combine is None:
        def combine(a, b):
            return F.struct(a.alias("w1"), b.alias("w2"))
    m = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    return F.zip_with(F.slice(toks, 1, m), F.slice(toks, 2, m), combine)


def token_count(text: Column) -> Column:
    """Whitespace token count — the cheap "how long is this document"
    signal (int). Counts maximal non-whitespace runs directly via
    ``regexp_count`` (value-identical to ``size(tokens(text))`` for
    every string, NULL included) instead of materializing the token
    array: the array path goes through an interpreted higher-order
    ArrayFilter per row, the regex count stays inside codegen — ~30%
    cheaper at sf0.1, and this is the per-document first-pass counter
    where cost-per-row is the contract. ``\\S`` is RE2-identical, so
    DuckDB oracles are unaffected."""
    return F.regexp_count(F.coalesce(text, F.lit("")), F.lit(r"\S+"))


def word_token_count(text: Column) -> Column:
    """BPE-ish token count: runs of word characters and single
    non-word-non-space characters each count as one token — a stable
    proxy for subword tokenizer load, still pure regex. NULL-safe.
    """
    return F.regexp_count(F.coalesce(text, F.lit("")), F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are sentence punctuation. NULL-safe
    (null text -> 0.0). Counts matches with ``regexp_count`` rather
    than measuring a ``regexp_replace``-stripped copy — same value for
    every string, but no per-row string allocation (~2x cheaper at
    sf0.1, and this feeds the first-pass quality scorer)."""
    safe = F.coalesce(text, F.lit(""))
    n = F.length(safe)
    punct = F.regexp_count(safe, F.lit(r"[.,;:!?]"))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n.cast("double"))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are (English) stopwords — low values
    flag keyword-stuffed or non-natural text. One fold: count and hits
    accumulate together and the ratio is computed in the finish over
    the bound accumulator, so the token array is built and walked once
    (the size+filter form built it twice — no CSE for interpreted
    higher-order functions)."""
    return F.aggregate(
        tokens(text),
        F.struct(F.lit(0).alias("cnt"), F.lit(0).alias("hits")),
        lambda acc, t: F.struct(
            (acc["cnt"] + 1).alias("cnt"),
            (acc["hits"] + F.when(t.isin(*STOPWORDS), F.lit(1)).otherwise(F.lit(0))).alias("hits"),
        ),
        lambda acc: F.when(acc["cnt"] == 0, F.lit(0.0)).otherwise(
            acc["hits"].cast("double") / acc["cnt"].cast("double")
        ),
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: length band + stopword presence
    - punctuation noise. The exact weighting is a policy choice; the
    engine guarantees determinism and single-pass evaluation."""
    n_tok = token_count(text).cast("double")
    length_component = F.least(n_tok / F.lit(64.0), F.lit(1.0)) * 0.5
    stop_component = F.least(stopword_ratio(text) * F.lit(4.0), F.lit(1.0)) * 0.3
    punct_penalty = F.least(punct_ratio(text) * F.lit(10.0), F.lit(1.0)) * 0.2
    # No rounding: every term is IEEE-deterministic (divisions and
    # multiplies of exact ints), so any engine evaluating the same
    # expression tree produces the bit-identical double.
    return length_component + stop_component + (F.lit(0.2) - punct_penalty)


def lang_id(text: Column) -> Column:
    """Language-ID heuristic: count marker-lexicon hits per language
    over the token array; argmax with alphabetical tie-break; 'und'
    (undetermined) when nothing matches. One projection, no shuffle.

    Structured as a SINGLE ``F.aggregate`` fold: the step accumulates
    one counter per language (each token checks all lexicons in one
    pass over the token array), and the finish computes the argmax
    from the bound accumulator variable. The earlier per-language
    formulation re-evaluated the tokenization once per lexicon and the
    scored array once per argmax reference — interpreted higher-order
    functions get no common-subexpression elimination, so that
    multiplied the per-row cost ~8× (2.2 s → 0.27 s at sf0.1,
    value-identical)."""
    langs = sorted(LANG_MARKERS)  # alphabetical => deterministic ties

    def _step(acc, t):
        return F.struct(*[
            (acc[lang] + F.when(t.isin(*LANG_MARKERS[lang]), F.lit(1)).otherwise(F.lit(0))).alias(lang)
            for lang in langs
        ])

    def _finish(acc):
        # acc is a bound lambda variable: references are attribute
        # reads, not re-evaluations of the fold.
        max_hits = F.greatest(*[acc[lang] for lang in langs])
        winner = F.coalesce(*[
            F.when(acc[lang] == max_hits, F.lit(lang)) for lang in langs
        ])
        return F.when(max_hits == 0, F.lit("und")).otherwise(winner)

    return F.aggregate(
        tokens(text),
        F.struct(*[F.lit(0).alias(lang) for lang in langs]),
        _step,
        _finish,
    )


#: md5-first-hex-char bucketing for the deterministic split: 16 hex
#: chars -> 12/2/2 ~ 75/12.5/12.5. Content- or id-keyed, the split is
#: stable across runs, partitionings, and engines (md5 is md5).
SPLIT_TRAIN_HEX: tuple[str, ...] = tuple("0123456789ab")
SPLIT_VAL_HEX: tuple[str, ...] = ("c", "d")


def hash_split_label(key: Column) -> Column:
    """Deterministic train/val/test assignment from a hash of ``key``
    (use a content fingerprint so duplicate documents always land in
    the SAME split — no train/test leakage through near-copies; or an
    id for pure random-but-stable assignment). Pure projection: no
    shuffle, no RNG state, reproducible on any engine that computes
    md5 of the same bytes."""
    c = F.substring(F.md5(key.cast("string")), 1, 1)
    return (
        F.when(c.isin(*SPLIT_TRAIN_HEX), F.lit("train"))
        .when(c.isin(*SPLIT_VAL_HEX), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 over the normalized
    text (lowercased, whitespace collapsed). Exact-dedup key that is
    stable across storage layout; 32-hex-char string."""
    # collapse BEFORE trim: trim only strips spaces, so leading tabs/
    # newlines survive a trim-first order and change the hash
    normalized = F.trim(F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), r"\s+", " "))
    return F.md5(normalized)


def canonicalize_url(url: Column) -> Column:
    """Canonical URL form for crawl-frontier / corpus dedup: two
    spellings of the same resource must hash identically BEFORE
    exact-dedup sees them, or the dedup silently under-merges.

    Rules (the conservative, semantics-preserving subset):
    - drop the fragment (``#…`` is client-side only);
    - lowercase the scheme and host (case-insensitive per RFC 3986) —
      but NOT the path or query, which are case-sensitive;
    - strip the scheme's DEFAULT port only (``https://h:443`` ≡
      ``https://h``, but ``:8443`` is preserved — it names a
      different server);
    - strip one trailing slash from a non-root path (``/docs/`` ≡
      ``/docs``; the root path stays ``/``);
    - sort query parameters (order is almost never semantic, and
      crawlers see every permutation).

    Pure projection (regexp + array ops, JVM-side, shuffle-free);
    every step is plain-regex-replayable so the DuckDB oracle can
    mirror it literally. Deliberately NOT done: percent-decoding and
    ``www.`` stripping (both change semantics for some sites)."""
    nofrag = F.regexp_replace(F.coalesce(url, F.lit("")), "#.*", "")
    scheme = F.lower(F.regexp_extract(nofrag, "^([^:/?]+)://", 1))
    after = F.regexp_replace(nofrag, "^[^:/?]+://", "")
    hostport = F.lower(F.regexp_extract(after, "^([^/?]+)", 1))
    host = (
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .otherwise(hostport)
    )
    pathquery = F.regexp_replace(after, "^[^/?]+", "")
    path = F.regexp_extract(pathquery, "^([^?]*)", 1)
    cpath = (
        F.when((path == "") | (path == "/"), F.lit("/"))
        .otherwise(F.regexp_replace(path, "/$", ""))
    )
    query = F.regexp_extract(pathquery, r"\?(.*)$", 1)
    cquery = F.when(
        query == "", F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(query, "&")), "&")))
    return F.concat(scheme, F.lit("://"), host, cpath, cquery)


def html_escape(text: Column) -> Column:
    """Minimal HTML entity escape for the fixture side (&, <, > — in
    that order, so already-escaped sequences never double-decode on
    the way back). Literal ``replace``, not regex: DuckDB mirrors it
    with its own literal replace()."""
    out = F.coalesce(text, F.lit(""))
    out = F.replace(out, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    return F.replace(out, F.lit(">"), F.lit("&gt;"))


def html_unescape(text: Column) -> Column:
    """Inverse of :func:`html_escape` plus the ``&quot;``/``&#39;``
    forms a crawl actually sees; ``&amp;`` decodes LAST so escaped
    ampersands cannot cascade into a second decode."""
    out = F.replace(text, F.lit("&lt;"), F.lit("<"))
    out = F.replace(out, F.lit("&gt;"), F.lit(">"))
    out = F.replace(out, F.lit("&quot;"), F.lit('"'))
    out = F.replace(out, F.lit("&#39;"), F.lit("'"))
    return F.replace(out, F.lit("&amp;"), F.lit("&"))


def html_title(html: Column) -> Column:
    """``<title>`` content, entity-decoded. ``(?s)`` because titles
    may wrap across lines."""
    return html_unescape(F.regexp_extract(html, r"(?s)<title>(.*?)</title>", 1))


def html_main_text(html: Column) -> Column:
    """Main-content extraction — the first transform a crawled page
    goes through before any quality/dedup signal, kept ENTIRELY
    JVM-side (regexp/replace chain, shuffle-free; at 100 TB a Python
    hop here would dominate the whole pipeline):

    1. drop ``<head>`` wholesale (its text — title/style/script — is
       not content);
    2. drop ``<script>``/``<style>`` blocks (their BODIES contain
       ``<``/``&`` that are not markup — block removal must precede
       tag stripping or ``1 < 2`` in a script leaks into the text);
    3. drop ``<nav>``/``<footer>`` blocks (boilerplate);
    4. strip remaining tags to spaces;
    5. entity-decode;
    6. collapse whitespace and trim.

    Deliberately regex-based and minimal: a real crawl pipeline uses
    exactly this shape for the 99% path and routes pathological
    documents (unclosed blocks, CDATA) to a quarantine; every step is
    replayable literally by the DuckDB oracle."""
    out = F.coalesce(html, F.lit(""))
    out = F.regexp_replace(out, r"(?s)<head>.*?</head>", " ")
    out = F.regexp_replace(out, r"(?s)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?s)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<nav[^>]*>.*?</nav>", " ")
    out = F.regexp_replace(out, r"(?s)<footer[^>]*>.*?</footer>", " ")
    out = F.regexp_replace(out, r"<[^>]+>", " ")
    out = html_unescape(out)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def fixture_html_page(doc_id: Column, text: Column) -> Column:
    """The deterministic HTML page fixture shared by
    ``text_html_extract``, the WARC-of-HTML ingestion key, and the
    link-extraction key: head with title/style/script, a nav block
    carrying three OUTLINKS (anchors live inside nav ON PURPOSE — the
    main-text extraction drops nav wholesale, so link extraction and
    boilerplate stripping read the same page without coupling their
    oracles), footer boilerplate, an entity-escaped body paragraph,
    and a body script whose bare ``1 < 2`` leaks into the text unless
    block removal precedes tag stripping. One definition — the keys
    can never drift."""
    did = doc_id.cast("string")

    def link(k: int) -> Column:
        return F.concat(
            F.lit(f'<a href="/docs/'),
            ((doc_id * 7 + k * 13) % 1000).cast("string"),
            F.lit(f'">ref {k}</a>'),
        )

    return F.concat(
        F.lit("<html><head><title>Doc "),
        did,
        F.lit('</title>\n<style>body { color: #333; }</style>\n'
              '<script>var t = 1 < 2 && "x";</script></head>\n<body>\n'
              "<nav>Home | About | Archive "),
        link(0),
        F.lit(" "),
        link(1),
        F.lit(" "),
        link(2),
        F.lit("</nav>\n<h1>Doc "),
        did,
        F.lit(" &amp; co</h1>\n<p>"),
        html_escape(text),
        F.lit("</p>\n<script>track(1 < 2);</script>\n"
              "<footer>corpus.example.com &copy; 2026</footer>\n</body></html>"),
    )


def html_links(html: Column) -> Column:
    """Outlink extraction — the LINK-GRAPH input of a crawl pipeline,
    entirely JVM-side: ``regexp_extract_all`` over anchor tags yields
    zipped (href, anchor-text) structs, ready to explode into the edge
    list PageRank/domain-authority jobs consume. Double-quoted hrefs
    only (the fixture's shape); anchor text is entity-decoded."""
    hrefs = F.regexp_extract_all(html, F.lit('<a href="([^"]+)"[^>]*>'), 1)
    texts = F.regexp_extract_all(html, F.lit('<a href="[^"]+"[^>]*>(.*?)</a>'), 1)
    return F.zip_with(
        hrefs,
        texts,
        lambda h, t: F.struct(h.alias("href"), html_unescape(t).alias("anchor")),
    )


#: Mojibake detector: 'Ã' (the latin1 reading of UTF-8 lead byte C3)
#: followed by a character in U+0080-00BF — the latin1 reading of a
#: UTF-8 CONTINUATION byte (80-BF). That pair is the signature of
#: UTF-8 text decoded as ISO-8859-1 and re-encoded (the most common
#: crawl encoding damage: 'café' reads 'cafÃ©'); organic text never
#: puts a continuation-range character after 'Ã'.
MOJIBAKE_PATTERN = "Ã[\u0080-\u00bf]"


def repair_mojibake(text: Column) -> Column:
    """Repair DOUBLE-ENCODED UTF-8 (mojibake): text that went
    utf8-bytes → decoded-as-latin1 → stored, so 'café' reads 'cafÃ©'.
    The repair is the true inverse — re-encode the damaged string as
    ISO-8859-1 (recovering the original UTF-8 bytes, exact because
    latin1 maps code points 0-255 to themselves) and decode as UTF-8 —
    applied ONLY when the mojibake signature is present: undamaged
    text must pass through byte-identical, and ASCII round-trips
    either way. Entirely JVM-side (encode/decode/rlike), shuffle-free
    — the projection shape of a first-pass crawl cleanup at 100 TB."""
    raw = F.coalesce(text, F.lit(""))
    return F.when(
        raw.rlike(MOJIBAKE_PATTERN), F.decode(F.encode(raw, "ISO-8859-1"), "UTF-8")
    ).otherwise(raw)


def is_mojibake(text: Column) -> Column:
    """TRUE iff the mojibake signature is present (the repair gate)."""
    return F.coalesce(text, F.lit("")).rlike(MOJIBAKE_PATTERN)
