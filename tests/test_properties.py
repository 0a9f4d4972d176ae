"""Property tests pinning operator semantics to independent pure-Python
reference implementations on randomized inputs."""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.operators.dedup import ngram_jaccard_pairs
from machine_learning_algorithm_sparkml__spark.operators.sessions import sessionize


def _py_jaccard_pairs(docs, n=3, threshold=0.5):
    def shingles(text):
        toks = text.split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: shingles(t) for i, t in docs}
    out = set()
    ids = sorted(sets)
    for i_pos, a in enumerate(ids):
        for b in ids[i_pos + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                out.add((a, b))
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["w1", "w2", "w3", "w4"]), min_size=1, max_size=12),
        min_size=2,
        max_size=8,
    )
)
def test_jaccard_pairs_match_python_reference(spark, texts):
    docs = [(i, " ".join(words)) for i, words in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert got == _py_jaccard_pairs(docs)


def _py_sessionize(events, gap_sec=1800):
    out = {}
    by_user = {}
    for eid, uid, ts in events:
        by_user.setdefault(uid, []).append((ts, eid))
    for uid, evs in by_user.items():
        evs.sort()
        sid = -1
        prev = None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap_sec:
                sid += 1
            out[eid] = sid
            prev = ts
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=200_000),  # offset seconds
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_sessionize_matches_python_reference(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    events = [
        (i, uid, base + datetime.timedelta(seconds=off)) for i, (uid, off) in enumerate(rows)
    ]
    df = spark.createDataFrame(events, "event_id long, user_id long, ts timestamp")
    got = {r.event_id: r.session_id for r in sessionize(df, gap_minutes=30).collect()}
    assert got == _py_sessionize(events)


# --- round-4 quality functions vs pure-Python references -----------------------

def _py_gopher(text):
    toks = text.split()
    n = len(toks)
    if n == 0:
        return (0, 0.0, 0.0, 0.0)
    mwl = sum(len(t) for t in toks) / n
    alpha = sum(1 for t in toks if any(c.isascii() and c.isalpha() for c in t)) / n
    rep = 1.0 - len(set(toks)) / n
    return (n, mwl, alpha, rep)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab1! \t")),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_gopher_metrics_match_python_reference(spark, texts):
    from machine_learning_algorithm_sparkml__spark.functions.quality import gopher_flags

    docs = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    flags = gopher_flags(F.col("text"))
    rows = df.select(
        "doc_id",
        flags["n_words"].alias("n"),
        flags["mean_word_len"].alias("mwl"),
        flags["alpha_ratio"].alias("alpha"),
        flags["repetition_ratio"].alias("rep"),
    ).collect()
    for r in rows:
        n, mwl, alpha, rep = _py_gopher(texts[r["doc_id"]])
        assert r["n"] == n, (texts[r["doc_id"]], r)
        assert abs(r["mwl"] - mwl) < 1e-12
        assert abs(r["alpha"] - alpha) < 1e-12
        assert abs(r["rep"] - rep) < 1e-12


def _py_familiarity(docs):
    from collections import Counter

    counts = Counter(t for _, text in docs for t in text.split())
    total = sum(counts.values())
    out = {}
    for i, text in docs:
        toks = text.split()
        if not toks:
            out[i] = (0, 0, 0.0)
        else:
            s = sum(counts[t] for t in toks)
            out[i] = (len(toks), s, s / (len(toks) * total))
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "q"]), min_size=0, max_size=10),
        min_size=1,
        max_size=8,
    )
)
def test_unigram_familiarity_matches_python_reference(spark, texts):
    from machine_learning_algorithm_sparkml__spark.operators.lm import unigram_familiarity

    docs = [(i, " ".join(words)) for i, words in enumerate(texts)]
    if not any(w for _, w in docs):
        return  # all-empty corpus: vocab empty, nothing to score
    df = spark.createDataFrame(docs, "doc_id long, text string")
    expect = _py_familiarity(docs)
    for r in unigram_familiarity(df).collect():
        n_tok, s, fam = expect[r["doc_id"]]
        assert r["n_tok"] == n_tok
        assert r["sum_count"] == s
        assert abs(r["familiarity"] - fam) < 1e-15


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-8.0, max_value=8.0, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_quantize_int8_matches_python_reference(spark, vecs):
    from machine_learning_algorithm_sparkml__spark.operators.quantize import quantize_int8

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    import struct

    for r in quantize_int8(df).collect():
        xs = [struct.unpack("f", struct.pack("f", x))[0] for x in vecs[r["vec_id"]]]
        max_abs = max(abs(x) for x in xs)
        if max_abs == 0.0:
            assert r["scale"] == 0.0 and r["q"] == [0] * len(xs)
            continue
        scale = max_abs / 127.0
        assert abs(r["scale"] - scale) < 1e-18
        for got, x in zip(r["q"], xs):
            # round-half-away (Spark HALF_UP on doubles)
            import decimal

            want = int(
                decimal.Decimal(x / scale).quantize(0, rounding=decimal.ROUND_HALF_UP)
            )
            assert got == want, (x, scale, got, want)
            assert -127 <= got <= 127


def _py_bigram_stats(text):
    toks = [t for t in (text or "").split() if t]
    bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    from collections import Counter

    c = Counter(bgs)
    n = len(bgs)
    distinct = len(c)
    top = max(c.values()) if c else 0
    top_frac = top / n if n else 0.0
    dup_frac = 1.0 - distinct / n if n else 0.0
    return (n, distinct, top, top_frac, dup_frac)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=15),
        min_size=1,
        max_size=8,
    )
)
def test_bigram_signals_match_python_reference(spark, texts):
    from machine_learning_algorithm_sparkml__spark.functions.quality import bigram_signals

    docs = [(i, " ".join(words)) for i, words in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_bigrams"],
            r["distinct_bigrams"],
            r["top_bigram_count"],
            r["top_bigram_frac"],
            r["dup_bigram_frac"],
        )
        for r in bigram_signals(df, ["doc_id"], "text").collect()
    }
    for i, t in docs:
        exp = _py_bigram_stats(t)
        assert got[i][:3] == exp[:3], (i, t, got[i], exp)
        assert abs(got[i][3] - exp[3]) < 1e-15
        assert abs(got[i][4] - exp[4]) < 1e-15


def _py_lang_id(text):
    from machine_learning_algorithm_sparkml__spark.functions.text import LANG_MARKERS

    toks = [t for t in (text or "").split() if t]
    hits = {
        lang: sum(1 for t in toks if t in LANG_MARKERS[lang])
        for lang in sorted(LANG_MARKERS)
    }
    mx = max(hits.values()) if hits else 0
    if mx == 0:
        return "und"
    return min(l for l, h in hits.items() if h == mx)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["the", "der", "le", "el", "und", "zz", "est", "is"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_lang_id_matches_python_reference(spark, texts):
    from machine_learning_algorithm_sparkml__spark.functions.text import lang_id

    docs = [(i, " ".join(words)) for i, words in enumerate(texts)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["pred"]
        for r in df.select("doc_id", lang_id(F.col("text")).alias("pred")).collect()
    }
    for i, t in docs:
        assert got[i] == _py_lang_id(t), (i, t, got[i])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FF),
            min_size=1,
            max_size=24,
        ),
        min_size=1,
        max_size=16,
        unique=True,
    )
)
def test_portable_hash_family_matches_duckdb_on_random_strings(spark, vals):
    """Every oracle upgrade of the r8 round rests on the portable hash
    primitives agreeing across engines for ARBITRARY input strings
    (incl. non-ASCII; md5 operates on utf-8 bytes in both). Replay
    the md5-prefix parses and one affine slot in DuckDB for random
    strings and require bit equality."""
    import duckdb

    from machine_learning_algorithm_sparkml__spark.operators.dedup import (
        MINHASH_PRIME,
        _affine_mod,
        minhash_params,
        portable_hash60,
        portable_hash60b,
    )

    a, b = minhash_params(3)[2]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r.s: (r.h1, r.h2, r.m)
        for r in df.select(
            "s",
            portable_hash60(F.col("s")).alias("h1"),
            portable_hash60b(F.col("s")).alias("h2"),
            _affine_mod(portable_hash60(F.col("s")) % F.lit(MINHASH_PRIME), a, b).alias("m"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.sql(
            f"""SELECT s,
                   CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT),
                   CAST(('0x' || substr(md5(s), 16, 15)) AS BIGINT),
                   ({a} * (CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {MINHASH_PRIME}) + {b}) % {MINHASH_PRIME}
                FROM t"""
        ).fetchall()
    }
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),          # user
            st.integers(min_value=0, max_value=40),         # minutes offset
        ),
        min_size=1,
        max_size=14,
    )
)
def test_session_window_matches_python_reference(spark, events):
    """Fuzz Spark's native session_window (10-minute gap) against a
    python reference that MERGES on gap <= 600 s — the exact-boundary
    semantics the r8 oracle fix pinned. Offsets are whole minutes, so
    exact-gap collisions (10 minutes apart) occur constantly; a
    strictly-less-than merge rule would fail immediately."""
    import datetime as dt

    base = dt.datetime(2020, 1, 1)
    rows = [(u, base + dt.timedelta(minutes=m)) for u, m in events]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = sorted(
        (r.user_id, r.s, r.e, r.n)
        for r in df.groupBy("user_id", F.session_window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("session_window.start").alias("s"),
            F.col("session_window.end").alias("e"),
            "n",
        )
        .collect()
    )
    # python reference: sort per user, break when gap > 600 s (merge
    # AT exactly 600), end = last event + gap
    ref = []
    per_user = {}
    for u, ts in rows:
        per_user.setdefault(u, []).append(ts)
    for u, tss in per_user.items():
        tss.sort()
        start, prev, n = tss[0], tss[0], 1
        for ts in tss[1:]:
            if (ts - prev).total_seconds() > 600:
                ref.append((u, start, prev + dt.timedelta(minutes=10), n))
                start, n = ts, 0
            prev = ts
            n += 1
        ref.append((u, start, prev + dt.timedelta(minutes=10), n))
    assert got == sorted(ref), (got, sorted(ref))
