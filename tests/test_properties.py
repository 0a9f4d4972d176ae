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
