"""Property-based semantics checks for the session-113 operators.

Models: decayed scores against per-event q6-first weights, the
front-coding estimate against a literal LCP model (capped at the
15-byte ladder and block boundaries), the type census against direct
counting. DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_DT0 = datetime.datetime(2025, 1, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_decayed_scores_match_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_DT0 + datetime.timedelta(days=d) for _, d in events],
            }
        ),
    )
    got = con.execute(REGISTRY["decayed_activity_scores"].sql).fetchall()
    now = max(d for _, d in events)
    per: dict[int, list[int]] = {}
    for u, d in events:
        w = _round_away(1_000_000 * (2.0 ** (-(float(now - d) / 7.0))))
        cell = per.setdefault(u, [0, 0])
        cell[0] += w
        cell[1] += 1
    rows = sorted(
        ((u, n, s) for u, (s, n) in per.items()),
        key=lambda r: (-r[2], r[0]),
    )[:10]
    want = [(u, r, n, s) for r, (u, n, s) in enumerate(rows, start=1)]
    assert got == want


def _ladder_lcp(term, prev):
    if prev is None:
        return 0
    p = 0
    for step in (8, 4, 2, 1):
        if step == 8:
            ok = term[:8] == prev[:8]
        else:
            ok = (
                len(term) >= p + 1
                and term[p : p + step] == prev[p : p + step]
            )
        if ok:
            p += step
    return min(p, len(term), len(prev))


_words = st.sampled_from(
    ["a", "ab", "abc", "abcd", "abcdefghij", "abcdefghiz", "b", "ba",
     "zebra", "zebrb", "zz"]
)
_textf = st.lists(_words, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_textf, min_size=1, max_size=10))
def test_frontcoding_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    n_t, raw, saved, share = con.execute(
        REGISTRY["dict_frontcoding_estimate"].sql
    ).fetchall()[0]
    vocab = sorted({w for t in docs for w in t.split()})
    blocks: dict[str, list[str]] = {}
    for w in vocab:
        blocks.setdefault(w[0], []).append(w)
    total_raw = sum(len(w) for w in vocab)
    total_saved = 0
    for terms in blocks.values():
        prev = None
        for w in terms:
            total_saved += _ladder_lcp(w, prev)
            prev = w
    assert (n_t, raw, saved) == (len(vocab), total_raw, total_saved)
    assert share == (1_000_000 * total_saved) // max(total_raw, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_event_type_census_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "event_type": [e for _, e in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["event_type_census"].sql).fetchall()
    }
    tot = len(events)
    model = {}
    for et in {e for _, e in events}:
        n = sum(1 for _, e in events if e == et)
        users = len({u for u, e in events if e == et})
        model[et] = (n, users, (1_000_000 * n) // tot)
    assert got == model
