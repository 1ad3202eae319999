"""Property-based semantics checks for the session-66 operators.

Models: a first-occurrence vocabulary model (with the cumulative ==
total-vocab closure invariant), a gaps-and-islands session model with
exact durations, and a pair-distance bucket model over the minhash-band
graph. DuckDB-only.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _SESSION_GAP_US, REGISTRY

_W = ["aa", "bb", "cc", "dd", "ee", "ff"]
_text = st.lists(st.sampled_from(_W), min_size=0, max_size=6).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=15))
def test_vocab_growth_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {r[0]: (r[1], r[2]) for r in con.execute(REGISTRY["vocab_growth_curve"].sql).fetchall()}
    n = len(docs)
    first: dict[str, int] = {}
    for d, t in enumerate(docs):
        dec = (d * 10) // n
        for w in t.split():
            first[w] = min(first.get(w, dec), dec)
    per = {d: 0 for d in range(10)}
    for w, d in first.items():
        per[d] += 1
    cum = 0
    model = {}
    for d in range(10):
        cum += per[d]
        model[d] = (per[d], cum)
    assert got == model
    assert got[9][1] == len(first)  # closure: cumulative ends at |vocab|


_ev = st.tuples(
    st.integers(min_value=0, max_value=4_000_000_000),  # ts_us (~66 min span)
    st.integers(min_value=0, max_value=3),  # user
)


@settings(max_examples=40, deadline=None)
@given(evs=st.lists(_ev, min_size=1, max_size=30))
def test_session_durations_match_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "ts": pd.to_datetime(
                    pd.Series([t for t, _ in evs], dtype="int64"), unit="us"
                ),
                "user_id": [u for _, u in evs],
                "value": [1.0] * len(evs),
            }
        ),
    )
    got = {r[0]: (r[1], r[2]) for r in con.execute(REGISTRY["session_duration_histogram"].sql).fetchall()}
    seqs: dict[int, list] = {}
    for i, (t, u) in enumerate(evs):
        seqs.setdefault(u, []).append((t, i))
    hist: dict[int, list[int]] = {}
    for rows in seqs.values():
        rows.sort()
        sessions = [[rows[0]]]
        for a, b in zip(rows, rows[1:]):
            if b[0] - a[0] > _SESSION_GAP_US:
                sessions.append([])
            sessions[-1].append(b)
        for sess in sessions:
            dur = sess[-1][0] - sess[0][0]
            bkt = -1 if dur == 0 else dur.bit_length() - 1
            cell = hist.setdefault(bkt, [0, 0])
            cell[0] += 1
            cell[1] += len(sess)
    assert got == {k: tuple(v) for k, v in hist.items()}
    # events conserve across the histogram
    assert sum(v[1] for v in got.values()) == len(evs)


def _mh_bands(text: str) -> set[str]:
    ws = text.lower().split()
    sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    if not sh:
        return set()
    mh = [min(hashlib.md5(f"{k}:{s}".encode()).hexdigest() for s in sh) for k in range(4)]
    return {mh[0] + mh[1], mh[2] + mh[3]}


_dup_text = st.lists(
    st.sampled_from(["aa bb cc dd", "aa bb cc", "ee ff gg hh"]),
    min_size=1,
    max_size=2,
).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_dup_text, min_size=2, max_size=9))
def test_dup_distance_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": docs, "source": ["s"] * len(docs)}
        ),
    )
    got = dict(con.execute(REGISTRY["dup_pair_distance_histogram"].sql).fetchall())
    bands = [_mh_bands(t) for t in docs]
    hist: dict[int, int] = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if bands[i] & bands[j]:
                gap = j - i
                bkt = -1 if gap == 0 else gap.bit_length() - 1
                hist[bkt] = hist.get(bkt, 0) + 1
    assert got == hist
