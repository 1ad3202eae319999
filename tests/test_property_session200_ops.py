"""Property-based semantics checks for the session-200 operators.

DuckDB-only (oracle SQL vs exact Python models).
user_runs_test: Wald-Wolfowitz counts and z² replayed per user;
filter_order_advisor: all six cascade costs from a brute-force pass
matrix; stream_state_size_curve: sliding-window peak vs a brute-force
trailing count at every arrival minute.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_T0 = datetime.datetime(2024, 3, 1)


@settings(max_examples=40, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # user
            st.booleans(),  # purchase?
            st.integers(min_value=0, max_value=2000),  # seconds
        ),
        min_size=1,
        max_size=60,
    )
)
def test_user_runs_test_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _ in evs],
                "event_type": ["purchase" if p else "view" for _, p, _ in evs],
                "ts": [_T0 + datetime.timedelta(seconds=s) for _, _, s in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["user_runs_test"].sql).fetchall()
    assert len(got) == 1

    seqs = {}
    for i, (u, p, s) in enumerate(evs):
        seqs.setdefault(u, []).append((s * 1000000, i, 1 if p else 0))
    n_tested = n_blocky = n_alt = n_scored = 0
    z2s = []
    for u, rows in seqs.items():
        rows.sort()
        marks = [m for _, _, m in rows]
        n = len(marks)
        n1 = sum(marks)
        n2 = n - n1
        if n1 < 1 or n2 < 1:
            continue
        R = 1 + sum(1 for a, b in zip(marks, marks[1:]) if a != b)
        n_tested += 1
        if n * R < n + 2 * n1 * n2:
            n_blocky += 1
        elif n * R > n + 2 * n1 * n2:
            n_alt += 1
        if 2 * n1 * n2 > n:
            n_scored += 1
            e = R - 1.0 - (float(2 * n1) * n2) / n
            var = (float(2 * n1 * n2) * (2 * n1 * n2 - n)) / (
                (float(n) * n) * (n - 1)
            )
            z2s.append(_round_away(1000000 * (e * e) / var))
    mean_z2 = sum(z2s) // max(len(z2s), 1)
    assert got[0] == (n_tested, n_blocky, n_alt, n_scored, mean_z2)


_LANGS = ["en", "zh", "fr"]
_VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj"]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(_LANGS),
            st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=15),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_filter_order_advisor_matches_bruteforce(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "lang": [l for l, _ in docs],
                "text": [" ".join(ws) for _, ws in docs],
            }
        ),
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["filter_order_advisor"].sql).fetchall()}

    flags = []
    for l, ws in docs:
        toks = tokenize(" ".join(ws))
        n_tok, n_distinct = len(toks), len(set(toks))
        flags.append(
            (
                1 if n_tok >= 8 else 0,
                1 if 5 * n_distinct >= 2 * n_tok else 0,
                1 if l != "zh" else 0,
            )
        )
    n = len(flags)
    idx = {"A": 0, "B": 1, "C": 2}
    model = {}
    for perm in ["ABC", "ACB", "BAC", "BCA", "CAB", "CBA"]:
        i1, i2 = idx[perm[0]], idx[perm[1]]
        p1 = sum(f[i1] for f in flags)
        p12 = sum(f[i1] * f[i2] for f in flags)
        m2 = sum(f[i2] for f in flags)
        actual = n + p1 + p12
        indep = n + p1 + (p1 * m2) // max(n, 1)
        model[perm] = (actual, indep, actual - indep)
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    mins=st.lists(st.integers(min_value=0, max_value=2000), min_size=0, max_size=80),
    other=st.lists(st.integers(min_value=0, max_value=2000), min_size=0, max_size=10),
)
def test_stream_state_size_matches_bruteforce(mins, other):
    rows = [("view", m) for m in mins] + [("error", m) for m in other]
    con = duckdb.connect()
    if rows:
        con.register(
            "events",
            pd.DataFrame(
                {
                    "event_type": [t for t, _ in rows],
                    "ts": [_T0 + datetime.timedelta(minutes=m) for _, m in rows],
                }
            ),
        )
    else:
        con.register(
            "events",
            pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=str),
                    "ts": pd.Series([], dtype="datetime64[us]"),
                }
            ),
        )
    got = con.execute(REGISTRY["stream_state_size_curve"].sql).fetchall()

    base = int(_T0.timestamp()) // 60
    arr = sorted(base + m for m in mins)  # only view/click count
    total = len(arr)
    model = []
    for w in (10, 60, 360):
        peak = 0
        for t in set(arr):
            peak = max(peak, sum(1 for a in arr if t - w < a <= t))
        model.append((w, peak, total, (1000000 * peak) // max(total, 1)))
    assert got == model
