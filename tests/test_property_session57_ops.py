"""Property-based semantics checks for the session-57 operators.

Models: an exact RFM model (type-7 quintile boundaries over each metric's
value list — identical to the op's weighted-histogram decomposition —
strict-> scoring), an integer power-iteration model over the lag-built
transition matrix, and a 30-min-gap session counter. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    _MARKOV_ROUNDS,
    _SESSION_GAP_US,
    _US_PER_DAY,
    REGISTRY,
)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _events_con(rows):
    """rows: (event_id, ts_us, user_id, event_type, cents)."""
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime(
                    pd.Series([r[1] for r in rows], dtype="int64"), unit="us"
                ),
                "user_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
                "value": [r[4] / 100.0 for r in rows],
            }
        ),
    )
    return con


def _type7(vals, p_q6):
    vs = sorted(vals)
    n = len(vs)
    rank = (p_q6 / 1_000_000.0) * (n - 1)
    lo = math.floor(rank)
    frac = rank - lo
    v_lo = vs[int(lo)]
    v_hi = vs[min(int(lo) + 1, n - 1)]
    return _round_away(1_000_000.0 * (v_lo + frac * (v_hi - v_lo)))


_ev = st.tuples(
    st.integers(min_value=0, max_value=5 * 86_400_000_000),  # ts_us
    st.integers(min_value=0, max_value=4),  # user
    st.sampled_from(["view", "click", "purchase"]),
    st.integers(min_value=-300, max_value=3000),  # cents
)


@settings(max_examples=40, deadline=None)
@given(evs=st.lists(_ev, min_size=1, max_size=30))
def test_rfm_matches_model(evs):
    rows = [(i, ts, u, et, c) for i, (ts, u, et, c) in enumerate(evs)]
    con = _events_con(rows)
    got = {
        (r[0], r[1], r[2]): (r[3], r[4])
        for r in con.execute(REGISTRY["rfm_segments"].sql).fetchall()
    }
    users: dict[int, list] = {}
    max_day = max(ts // _US_PER_DAY for ts, *_ in evs)
    for ts, u, et, c in evs:
        d = ts // _US_PER_DAY
        st_ = users.setdefault(u, [0, 0, 0])  # last_day, f, m
        st_[0] = max(st_[0], d)
        st_[1] += 1
        st_[2] += c
    rfm = {u: (max_day - v[0], v[1], v[2]) for u, v in users.items()}
    bounds = {}
    for mi, name in ((0, "r"), (1, "f"), (2, "m")):
        vals = [v[mi] for v in rfm.values()]
        bounds[name] = [_type7(vals, p) for p in (200000, 400000, 600000, 800000)]
    model: dict[tuple, list] = {}
    for u, (r, f, m) in rfm.items():
        rs = 1 + sum(1 for b in bounds["r"] if 1_000_000 * r > b)
        fs = 1 + sum(1 for b in bounds["f"] if 1_000_000 * f > b)
        ms = 1 + sum(1 for b in bounds["m"] if 1_000_000 * m > b)
        cell = model.setdefault((rs, fs, ms), [0, 0])
        cell[0] += 1
        cell[1] += m
    assert got == {k: tuple(v) for k, v in model.items()}


@settings(max_examples=40, deadline=None)
@given(evs=st.lists(_ev, min_size=2, max_size=30))
def test_markov_stationary_matches_model(evs):
    rows = [(i, ts, u, et, c) for i, (ts, u, et, c) in enumerate(evs)]
    con = _events_con(rows)
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(REGISTRY["markov_stationary"].sql).fetchall()
    }
    # transition counts with (ts, event_id) ordering
    seqs: dict[int, list] = {}
    for i, (ts, u, et, c) in enumerate(evs):
        seqs.setdefault(u, []).append((ts, i, et))
    trans: dict[tuple[str, str], int] = {}
    for s in seqs.values():
        s.sort()
        for a, b in zip(s, s[1:]):
            trans[(a[2], b[2])] = trans.get((a[2], b[2]), 0) + 1
    if not trans:
        assert got == {}
        return
    row_tot: dict[str, int] = {}
    for (a, _), n in trans.items():
        row_tot[a] = row_tot.get(a, 0) + n
    p = {k: (1_000_000 * n) // row_tot[k[0]] for k, n in trans.items()}
    types = sorted(row_tot)
    k = len(types)
    v = {t: 1_000_000 // k for t in types}
    for _ in range(_MARKOV_ROUNDS):
        nxt: dict[str, int] = {}
        for (a, b), pq in p.items():
            if a in v:
                nxt[b] = nxt.get(b, 0) + v[a] * pq
        v = {t: x // 1_000_000 for t, x in nxt.items()}
    model = {t: (1_000_000 // k, v.get(t, 0)) for t in types}
    assert got == model


@settings(max_examples=40, deadline=None)
@given(evs=st.lists(_ev, min_size=1, max_size=30))
def test_session_histogram_matches_model(evs):
    rows = [(i, ts, u, et, c) for i, (ts, u, et, c) in enumerate(evs)]
    con = _events_con(rows)
    got = dict(con.execute(REGISTRY["user_session_histogram"].sql).fetchall())
    seqs: dict[int, list] = {}
    for i, (ts, u, *_rest) in enumerate(evs):
        seqs.setdefault(u, []).append((ts, i))
    hist: dict[int, int] = {}
    for s in seqs.values():
        s.sort()
        n_sessions = 1 + sum(
            1 for a, b in zip(s, s[1:]) if b[0] - a[0] > _SESSION_GAP_US
        )
        hist[n_sessions] = hist.get(n_sessions, 0) + 1
    assert got == hist
