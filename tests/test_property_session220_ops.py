"""Property-based semantics checks for the session-220 operators.

DuckDB-only (oracle SQL vs exact Python models): per-arm quantile
effects, the greedy-bandit replay vs a sequential simulation, and the
learned-index OLS error bound.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _arm(uid):
    return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:4], 16) % 2


_T0 = datetime.datetime(2025, 11, 1)


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # user
            st.integers(min_value=100, max_value=200000),  # cents
        ),
        min_size=1,
        max_size=50,
    )
)
def test_ab_quantile_effects_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [u for u, _ in evs],
                "event_type": "purchase",
                "value": [c / 100 for _, c in evs],
                "ts": [_T0 + datetime.timedelta(seconds=i) for i in range(len(evs))],
            }
        ),
    )
    got = con.execute(REGISTRY["ab_quantile_effects"].sql).fetchall()

    vals = {0: [], 1: []}
    for u, c in evs:
        vals[_arm(u)].append(c)
    if not vals[0] or not vals[1]:
        assert got == []
        return

    def q(s, p):
        s = sorted(s)
        n = len(s)
        x = (n - 1) * p
        r = x // 1000000
        v_lo, v_hi = s[r], s[min(r + 1, n - 1)]
        return _round_away(
            1000000.0 * (v_lo + ((x % 1000000) / 1000000.0) * (v_hi - v_lo))
        )

    model = []
    for p in (250000, 500000, 750000):
        qa, qb = q(vals[0], p), q(vals[1], p)
        model.append((p, qa, qb, qb - qa))
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # user
            st.integers(min_value=0, max_value=15),  # day
            st.sampled_from(["view", "click"]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_bandit_greedy_replay_matches_sequential(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [u for u, _, _ in evs],
                "ts": [_T0 + datetime.timedelta(days=d) for _, d, _ in evs],
                "event_type": [t for _, _, t in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["bandit_greedy_replay"].sql).fetchall()
    assert len(got) == 1

    lo = min(d for _, d, _ in evs)
    hi = max(d for _, d, _ in evs)
    days = {x: [0, 0, 0, 0] for x in range(lo, hi + 1)}  # v0 c0 v1 c1
    for u, d, t in evs:
        a = _arm(u)
        idx = a * 2 + (1 if t == "click" else 0)
        days[d][idx] += 1
    pv = [0, 0]
    pc = [0, 0]
    picks = [0, 0]
    greedy = 0
    tot = [0, 0]
    for x in range(lo, hi + 1):
        v0, c0, v1, c1 = days[x]
        chosen = 1 if pc[1] * max(pv[0], 1) > pc[0] * max(pv[1], 1) else 0
        picks[chosen] += 1
        greedy += c1 if chosen else c0
        pv[0] += v0
        pc[0] += c0
        pv[1] += v1
        pc[1] += c1
        tot[0] += c0
        tot[1] += c1
    best = max(tot)
    model = (hi - lo + 1, picks[0], picks[1], greedy, best, best - greedy)
    assert got[0] == model
    # regret is signed: an adaptive policy can beat the best FIXED arm
    assert got[0][5] == got[0][4] - got[0][3]


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(
        st.integers(min_value=0, max_value=100000), min_size=1, max_size=60
    )
)
def test_learned_index_error_matches_model(keys):
    con = duckdb.connect()
    con.register("lineitem", pd.DataFrame({"l_orderkey": keys}))
    got = con.execute(REGISTRY["learned_index_error"].sql).fetchall()
    assert len(got) == 1

    ks = sorted(set(keys))
    n = len(ks)
    sk, sr = sum(ks), n * (n - 1) // 2
    mk, mr = sk // n, sr // n
    sxy = sum((k - mk) * (r - mr) for r, k in enumerate(ks))
    sxx = sum((k - mk) * (k - mk) for k in ks)
    slope = 0.0 if sxx == 0 else float(sxy) / sxx
    icept = (float(sr) / n) - slope * (float(sk) / n)
    errs = [
        _round_away(1000 * abs(r - (icept + slope * k)))
        for r, k in enumerate(ks)
    ]
    model = (
        n,
        _round_away(1000000000 * slope),
        max(errs),
        sum(errs) // n,
    )
    assert got[0] == model
