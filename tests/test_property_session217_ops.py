"""Property-based semantics checks for the session-217 operators.

DuckDB-only (oracle SQL vs exact Python models): ZIP moments over the
virtual grid, ABC-XYZ class assignment incl. the exact integer CV
gates, and the hysteresis state machine vs a sequential replay.
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


_T0 = datetime.datetime(2025, 8, 1)


@settings(max_examples=40, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=25),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_user_day_zip_fit_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [u for u, _ in evs],
                "ts": [_T0 + datetime.timedelta(days=d) for _, d in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["user_day_zip_fit"].sql).fetchall()
    assert len(got) == 1

    nu = len({u for u, _ in evs})
    days = [d for _, d in evs]
    nd = max(days) - min(days) + 1
    cells = {}
    for u, d in evs:
        cells[(u, d)] = cells.get((u, d), 0) + 1
    ncells = nu * nd
    zeros = ncells - len(cells)
    s1 = sum(cells.values())
    s2 = sum(c * c for c in cells.values())
    m = float(s1) / ncells
    v = (float(s2) * ncells - float(s1) * s1) / (float(ncells) * ncells)
    if m <= 0 or v <= m:
        pi = 0
        lam = _round_away(1000000 * m) if m > 0 else 0
        p0p = 1000000 if m <= 0 else _round_away(1000000 * math.exp(-m))
    else:
        lamv = (v + m * m - m) / m
        pi = _round_away(1000000 * (1 - m / lamv))
        lam = _round_away(1000000 * lamv)
        p0p = _round_away(
            1000000 * ((1 - m / lamv) + (m / lamv) * math.exp(-lamv))
        )
    model = (
        ncells,
        (1000000 * zeros) // max(ncells, 1),
        _round_away(1000000 * m),
        _round_away(1000000 * v),
        pi,
        lam,
        p0p,
    )
    assert got[0] == model
    # zero inflation is a probability
    assert 0 <= got[0][4] <= 1000000


@settings(max_examples=25, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # partkey
            st.integers(min_value=0, max_value=400),  # ship day
            st.integers(min_value=100, max_value=400000),  # price cents
            st.integers(min_value=1, max_value=40),  # quantity
            st.integers(min_value=0, max_value=10),  # discount %
        ),
        min_size=1,
        max_size=50,
    )
)
def test_part_abc_xyz_matches_model(rows):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": [p for p, _, _, _, _ in rows],
                "l_shipdate": [
                    _T0 + datetime.timedelta(days=d) for _, d, _, _, _ in rows
                ],
                "l_extendedprice": [c / 100 for _, _, c, _, _ in rows],
                "l_quantity": [float(q) for _, _, _, q, _ in rows],
                "l_discount": [dc / 100 for _, _, _, _, dc in rows],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(REGISTRY["part_abc_xyz_matrix"].sql).fetchall()
    }

    rev, per_month = {}, {}
    months = set()
    for p, d, c, q, dc in rows:
        dt = _T0 + datetime.timedelta(days=d)
        ym = dt.year * 100 + dt.month
        months.add(ym)
        cents = _round_away(100 * (c / 100) * (1 - dc / 100))
        rev[p] = rev.get(p, 0) + cents
        per_month[(p, ym)] = per_month.get((p, ym), 0) + 100 * q
    nm = len(months)
    tot = sum(rev.values())
    # ABC via descending revenue-value histogram prefix
    by_val = {}
    for p, r in rev.items():
        by_val.setdefault(r, []).append(p)
    before = {}
    run = 0
    for val in sorted(by_val, reverse=True):
        before[val] = run
        run += val * len(by_val[val])
    cells = {}
    for p, r in rev.items():
        bf = before[r]
        abc = "A" if 5 * bf < 4 * tot else "B" if 20 * bf < 19 * tot else "C"
        s1 = sum(v for (pp, _), v in per_month.items() if pp == p)
        s2 = sum(v * v for (pp, _), v in per_month.items() if pp == p)
        d2 = s2 * nm - s1 * s1
        xyz = "X" if 4 * d2 <= s1 * s1 else "Y" if d2 <= s1 * s1 else "Z"
        cell = cells.setdefault((abc, xyz), [0, 0])
        cell[0] += 1
        cell[1] += r
    model = {}
    for a in "ABC":
        for x in "XYZ":
            n, rv = cells.get((a, x), [0, 0])
            model[(a, x)] = (n, rv, (1000000 * rv) // max(tot, 1))
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=80)
)
def test_alert_hysteresis_matches_sequential_replay(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"ts": [_T0 + datetime.timedelta(days=d) for d in days]}),
    )
    got = con.execute(REGISTRY["alert_hysteresis_advisor"].sql).fetchall()
    assert len(got) == 1

    lo, hi = min(days), max(days)
    counts = [days.count(x) for x in range(lo, hi + 1)]
    nd = len(counts)
    s1 = sum(counts)
    s2 = sum(c * c for c in counts)
    z2s = []
    for c in counts:
        if s2 * nd == s1 * s1:
            z2s.append(0.0)
        else:
            mean = float(s1) / nd
            var = (float(s2) * nd - float(s1) * s1) / (float(nd) * nd)
            z2s.append((c - mean) ** 2 / var)
    s_on = [1 if z > 9 else 0 for z in z2s]
    h_on, state = [], 0
    for z in z2s:
        if z > 9:
            state = 1
        elif z < 1:
            state = 0
        h_on.append(state)

    def episodes(xs):
        return sum(
            1 for i, x in enumerate(xs) if x == 1 and (i == 0 or xs[i - 1] == 0)
        )

    model = (
        nd,
        sum(s_on),
        episodes(s_on),
        sum(h_on),
        episodes(h_on),
        episodes(s_on) - episodes(h_on),
    )
    assert got[0] == model
    # hysteresis never fires more episodes than the single threshold
    assert got[0][5] >= 0
