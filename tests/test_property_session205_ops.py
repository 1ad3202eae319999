"""Property-based semantics checks for the session-205 operators.

DuckDB-only (oracle SQL vs exact Python models).
part_name_fuzzy_pairs: brute-force blocked levenshtein; switchback:
hour-parity arms + cross-arm census; range_selectivity_histograms: the
uniform and equi-width estimators replayed with identical expression
order, plus the exact leg.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _RSH_RANGES


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_ADJ = ["red", "blue", "hot"]
_NOUN = ["bolt", "bolts", "bold", "ring", "rung", "widget"]


@settings(max_examples=30, deadline=None)
@given(
    names=st.lists(
        st.tuples(st.sampled_from(_ADJ), st.sampled_from(_NOUN)),
        min_size=1,
        max_size=20,
    )
)
def test_part_name_fuzzy_pairs_matches_bruteforce(names):
    full = [f"{a} {n}" for a, n in names]
    con = duckdb.connect()
    con.register(
        "part", pd.DataFrame({"p_partkey": range(len(full)), "p_name": full})
    )
    got = {
        r[0]: r[1]
        for r in con.execute(REGISTRY["part_name_fuzzy_pairs"].sql).fetchall()
    }

    model = {1: 0, 2: 0, 3: 0}
    for i in range(len(full)):
        for j in range(i + 1, len(full)):
            if names[i][0] != names[j][0]:
                continue
            d = _lev(full[i], full[j])
            if 1 <= d <= 3:
                model[d] += 1
    assert got == model


_T0 = datetime.datetime(2024, 11, 4)  # midnight-aligned


@settings(max_examples=40, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["view", "purchase"]),
            st.integers(min_value=0, max_value=100000),  # value cents
            st.integers(min_value=0, max_value=14400),  # minutes (10 days)
        ),
        min_size=1,
        max_size=50,
    )
)
def test_switchback_readout_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [u for u, _, _, _ in evs],
                "event_type": [t for _, t, _, _ in evs],
                "value": [c / 100 for _, _, c, _ in evs],
                "ts": [_T0 + datetime.timedelta(minutes=m) for _, _, _, m in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["switchback_readout"].sql).fetchall()
    }

    base_us = int(_T0.timestamp()) * 1000000
    cells = {}
    arms_per_user = {}
    for u, t, c, m in evs:
        arm = ((base_us + m * 60000000) // 3600000000) % 2
        cell = cells.setdefault(arm, [0, 0, 0, set()])
        cell[0] += 1
        if t == "purchase":
            cell[1] += 1
            cell[2] += c
        cell[3].add(u)
        arms_per_user.setdefault(u, set()).add(arm)
    n_both = sum(1 for a in arms_per_user.values() if len(a) == 2)
    model = {
        arm: (
            c[0],
            c[1],
            (1000000 * c[1]) // max(c[0], 1),
            c[2],
            len(c[3]),
            n_both,
        )
        for arm, c in cells.items()
    }
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    cents=st.lists(
        st.integers(min_value=500, max_value=10000000), min_size=1, max_size=60
    )
)
def test_range_selectivity_matches_model(cents):
    con = duckdb.connect()
    con.register(
        "lineitem", pd.DataFrame({"l_extendedprice": [c / 100 for c in cents]})
    )
    got = {
        r[0]: r[3:]
        for r in con.execute(
            REGISTRY["range_selectivity_histograms"].sql
        ).fetchall()
    }

    n, mn, mx = len(cents), min(cents), max(cents)
    w = mx - mn + 1
    cnt = {}
    for c in cents:
        b = min(15, ((c - mn) * 16) // w)
        cnt[b] = cnt.get(b, 0) + 1
    model = {}
    for rid, lo, hi in _RSH_RANGES:
        exact = sum(1 for c in cents if lo <= c <= hi)
        uni = _round_away(
            1000000
            * (float(n) * max(min(mx, hi) - max(mn, lo) + 1, 0))
            / w
        )
        ewq = 0
        for b, cb in cnt.items():
            blo = mn + (b * w) // 16
            bhi = mn + ((b + 1) * w) // 16
            ov = max(min(bhi, hi + 1) - max(blo, lo), 0)
            ewq += _round_away(
                1000000 * (float(cb) * ov) / max(bhi - blo, 1)
            )
        model[rid] = (exact, uni // 1000000, ewq // 1000000)
    assert got == model
    # the exact leg always lies between 0 and n
    for ex, _, _ in model.values():
        assert 0 <= ex <= n
