"""Property-based semantics checks for the session-178 operators.

Models: first- vs last-touch attribution credit (brute-force per
purchase) and the basket price-spread bands. DuckDB-only.
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


_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.sampled_from(["view", "click", "purchase", "signup"]),
            st.integers(min_value=0, max_value=50),
            st.sampled_from([0.0, 5.25, 12.0]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_attribution_compare_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _, _ in evs],
                "event_type": [t for _, t, _, _ in evs],
                "ts": [_D0 + datetime.timedelta(hours=h) for _, _, h, _ in evs],
                "value": [v for _, _, _, v in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["attribution_model_compare"].sql
        ).fetchall()
    }

    rows = [
        (eid, u, t, h, _round_away(v * 100))
        for eid, (u, t, h, v) in enumerate(evs)
    ]
    fa: dict[str, list[int]] = {}
    la: dict[str, list[int]] = {}
    for eid, u, t, h, c in rows:
        if t != "purchase":
            continue
        user_events = [r for r in rows if r[1] == u]
        first = min(user_events, key=lambda r: (r[3], r[0]))
        ft = first[2]
        cands = [
            r for r in user_events if r[2] != "purchase" and r[3] < h
        ]
        lt = (
            max(cands, key=lambda r: (r[3], r[0]))[2] if cands else "none"
        )
        fcell = fa.setdefault(ft, [0, 0])
        fcell[0] += 1
        fcell[1] += c
        lcell = la.setdefault(lt, [0, 0])
        lcell[0] += 1
        lcell[1] += c
    model = {}
    for t in set(fa) | set(la):
        f = fa.get(t, [0, 0])
        l = la.get(t, [0, 0])
        model[t] = (f[0], f[1], l[0], l[1])
    assert got == model


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(st.integers(min_value=0, max_value=6), _price),
        min_size=1,
        max_size=30,
    )
)
def test_basket_spread_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_extendedprice": [p for _, p in li],
            }
        ),
    )
    got = {
        r[0]: r[1]
        for r in con.execute(
            REGISTRY["basket_price_spread_histogram"].sql
        ).fetchall()
    }

    per: dict[int, list[int]] = {}
    for o, p in li:
        c = _round_away(p * 100)
        cell = per.setdefault(o, [0, None, None])
        cell[0] += 1
        cell[1] = c if cell[1] is None else min(cell[1], c)
        cell[2] = c if cell[2] is None else max(cell[2], c)
    model: dict[int, int] = {}
    for n, lo, hi in per.values():
        if n < 2:
            b = -1
        elif hi * 10 <= lo * 12:
            b = 0
        elif hi <= lo * 2:
            b = 1
        elif hi <= lo * 5:
            b = 2
        else:
            b = 3
        model[b] = model.get(b, 0) + 1
    assert got == model
