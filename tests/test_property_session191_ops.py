"""Property-based semantics checks for the session-191 operators."""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 11, 15)


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=120),  # ship lag days
        ),
        min_size=1,
        max_size=25,
    ),
    odays=st.lists(
        st.integers(min_value=0, max_value=200), min_size=6, max_size=6
    ),
)
def test_order_ship_month_matrix_matches_model(li, odays):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(6),
                "o_orderdate": [
                    _D0 + datetime.timedelta(days=d) for d in odays
                ],
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_shipdate": [
                    _D0 + datetime.timedelta(days=odays[o] + lag)
                    for o, lag in li
                ],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            REGISTRY["order_ship_month_matrix"].sql
        ).fetchall()
    }

    from collections import Counter

    def ym(dt):
        return dt.year * 100 + dt.month

    cnt = Counter(
        (
            ym(_D0 + datetime.timedelta(days=odays[o])),
            ym(_D0 + datetime.timedelta(days=odays[o] + lag)),
        )
        for o, lag in li
    )
    assert got == dict(cnt)


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=40),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_lifetime_entry_exit_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _ in evs],
                "ts": [_D0 + datetime.timedelta(hours=h) for _, h, _ in evs],
                "event_type": [t for _, _, t in evs],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            REGISTRY["lifetime_entry_exit_matrix"].sql
        ).fetchall()
    }

    per: dict[int, list] = {}
    for eid, (u, h, t) in enumerate(evs):
        per.setdefault(u, []).append((h, eid, t))
    from collections import Counter

    cnt = Counter()
    for rows in per.values():
        rows.sort()
        cnt[(rows[0][2], rows[-1][2])] += 1
    assert got == dict(cnt)
