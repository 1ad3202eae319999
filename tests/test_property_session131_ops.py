"""Property-based semantics checks for the session-131 operators.

Models: basket breadth, order-size trend and the whale-event board
against direct aggregation. DuckDB-only.
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


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=25,
    ),
    brands=st.lists(
        st.sampled_from(["B1", "B2", "B3"]), min_size=5, max_size=5
    ),
)
def test_brand_breadth_matches_model(li, brands):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_partkey": [p for _, p in li],
            }
        ),
    )
    con.register(
        "part", pd.DataFrame({"p_partkey": range(5), "p_brand": brands})
    )
    got = dict(con.execute(REGISTRY["order_brand_breadth"].sql).fetchall())
    per: dict[int, set[str]] = {}
    for o, p in li:
        per.setdefault(o, set()).add(brands[p])
    hist: dict[int, int] = {}
    for bs in per.values():
        b = min(len(bs), 3)
        hist[b] = hist.get(b, 0) + 1
    assert got == hist


_MT0 = datetime.datetime(1996, 2, 1)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.integers(min_value=0, max_value=120), min_size=1, max_size=12
    ),
    li=st.lists(st.integers(min_value=0, max_value=11), min_size=0, max_size=25),
)
def test_order_size_by_month_matches_model(orders, li):
    li = [o % len(orders) for o in li]
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_orderdate": [
                    _MT0 + datetime.timedelta(days=d) for d in orders
                ],
            }
        ),
    )
    con.register("lineitem", pd.DataFrame({"l_orderkey": li}))
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["order_size_by_month"].sql).fetchall()
    }
    model: dict[int, list[int]] = {}
    for ok, d in enumerate(orders):
        dt = _MT0 + datetime.timedelta(days=d)
        mk = dt.year * 12 + dt.month - 1
        cell = model.setdefault(mk, [0, 0])
        cell[0] += 1
        cell[1] += li.count(ok)
    assert got == {
        mk: (n, _round_away(1_000_000 * (float(s) / n)))
        for mk, (n, s) in model.items()
    }


_val = st.integers(min_value=0, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), _val),
        min_size=1,
        max_size=30,
    )
)
def test_top_value_events_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "event_type": ["view"] * len(events),
                "value": [v for _, v in events],
            }
        ),
    )
    got = con.execute(REGISTRY["top_value_events"].sql).fetchall()
    rows = sorted(
        (
            (i, u, "view", _round_away(v * 100))
            for i, (u, v) in enumerate(events)
        ),
        key=lambda r: (-r[3], r[0]),
    )[:10]
    want = [
        (i, u, t, c, r) for r, (i, u, t, c) in enumerate(rows, start=1)
    ]
    assert got == want
