"""Property-based semantics checks for the session-193 operators."""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # order
            st.integers(min_value=0, max_value=3),  # supplier
            st.integers(min_value=0, max_value=60),  # lag
        ),
        min_size=1,
        max_size=25,
    ),
    odays=st.lists(st.integers(min_value=0, max_value=100), min_size=5, max_size=5),
    snat=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
)
def test_ship_lag_by_nation_matches_model(li, odays, snat):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(5),
                "o_orderdate": [_D0 + datetime.timedelta(days=d) for d in odays],
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _, _ in li],
                "l_suppkey": [s for _, s, _ in li],
                "l_shipdate": [
                    _D0 + datetime.timedelta(days=odays[o] + lag)
                    for o, _, lag in li
                ],
            }
        ),
    )
    con.register(
        "supplier",
        pd.DataFrame({"s_suppkey": range(4), "s_nationkey": snat}),
    )
    con.register(
        "nation",
        pd.DataFrame({"n_nationkey": range(3), "n_name": ["NA", "NB", "NC"]}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["ship_lag_by_nation"].sql).fetchall()
    }

    agg = {}
    for o, s, lag in li:
        nm = ["NA", "NB", "NC"][snat[s]]
        cell = agg.setdefault(nm, [0, 0])
        cell[0] += 1
        cell[1] += lag
    model = {
        nm: (c[0], c[1], (1000000 * c[1]) // c[0]) for nm, c in agg.items()
    }
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=120),
            st.sampled_from(["purchase", "view"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_resurrected_conversion_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _ in evs],
                "ts": [_D0 + datetime.timedelta(days=d, hours=5) for _, d, _ in evs],
                "event_type": [t for _, _, t in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["resurrected_conversion_rate"].sql
        ).fetchall()
    }

    per: dict[int, dict[int, int]] = {}
    for u, d, t in evs:
        per.setdefault(u, {})
        per[u][d] = max(per[u].get(d, 0), 1 if t == "purchase" else 0)
    model: dict[str, list[int]] = {}
    for days in per.values():
        sd = sorted(days)
        for i, d in enumerate(sd):
            if i == 0:
                b = "new"
            elif d - sd[i - 1] > 28:
                b = "resurrected"
            else:
                b = "regular"
            cell = model.setdefault(b, [0, 0])
            cell[0] += 1
            cell[1] += days[d]
    assert got == {
        b: (c[0], c[1], (1000000 * c[1]) // c[0]) for b, c in model.items()
    }
