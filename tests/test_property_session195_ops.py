"""Property-based semantics checks for the session-195 operators."""

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
_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            _price,
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=25,
    ),
    snat=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
)
def test_supply_price_by_nation_matches_model(li, snat):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_suppkey": [s for s, _, _ in li],
                "l_extendedprice": [p for _, p, _ in li],
                "l_discount": [0.0] * len(li),
                "l_quantity": [float(q) for _, _, q in li],
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
        for r in con.execute(REGISTRY["supply_price_by_nation"].sql).fetchall()
    }

    agg = {}
    for s, p, q in li:
        nm = ["NA", "NB", "NC"][snat[s]]
        cell = agg.setdefault(nm, [0, 0, 0])
        cell[0] += 1
        cell[1] += _round_away(100 * p)
        cell[2] += 100 * q
    model = {
        nm: (c[0], c[1], c[2], (1000000 * c[1]) // c[2])
        for nm, c in agg.items()
    }
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.sampled_from(["view", "click"]),
            st.integers(min_value=0, max_value=5000),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_type_cadence_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "event_type": [t for t, _ in evs],
                "ts": [_D0 + datetime.timedelta(seconds=s) for _, s in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["type_cadence_profile"].sql).fetchall()
    }

    per: dict[str, list] = {}
    for eid, (t, s) in enumerate(evs):
        per.setdefault(t, []).append((s * 10**6, eid))
    model = {}
    for t, rows in per.items():
        rows.sort()
        gaps = [rows[i][0] - rows[i - 1][0] for i in range(1, len(rows))]
        n = len(gaps)
        sg = sum(gaps)
        model[t] = (n, sg // 10**6, (sg // max(n, 1)) // 10**6)
    assert got == model
