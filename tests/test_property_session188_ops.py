"""Property-based semantics checks for the session-188 operators."""

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


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)
_D0 = datetime.datetime(1996, 3, 4)  # a Monday


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(st.integers(min_value=1, max_value=7), _price),
        min_size=1,
        max_size=30,
    )
)
def test_linenumber_value_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_linenumber": [l for l, _ in li],
                "l_extendedprice": [p for _, p in li],
                "l_discount": [0.0] * len(li),
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["linenumber_value_profile"].sql
        ).fetchall()
    }

    model: dict[int, list[int]] = {}
    for l, p in li:
        cell = model.setdefault(l, [0, 0])
        cell[0] += 1
        cell[1] += _round_away(100 * p)
    assert got == {
        l: (c[0], c[1], (1000000 * c[1]) // c[0]) for l, c in model.items()
    }


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=13),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_user_weekend_share_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _ in evs],
                "ts": [_D0 + datetime.timedelta(days=d, hours=3) for _, d in evs],
            }
        ),
    )
    got = {
        r[0]: r[1]
        for r in con.execute(
            REGISTRY["user_weekend_share_histogram"].sql
        ).fetchall()
    }

    per: dict[int, list[int]] = {}
    for u, d in evs:
        cell = per.setdefault(u, [0, 0])
        cell[0] += 1
        cell[1] += 1 if (d % 7) >= 5 else 0
    model: dict[int, int] = {}
    for n, nw in per.values():
        if n < 5:
            continue
        dec = min((10 * nw) // n, 9)
        model[dec] = model.get(dec, 0) + 1
    assert got == model
