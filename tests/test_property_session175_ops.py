"""Property-based semantics check for the session-175 operator."""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 3, 4)  # a Monday
_BASE = (_D0 - datetime.datetime(1970, 1, 1)).days


@settings(max_examples=35, deadline=None)
@given(
    days=st.lists(
        st.integers(min_value=0, max_value=40), min_size=1, max_size=30
    )
)
def test_zero_order_days_matches_model(days):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(days)),
                "o_orderdate": [_D0 + datetime.timedelta(days=d) for d in days],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["zero_order_days_by_weekday"].sql
        ).fetchall()
    }

    seen = {_BASE + d for d in days}
    lo, hi = min(seen), max(seen)
    model: dict[int, list[int]] = {}
    for d in range(lo, hi + 1):
        dow = (d + 3) % 7
        cell = model.setdefault(dow, [0, 0])
        cell[0] += 1
        cell[1] += 0 if d in seen else 1
    assert got == {
        k: (c[0], c[1], (1000000 * c[1]) // c[0]) for k, c in model.items()
    }
