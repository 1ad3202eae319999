"""Property-based semantics check for the session-196 operator."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=30, deadline=None)
@given(
    bals=st.lists(
        st.integers(min_value=-4000, max_value=40000).map(lambda k: k / 4),
        min_size=1,
        max_size=12,
    ),
    active=st.sets(st.integers(min_value=0, max_value=15)),
)
def test_customer_idle_balance_matches_model(bals, active):
    con = duckdb.connect()
    con.register(
        "customer",
        pd.DataFrame({"c_custkey": range(len(bals)), "c_acctbal": bals}),
    )
    con.register(
        "orders",
        pd.DataFrame({"o_custkey": sorted(active) or [10**9]}),
    )
    got = con.execute(REGISTRY["customer_idle_balance"].sql).fetchall()[0]

    act = set(active) if active else {10**9}
    cents = [_round_away(b * 100) for b in bals]
    idle = sum(c for i, c in enumerate(cents) if i not in act)
    assert got == (len(bals), len(act), idle, sum(cents))
