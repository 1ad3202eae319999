"""Property-based semantics checks for the session-185 operators."""

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
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=10),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_supplier_breadth_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_suppkey": [s for s, _ in li],
                "l_partkey": [p for _, p in li],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["supplier_breadth_histogram"].sql
        ).fetchall()
    }

    per: dict[int, set[int]] = {}
    for s, p in li:
        per.setdefault(s, set()).add(p)
    model: dict[int, list[int]] = {}
    for parts in per.values():
        n = len(parts)
        band = n.bit_length() - 1
        cell = model.setdefault(band, [0, 0])
        cell[0] += 1
        cell[1] += n
    assert got == {k: tuple(v) for k, v in model.items()}


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=30, deadline=None)
@given(parts=st.lists(_price, min_size=1, max_size=40))
def test_price_ending_matches_model(parts):
    con = duckdb.connect()
    con.register(
        "part",
        pd.DataFrame(
            {"p_partkey": range(len(parts)), "p_retailprice": parts}
        ),
    )
    got = con.execute(REGISTRY["price_ending_census"].sql).fetchall()

    from collections import Counter

    cnt = Counter(_round_away(p * 100) % 100 for p in parts)
    model = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == model
