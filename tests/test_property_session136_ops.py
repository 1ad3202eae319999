"""Property-based semantics checks for the session-136 operators.

Models: breadth-value, region bestseller and whale users against direct
aggregation. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=25,
    ),
    brands=st.lists(st.sampled_from(["B1", "B2", "B3"]), min_size=5, max_size=5),
    prices=st.lists(_price, min_size=6, max_size=6),
)
def test_breadth_value_matches_model(li, brands, prices):
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
    con.register(
        "orders",
        pd.DataFrame(
            {"o_orderkey": range(6), "o_totalprice": [float(p) for p in prices]}
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["basket_breadth_value"].sql).fetchall()
    }
    per: dict[int, set[str]] = {}
    for o, p in li:
        per.setdefault(o, set()).add(brands[p])
    model: dict[int, list[int]] = {}
    for o, bs in per.items():
        b = min(len(bs), 3)
        cell = model.setdefault(b, [0, 0])
        cell[0] += 1
        cell[1] += _round_away(float(prices[o]) * 100)
    assert got == {
        b: (n, _round_away(1_000_000 * (float(s) / n)))
        for b, (n, s) in model.items()
    }


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=1, max_value=30),
        ),
        min_size=1,
        max_size=25,
    ),
    snat=st.lists(st.integers(min_value=0, max_value=3), min_size=4, max_size=4),
    nreg=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
)
def test_region_top_part_matches_model(li, snat, nreg):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_suppkey": [s for s, _, _ in li],
                "l_partkey": [p for _, p, _ in li],
                "l_quantity": [float(q) for _, _, q in li],
            }
        ),
    )
    con.register(
        "supplier", pd.DataFrame({"s_suppkey": range(4), "s_nationkey": snat})
    )
    con.register(
        "nation", pd.DataFrame({"n_nationkey": range(4), "n_regionkey": nreg})
    )
    con.register(
        "region",
        pd.DataFrame({"r_regionkey": [0, 1, 2], "r_name": ["RA", "RB", "RC"]}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["region_top_part"].sql).fetchall()
    }
    names = {0: "RA", 1: "RB", 2: "RC"}
    cells: dict[tuple[str, int], int] = {}
    for s, p, q in li:
        key = (names[nreg[snat[s]]], p)
        cells[key] = cells.get(key, 0) + q
    model = {}
    for reg in {r for r, _ in cells}:
        parts = {p: q for (r, p), q in cells.items() if r == reg}
        top = max(parts.values())
        pk = min(p for p, q in parts.items() if q == top)
        model[reg] = (pk, top)
    assert got == model


_val = st.integers(min_value=0, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(min_value=0, max_value=8), _val),
        min_size=1,
        max_size=30,
    )
)
def test_top_value_users_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "value": [v for _, v in events],
            }
        ),
    )
    got = con.execute(REGISTRY["top_value_users"].sql).fetchall()
    per: dict[int, list[int]] = {}
    for u, v in events:
        cell = per.setdefault(u, [0, 0])
        cell[0] += _round_away(v * 100)
        cell[1] += 1
    rows = sorted(
        ((u, n, c) for u, (c, n) in per.items()),
        key=lambda r: (-r[2], r[0]),
    )[:10]
    want = [(u, r, n, c) for r, (u, n, c) in enumerate(rows, start=1)]
    assert got == want
