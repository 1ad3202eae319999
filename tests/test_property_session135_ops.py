"""Property-based semantics checks for the session-135 operators.

Models: supply-side region rollup, local-trade share and order-total
reconciliation against direct models (with INJECTED header/line
drift). DuckDB-only.
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
            st.integers(min_value=0, max_value=3),  # suppkey
            st.integers(min_value=1, max_value=40),  # qty
            _price,
        ),
        min_size=1,
        max_size=25,
    ),
    snat=st.lists(st.integers(min_value=0, max_value=3), min_size=4, max_size=4),
    nreg=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
)
def test_region_supply_matches_model(li, snat, nreg):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_suppkey": [s for s, _, _ in li],
                "l_quantity": [float(q) for _, q, _ in li],
                "l_extendedprice": [p for _, _, p in li],
            }
        ),
    )
    con.register(
        "supplier",
        pd.DataFrame({"s_suppkey": range(4), "s_nationkey": snat}),
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
        for r in con.execute(REGISTRY["region_supply_volume"].sql).fetchall()
    }
    names = {0: "RA", 1: "RB", 2: "RC"}
    model: dict[str, list[int]] = {}
    for s, q, p in li:
        reg = names[nreg[snat[s]]]
        cell = model.setdefault(reg, [0, 0, 0])
        cell[0] += 1
        cell[1] += q
        cell[2] += _round_away(p * 100)
    assert got == {k: tuple(v) for k, v in model.items()}


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # orderkey
            st.integers(min_value=0, max_value=3),  # suppkey
        ),
        min_size=1,
        max_size=25,
    ),
    oc=st.lists(st.integers(min_value=0, max_value=4), min_size=6, max_size=6),
    cnat=st.lists(st.integers(min_value=0, max_value=2), min_size=5, max_size=5),
    snat=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
)
def test_local_trade_matches_model(li, oc, cnat, snat):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_suppkey": [s for _, s in li],
            }
        ),
    )
    con.register(
        "orders", pd.DataFrame({"o_orderkey": range(6), "o_custkey": oc})
    )
    con.register(
        "customer",
        pd.DataFrame({"c_custkey": range(5), "c_nationkey": cnat}),
    )
    con.register(
        "supplier",
        pd.DataFrame({"s_suppkey": range(4), "s_nationkey": snat}),
    )
    n, nl, share = con.execute(REGISTRY["local_trade_share"].sql).fetchall()[0]
    local = sum(
        1 for o, s in li if cnat[oc[o]] == snat[s]
    )
    assert (n, nl) == (len(li), local)
    assert share == (1_000_000 * local) // len(li)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(_price, min_size=1, max_size=10),
    li=st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), _price),
        min_size=0,
        max_size=25,
    ),
)
def test_order_total_consistency_matches_model(orders, li):
    li = [(o % len(orders), p) for o, p in li]
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_totalprice": [float(p) for p in orders],
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_extendedprice": [p for _, p in li],
            }
        ),
    )
    n, exact, mad = con.execute(
        REGISTRY["order_total_consistency"].sql
    ).fetchall()[0]
    lines: dict[int, int] = {}
    for o, p in li:
        lines[o] = lines.get(o, 0) + _round_away(p * 100)
    diffs = [
        abs(_round_away(float(p) * 100) - lines.get(ok, 0))
        for ok, p in enumerate(orders)
    ]
    assert n == len(orders)
    assert exact == sum(1 for d in diffs if d == 0)
    assert mad == _round_away(1_000_000 * (float(sum(diffs)) / len(orders)))
