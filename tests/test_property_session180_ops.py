"""Property-based semantics checks for the session-180 operators."""

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
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=100),
            _price,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_first_order_ltv_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_custkey": [c for c, _, _ in orders],
                "o_orderkey": range(len(orders)),
                "o_orderdate": [
                    _D0 + datetime.timedelta(days=d) for _, d, _ in orders
                ],
                "o_totalprice": [v for _, _, v in orders],
            }
        ),
    )
    got = con.execute(REGISTRY["first_order_ltv_corr"].sql).fetchall()[0]

    per: dict[int, list] = {}
    for key, (c, d, v) in enumerate(orders):
        per.setdefault(c, []).append((d, key, _round_away(v * 100)))
    xs, ys = [], []
    for c, rows in per.items():
        if len(rows) < 2:
            continue
        rows.sort()
        first_c = rows[0][2]
        total = sum(r[2] for r in rows)
        xs.append(first_c // 10000)
        ys.append((total - first_c) // 10000)
    n = len(xs)
    if n < 2:
        corr = 0
    else:
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        if n * sxx == sx * sx or n * syy == sy * sy:
            corr = 0
        else:
            corr = _round_away(
                1000000
                * (float(n) * sxy - float(sx) * sy)
                / (
                    math.sqrt(float(n) * sxx - float(sx) * sx)
                    * math.sqrt(float(n) * syy - float(sy) * sy)
                )
            )
    assert got == (n, corr)


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # orderkey
            st.integers(min_value=0, max_value=4),  # partkey
        ),
        min_size=1,
        max_size=30,
    ),
    ocust=st.lists(st.integers(min_value=0, max_value=2), min_size=6, max_size=6),
    pbrand=st.lists(
        st.sampled_from(["B1", "B2", "B3"]), min_size=5, max_size=5
    ),
)
def test_brand_loyalty_matches_model(li, ocust, pbrand):
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
        "orders",
        pd.DataFrame({"o_orderkey": range(6), "o_custkey": ocust}),
    )
    con.register(
        "part",
        pd.DataFrame({"p_partkey": range(5), "p_brand": pbrand}),
    )
    got = {
        r[0]: r[1]
        for r in con.execute(
            REGISTRY["brand_loyalty_histogram"].sql
        ).fetchall()
    }

    from collections import Counter

    per: dict[int, Counter] = {}
    for o, p in li:
        per.setdefault(ocust[o], Counter())[pbrand[p]] += 1
    model: dict[int, int] = {}
    for cnt in per.values():
        n = sum(cnt.values())
        if n < 2:
            continue
        dec = min((10 * max(cnt.values())) // n, 9)
        model[dec] = model.get(dec, 0) + 1
    assert got == model
