"""Property-based semantics checks for the session-111 operators.

Models: brand co-buy against basket set arithmetic, the LTV age curve
against a literal per-user cumulative model, and order size by status
against direct counting (orders without lineitems must count as 0).
DuckDB-only.
"""

from __future__ import annotations

import datetime
import math
from itertools import combinations

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
            st.integers(min_value=0, max_value=6),  # orderkey
            st.integers(min_value=0, max_value=5),  # partkey
        ),
        min_size=1,
        max_size=30,
    ),
    brands=st.lists(
        st.sampled_from(["B1", "B2", "B3"]), min_size=6, max_size=6
    ),
)
def test_cobuy_matches_model(li, brands):
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
        "part", pd.DataFrame({"p_partkey": range(6), "p_brand": brands})
    )
    got = con.execute(REGISTRY["brand_cobuy_matrix"].sql).fetchall()
    baskets: dict[int, set[str]] = {}
    for o, p in li:
        baskets.setdefault(o, set()).add(brands[p])
    n_orders = len(baskets)
    sup: dict[tuple[str, str], int] = {}
    for bs in baskets.values():
        for a, b in combinations(sorted(bs), 2):
            sup[(a, b)] = sup.get((a, b), 0) + 1
    rows = sorted(sup.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    want = [
        (a, b, n, r, (1_000_000 * n) // n_orders)
        for r, ((a, b), n) in enumerate(rows, start=1)
    ]
    assert got == want


_LT0 = datetime.datetime(2024, 12, 1)
_val = st.integers(min_value=0, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=15),
            _val,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_ltv_curve_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _, _ in events],
                "ts": [
                    _LT0 + datetime.timedelta(days=d) for _, d, _ in events
                ],
                "value": [v for _, _, v in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["ltv_age_curve"].sql).fetchall()
    }
    per: dict[int, dict[int, int]] = {}
    for u, d, v in events:
        per.setdefault(u, {})
        per[u][d] = per[u].get(d, 0) + _round_away(v * 100)
    obs: dict[int, list[int]] = {}
    for u, days in per.items():
        d0 = min(days)
        cum = 0
        for d in sorted(days):
            cum += days[d]
            obs.setdefault(d - d0, []).append(cum)
    model = {
        age: (
            len(v),
            _round_away(1_000_000 * (float(sum(v)) / len(v))),
        )
        for age, v in obs.items()
    }
    assert got == model
    # age-0 observations exist for every user
    assert got[0][0] == len(per)


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(st.integers(min_value=0, max_value=8), min_size=0, max_size=25),
    statuses=st.lists(
        st.sampled_from(["O", "F", "P"]), min_size=9, max_size=9
    ),
)
def test_order_size_by_status_matches_model(li, statuses):
    con = duckdb.connect()
    con.register("lineitem", pd.DataFrame({"l_orderkey": li}))
    con.register(
        "orders",
        pd.DataFrame({"o_orderkey": range(9), "o_orderstatus": statuses}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["order_size_by_status"].sql).fetchall()
    }
    model: dict[str, list[int]] = {}
    for ok, stv in enumerate(statuses):
        cell = model.setdefault(stv, [0, 0])
        cell[0] += 1
        cell[1] += li.count(ok)
    assert got == {
        s: (
            n,
            ni,
            _round_away(1_000_000 * (float(ni) / n)),
        )
        for s, (n, ni) in model.items()
    }
