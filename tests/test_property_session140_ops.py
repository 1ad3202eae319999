"""Property-based semantics checks for the session-140 operators.

Models: bounce rate against literal sessionization, segment revenue
against direct aggregation, and balance quantiles against the exact
type-7 float fold (negative cents included). DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_GAP_US = 1_800_000_000


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_ST0 = datetime.datetime(2026, 2, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=7200),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_bounce_rate_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _, _ in events],
                "ts": [
                    _ST0 + datetime.timedelta(seconds=s) for _, s, _ in events
                ],
                "event_type": [t for _, _, t in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["session_bounce_rate"].sql).fetchall()
    }
    per: dict[int, list] = {}
    for i, (u, s, t) in enumerate(events):
        per.setdefault(u, []).append((s * 1_000_000, i, t))
    cells: dict[str, list[int]] = {}
    for rows in per.values():
        rows.sort()
        sess: list[tuple[str, int]] = []
        prev = None
        for t_us, i, t in rows:
            if prev is None or t_us - prev > _GAP_US:
                sess.append((t, 0))
            sess[-1] = (sess[-1][0], sess[-1][1] + 1)
            prev = t_us
        for entry, n in sess:
            cell = cells.setdefault(entry, [0, 0])
            cell[0] += 1
            cell[1] += 1 if n == 1 else 0
    assert got == {
        t: (n, b, (1_000_000 * b) // n) for t, (n, b) in cells.items()
    }


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), _price),
        min_size=1,
        max_size=25,
    ),
    segs=st.lists(st.sampled_from(["AU", "MA", "HH"]), min_size=6, max_size=6),
)
def test_mktsegment_revenue_matches_model(orders, segs):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_custkey": [c for c, _ in orders],
                "o_totalprice": [p for _, p in orders],
            }
        ),
    )
    con.register(
        "customer",
        pd.DataFrame({"c_custkey": range(6), "c_mktsegment": segs}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["mktsegment_revenue"].sql).fetchall()
    }
    cells: dict[str, list[int]] = {}
    for c, p in orders:
        cell = cells.setdefault(segs[c], [0, 0])
        cell[0] += 1
        cell[1] += _round_away(p * 100)
    tot = sum(r for _, r in cells.values())
    assert got == {
        s: (n, r, (1_000_000 * r) // tot) for s, (n, r) in cells.items()
    }


_bal = st.integers(min_value=-4000, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    custs=st.lists(
        st.tuples(st.sampled_from(["AU", "MA"]), _bal),
        min_size=1,
        max_size=25,
    )
)
def test_balance_quantiles_match_model(custs):
    con = duckdb.connect()
    con.register(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": range(len(custs)),
                "c_mktsegment": [s for s, _ in custs],
                "c_acctbal": [b for _, b in custs],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            REGISTRY["customer_balance_quantiles"].sql
        ).fetchall()
    }
    per: dict[str, list[int]] = {}
    for s, b in custs:
        per.setdefault(s, []).append(_round_away(b * 100))
    model = {}
    for s, vals in per.items():
        vals.sort()
        n = len(vals)
        for p_q6 in (250000, 500000, 750000):
            r = (p_q6 / 1_000_000.0) * (n - 1)
            lo = math.floor(r)
            frac = r - lo
            v_lo, v_hi = vals[int(lo)], vals[min(int(lo) + 1, n - 1)]
            model[(s, p_q6)] = _round_away(
                1_000_000.0 * (v_lo + frac * (v_hi - v_lo))
            )
    assert got == model
