"""Property-based semantics checks for the session-176 operators.

Models: per-pair KMV union estimates (exact md5 uniforms, under-fill
fallback, exact intersection), customer lifespan bands, and the
undiscounted-revenue rollup. DuckDB-only (ms per example).
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _u52(s: str) -> float:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16) / 4503599627370496.0


@settings(max_examples=20, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=150),
        ),
        min_size=2,
        max_size=100,
    )
)
def test_kmv_union_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "event_type": [t for t, _ in evs],
                "user_id": [u for _, u in evs],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(REGISTRY["kmv_union_estimate"].sql).fetchall()
    }

    per: dict[str, set[int]] = {}
    for t, u in evs:
        per.setdefault(t, set()).add(u)
    types = sorted(per)
    model = {}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            un = per[a] | per[b]
            n = len(un)
            hs = sorted(_u52(f"kmv:{u}") for u in un)
            est = n if n < 64 else _round_away(63 / hs[63])
            model[(a, b)] = (n, est, len(per[a] & per[b]))
    assert got == model


_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=30, deadline=None)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=1500),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_customer_lifespan_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_custkey": [c for c, _ in orders],
                "o_orderdate": [
                    _D0 + datetime.timedelta(days=d) for _, d in orders
                ],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["customer_lifespan_histogram"].sql
        ).fetchall()
    }

    per: dict[int, list[int]] = {}
    for c, d in orders:
        cell = per.setdefault(c, [10**9, -1, 0])
        cell[0] = min(cell[0], d)
        cell[1] = max(cell[1], d)
        cell[2] += 1
    model: dict[int, list[int]] = {}
    for lo, hi, n in per.values():
        span = hi - lo
        band = (
            0 if span == 0 else 1 if span <= 90 else 2 if span <= 365
            else 3 if span <= 1095 else 4
        )
        cell = model.setdefault(band, [0, 0])
        cell[0] += 1
        cell[1] += n
    assert got == {k: tuple(v) for k, v in model.items()}


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)
_disc = st.sampled_from([0.0, 0.02, 0.05])


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(st.tuples(_price, _disc), min_size=1, max_size=30)
)
def test_undiscounted_share_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_extendedprice": [p for p, _ in li],
                "l_discount": [d for _, d in li],
            }
        ),
    )
    got = con.execute(
        REGISTRY["undiscounted_revenue_share"].sql
    ).fetchall()[0]

    rows = [
        (_round_away(100 * p * (1 - d)), d == 0.0) for p, d in li
    ]
    n = len(rows)
    nf = sum(1 for _, f in rows if f)
    fc = sum(c for c, f in rows if f)
    tc = sum(c for c, _ in rows)
    assert got == (n, nf, fc, tc, (1000000 * fc) // tc)
