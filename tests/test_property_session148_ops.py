"""Property-based semantics checks for the session-148 operators.

Models: trailing-7-day min/max envelope on the zero-filled day spine,
per-brand promo quantity lift (integer cross-multiplication), and the
discount×tax percent-point grid. DuckDB-only (ms per example).
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 3, 1)
_BASE_DAY = (_D0 - datetime.datetime(1970, 1, 1)).days


@settings(max_examples=35, deadline=None)
@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=1, max_value=6),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_daily_envelope_matches_model(days):
    rows = []
    eid = 0
    for d, k in days:
        for _ in range(k):
            rows.append((eid, _D0 + datetime.timedelta(days=d, hours=eid % 20)))
            eid += 1
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"event_id": [r[0] for r in rows], "ts": [r[1] for r in rows]}),
    )
    got = con.execute(REGISTRY["events_daily_envelope"].sql).fetchall()

    per: dict[int, int] = {}
    for d, k in days:
        per[d] = per.get(d, 0) + k
    lo, hi = min(per), max(per)
    series = [per.get(d, 0) for d in range(lo, hi + 1)]
    model = []
    for i in range(6, len(series)):
        win = series[i - 6 : i + 1]
        model.append((_BASE_DAY + lo + i, series[i], min(win), max(win)))
    assert got == model


_disc = st.sampled_from([0.0, 0.02, 0.05, 0.1])


@settings(max_examples=35, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            _disc,
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=30,
    ),
    brands=st.lists(
        st.sampled_from(["B#1", "B#2", "B#3"]), min_size=6, max_size=6
    ),
)
def test_brand_promo_lift_matches_model(li, brands):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": [p for p, _, _ in li],
                "l_discount": [d for _, d, _ in li],
                "l_quantity": [float(q) for _, _, q in li],
            }
        ),
    )
    con.register(
        "part",
        pd.DataFrame({"p_partkey": range(6), "p_brand": brands}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["brand_promo_lift"].sql).fetchall()
    }

    agg: dict[str, list[int]] = {}
    for p, d, q in li:
        b = brands[p]
        cell = agg.setdefault(b, [0, 0, 0, 0])
        if d > 0:
            cell[0] += 1
            cell[2] += 100 * q
        else:
            cell[1] += 1
            cell[3] += 100 * q
    model = {}
    for b, (np_, nf, pq, fq) in agg.items():
        lift = (
            0
            if np_ == 0 or nf == 0 or fq == 0
            else (1000000 * pq * nf) // (fq * np_)
        )
        model[b] = (np_, nf, pq, fq, lift)
    assert got == model


_tax = st.sampled_from([0.0, 0.01, 0.04, 0.08])


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(st.tuples(_disc, _tax), min_size=1, max_size=40)
)
def test_discount_tax_grid_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_discount": [d for d, _ in li],
                "l_tax": [t for _, t in li],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["discount_tax_hist2d"].sql).fetchall()
    }
    model: dict[tuple[int, int], int] = {}
    for d, t in li:
        k = (round(d * 100), round(t * 100))
        model[k] = model.get(k, 0) + 1
    assert got == model
