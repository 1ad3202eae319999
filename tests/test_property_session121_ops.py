"""Property-based semantics checks for the session-121 operators.

Models: monthly repeat share against a literal first-month model,
hour×dow chi² against a full-spine expected-count model, zero-value
census against direct counting. DuckDB-only.
"""

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


_MT0 = datetime.datetime(1995, 1, 15)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=200),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_monthly_repeat_share_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_custkey": [c for c, _ in orders],
                "o_orderdate": [
                    _MT0 + datetime.timedelta(days=d) for _, d in orders
                ],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["monthly_repeat_share"].sql).fetchall()
    }
    mk = []
    for c, d in orders:
        dt = _MT0 + datetime.timedelta(days=d)
        mk.append((c, dt.year * 12 + dt.month - 1))
    first = {}
    for c, m in mk:
        first[c] = min(first.get(c, m), m)
    model: dict[int, list[int]] = {}
    for c, m in mk:
        cell = model.setdefault(m, [0, 0])
        cell[0] += 1
        cell[1] += 1 if m > first[c] else 0
    assert got == {
        m: (n, r, (1_000_000 * r) // n) for m, (n, r) in model.items()
    }


_HT0 = datetime.datetime(2025, 6, 2)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=13),  # day
            st.integers(min_value=0, max_value=23),  # hour
        ),
        min_size=1,
        max_size=40,
    )
)
def test_hour_dow_chi2_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "ts": [
                    _HT0 + datetime.timedelta(days=d, hours=h)
                    for d, h in events
                ],
            }
        ),
    )
    n_cells, n_events, chi2 = con.execute(
        REGISTRY["hour_dow_chi2"].sql
    ).fetchall()[0]
    day0 = (_HT0 - datetime.datetime(1970, 1, 1)).days
    cells: dict[tuple[int, int], int] = {}
    for d, h in events:
        dow = (day0 + d + 3) % 7
        cells[(h, dow)] = cells.get((h, dow), 0) + 1
    hours = sorted({h for h, _ in cells})
    dows = sorted({d for _, d in cells})
    rh = {h: sum(n for (hh, _), n in cells.items() if hh == h) for h in hours}
    ch = {d: sum(n for (_, dd), n in cells.items() if dd == d) for d in dows}
    nt = len(events)
    assert n_events == nt
    assert n_cells == len(hours) * len(dows)
    want = 0
    for h in hours:
        for d in dows:
            n = cells.get((h, d), 0)
            exp = float(rh[h]) * ch[d] / nt
            want += _round_away(
                1_000_000 * ((float(n) - exp) * (float(n) - exp) / exp)
            )
    assert chi2 == want


_val = st.one_of(
    st.just(0.0), st.integers(min_value=1, max_value=4000).map(lambda k: k / 4)
)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["view", "purchase"]), _val),
        min_size=1,
        max_size=30,
    )
)
def test_zero_value_census_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "event_type": [t for t, _ in events],
                "value": [v for _, v in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["zero_value_census"].sql).fetchall()
    }
    model: dict[str, list[int]] = {}
    for t, v in events:
        cell = model.setdefault(t, [0, 0])
        cell[0] += 1
        cell[1] += 1 if _round_away(v * 100) == 0 else 0
    assert got == {
        t: (n, z, (1_000_000 * z) // n) for t, (n, z) in model.items()
    }
