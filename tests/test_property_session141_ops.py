"""Property-based semantics checks for the session-141 operators.

Models: first-touch attribution against a literal per-user scan,
weekend share against direct day-of-week counting, tax audit against
per-row rounded products. DuckDB-only.
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


_ST0 = datetime.datetime(2026, 2, 1)
_EPOCH = datetime.datetime(1970, 1, 1)


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
def test_first_touch_matches_model(events):
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
        for r in con.execute(REGISTRY["first_touch_profile"].sql).fetchall()
    }
    per: dict[int, list] = {}
    for i, (u, s, t) in enumerate(events):
        per.setdefault(u, []).append((s, i, t))
    cells: dict[str, list[int]] = {}
    for rows in per.values():
        rows.sort()
        first = rows[0][2]
        conv = 1 if any(t == "purchase" for _, _, t in rows) else 0
        cell = cells.setdefault(first, [0, 0])
        cell[0] += 1
        cell[1] += conv
    assert got == {
        t: (n, c, (1_000_000 * c) // n) for t, (n, c) in cells.items()
    }


_val = st.integers(min_value=0, max_value=4000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["view", "purchase"]),
            st.integers(min_value=0, max_value=20),
            _val,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weekend_share_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "event_type": [t for t, _, _ in events],
                "ts": [
                    _ST0 + datetime.timedelta(days=d) for _, d, _ in events
                ],
                "value": [v for _, _, v in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["weekend_activity_share"].sql
        ).fetchall()
    }
    cells: dict[str, list[int]] = {}
    for t, d, v in events:
        day = (_ST0 + datetime.timedelta(days=d) - _EPOCH).days
        wknd = (day + 3) % 7 >= 5
        c = cells.setdefault(t, [0, 0, 0, 0])
        c[0] += 1
        c[1] += 1 if wknd else 0
        c[2] += _round_away(v * 100)
        c[3] += _round_away(v * 100) if wknd else 0
    assert got == {
        t: (n, w, (1_000_000 * w) // n, cc, cw)
        for t, (n, w, cc, cw) in cells.items()
    }


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)
_tax = st.integers(min_value=0, max_value=8).map(lambda k: k / 100)


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(st.tuples(_price, _tax), min_size=1, max_size=25)
)
def test_tax_audit_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_extendedprice": [p for p, _ in li],
                "l_tax": [t for _, t in li],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["lineitem_tax_audit"].sql).fetchall()
    }
    cells: dict[int, list[int]] = {}
    for p, t in li:
        pct = _round_away(t * 100)
        c = cells.setdefault(pct, [0, 0, 0])
        c[0] += 1
        c[1] += _round_away(p * 100)
        c[2] += _round_away(p * t * 100)
    assert got == {k: tuple(v) for k, v in cells.items()}
