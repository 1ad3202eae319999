"""Property-based semantics checks for the session-133 operators.

Models: type session positions against a literal sessionize + relpos
model, price-band returns and the click-latency histogram against
direct counting. DuckDB-only.
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


_ST0 = datetime.datetime(2025, 12, 1)


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
def test_type_session_position_matches_model(events):
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
                "event_type": [e for _, _, e in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["type_session_position"].sql).fetchall()
    }
    per: dict[int, list] = {}
    for i, (u, s, e) in enumerate(events):
        per.setdefault(u, []).append((s * 1_000_000, i, e))
    model: dict[str, list[int]] = {}
    for rows in per.values():
        rows.sort()
        sessions: list[list] = []
        prev = None
        for t_us, i, e in rows:
            if prev is None or t_us - prev > _GAP_US:
                sessions.append([])
            sessions[-1].append(e)
            prev = t_us
        for sess in sessions:
            n = len(sess)
            for pos, e in enumerate(sess):
                rp = _round_away(1_000_000 * (float(pos) / max(n - 1, 1)))
                cell = model.setdefault(e, [0, 0])
                cell[0] += 1
                cell[1] += rp
    assert got == {e: (n, s // n) for e, (n, s) in model.items()}


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(_price, st.sampled_from(["R", "N", "A"])),
        min_size=1,
        max_size=25,
    )
)
def test_price_band_returns_match_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_extendedprice": [p for p, _ in li],
                "l_returnflag": [f for _, f in li],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["price_band_return_rate"].sql).fetchall()
    }
    model: dict[int, list[int]] = {}
    for p, f in li:
        cents = _round_away(p * 100)
        band = -1 if cents <= 0 else cents.bit_length() - 1
        cell = model.setdefault(band, [0, 0])
        cell[0] += 1
        cell[1] += 1 if f == "R" else 0
    assert got == {
        b: (n, r, (1_000_000 * r) // n) for b, (n, r) in model.items()
    }


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=9000),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_view_click_latency_matches_model(events):
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
                "event_type": [e for _, _, e in events],
            }
        ),
    )
    got = dict(
        con.execute(
            REGISTRY["view_click_latency_histogram"].sql
        ).fetchall()
    )
    first_view: dict[int, int] = {}
    for u, s, e in events:
        if e == "view":
            first_view[u] = min(first_view.get(u, s), s)
    first_click: dict[int, int] = {}
    for u, s, e in events:
        if e == "click" and u in first_view and s >= first_view[u]:
            first_click[u] = min(first_click.get(u, s), s)
    hist: dict[int, int] = {}
    for u, c in first_click.items():
        lat = c - first_view[u]
        b = -1 if lat == 0 else lat.bit_length() - 1
        hist[b] = hist.get(b, 0) + 1
    assert got == hist
