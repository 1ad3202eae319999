"""Property-based semantics checks for the session-90 operators.

Models: the 2-D value×hour census and whale-order histogram against
direct counting, and the geometric fit against a literal survival-
function model (Fraction-exact p̂, float pow in the engines' order).
DuckDB-only.
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


_VT0 = datetime.datetime(2024, 4, 1)
_price = st.integers(min_value=0, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(min_value=0, max_value=72), _price),
        min_size=1,
        max_size=30,
    )
)
def test_value_hour_hist2d_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "ts": [_VT0 + datetime.timedelta(hours=h) for h, _ in events],
                "value": [v for _, v in events],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(
            REGISTRY["events_value_hour_hist2d"].sql
        ).fetchall()
    }
    model: dict[tuple[int, int], list[int]] = {}
    base_h = int((_VT0 - datetime.datetime(1970, 1, 1)).total_seconds()) // 3600
    for h, v in events:
        hour = (base_h + h) % 24
        cents = _round_away(v * 100)
        vb = -1 if cents <= 0 else cents.bit_length() - 1
        cell = model.setdefault((hour, vb), [0, 0])
        cell[0] += 1
        cell[1] += cents
    assert got == {k: tuple(v) for k, v in model.items()}


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=1, max_value=40000).map(lambda k: k / 4),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_order_concentration_matches_model(orders):
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
    got = dict(
        con.execute(REGISTRY["order_concentration_histogram"].sql).fetchall()
    )
    per: dict[int, list[int]] = {}
    for c, p in orders:
        per.setdefault(c, []).append(_round_away(p * 100))
    hist = {b: 0 for b in range(10)}
    for vals in per.values():
        if len(vals) < 2 or sum(vals) <= 0:
            continue
        share = (1_000_000 * max(vals)) // sum(vals)
        hist[min(share // 100_000, 9)] += 1
    assert got == hist


_GT0 = datetime.datetime(2024, 2, 1)
_GAP_US = 1_800_000_000


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=7200),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_geometric_fit_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_GT0 + datetime.timedelta(seconds=s) for _, s in events],
            }
        ),
    )
    got = con.execute(
        REGISTRY["session_length_geometric_fit"].sql
    ).fetchall()
    per_user: dict[int, list] = {}
    for i, (u, s) in enumerate(events):
        per_user.setdefault(u, []).append((s * 1_000_000, i))
    lens = []
    for rows in per_user.values():
        rows.sort()
        cur = 0
        prev = None
        for t_us, _ in rows:
            if prev is None or t_us - prev > _GAP_US:
                if cur:
                    lens.append(cur)
                cur = 0
            cur += 1
            prev = t_us
        if cur:
            lens.append(cur)
    S, E = len(lens), sum(lens)
    q = float(E - S) / E
    hist: dict[int, int] = {}
    for ln in lens:
        b = ln.bit_length() - 1
        hist[b] = hist.get(b, 0) + 1

    def mass(b):
        return (q ** (2.0 ** float(b) - 1.0)) - (
            q ** (2.0 ** (float(b) + 1.0) - 1.0)
        )

    model = []
    for b in sorted(hist):
        exp = S * mass(b)
        chi = (hist[b] - exp) * (hist[b] - exp) / max(exp, 1e-9)
        model.append(
            (b, hist[b], _round_away(1_000_000 * exp), _round_away(1_000_000 * chi))
        )
    assert got == model
