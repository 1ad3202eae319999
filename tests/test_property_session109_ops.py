"""Property-based semantics checks for the session-109 operators.

Models: the IQR census against a literal type-7 quartile + fence
model, the forward as-of against per-user sequential scanning, and
daily hour entropy against per-cell q6-first sums. DuckDB-only.
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


def _type7(vals, p):
    vals = sorted(vals)
    h = p * (len(vals) - 1)
    lo = math.floor(h)
    hi = min(lo + 1, len(vals) - 1)
    return vals[lo] + (h - lo) * (vals[hi] - vals[lo])


_WI = ["aa"]


@settings(max_examples=40, deadline=None)
@given(
    lens=st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=20
    )
)
def test_iqr_census_matches_model(lens):
    docs = [" ".join(_WI * n) for n in lens]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": ["s0"] * len(docs),
                "text": docs,
            }
        ),
    )
    rows = con.execute(REGISTRY["iqr_outlier_census"].sql).fetchall()
    q1 = _round_away(1_000_000 * _type7(lens, 0.25))
    q3 = _round_away(1_000_000 * _type7(lens, 0.75))
    iqr = q3 - q1
    n_low = sum(1 for n in lens if 2_000_000 * n < 2 * q1 - 3 * iqr)
    n_high = sum(1 for n in lens if 2_000_000 * n > 2 * q3 + 3 * iqr)
    share = (1_000_000 * (n_low + n_high)) // len(lens)
    assert rows == [("s0", len(lens), n_low, n_high, share)]


_FT0 = datetime.datetime(2024, 10, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=5000),
            st.sampled_from(["view", "purchase", "click"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_asof_forward_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _, _ in events],
                "ts": [
                    _FT0 + datetime.timedelta(seconds=s) for _, s, _ in events
                ],
                "event_type": [e for _, _, e in events],
            }
        ),
    )
    base_us = int(
        (_FT0 - datetime.datetime(1970, 1, 1)).total_seconds()
    ) * 1_000_000
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["events_asof_forward"].sql).fetchall()
    }
    per_user: dict[int, list] = {}
    for i, (u, s, e) in enumerate(events):
        if e in ("view", "purchase"):
            is_p = 1 if e == "purchase" else 0
            per_user.setdefault(u, []).append(
                (base_us + s * 1_000_000, is_p, i)
            )
    model = {}
    for u, rows in per_user.items():
        rows.sort()
        for idx, (t_us, is_p, i) in enumerate(rows):
            if is_p:
                continue
            nxt = next(
                (tt for tt, pp, _ in rows[idx:] if pp == 1), None
            )
            model[i] = (u, t_us, (nxt - t_us) if nxt is not None else -1)
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # day
            st.integers(min_value=0, max_value=23),  # hour
        ),
        min_size=1,
        max_size=40,
    )
)
def test_daily_hour_entropy_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "ts": [
                    _FT0 + datetime.timedelta(days=d, hours=h)
                    for d, h in events
                ],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["daily_hour_entropy"].sql).fetchall()
    }
    day0 = (_FT0 - datetime.datetime(1970, 1, 1)).days
    cells: dict[tuple[int, int], int] = {}
    for d, h in events:
        cells[(day0 + d, h)] = cells.get((day0 + d, h), 0) + 1
    model = {}
    for day in {d for d, _ in cells}:
        hrs = {h: n for (d, h), n in cells.items() if d == day}
        tot = sum(hrs.values())
        ent = sum(
            _round_away(1_000_000 * (-(n / tot) * math.log(n / tot)))
            for n in hrs.values()
        )
        model[day] = (tot, ent)
        assert ent <= round(1_000_000 * math.log(24)) + 24 * 3
    assert got == model
