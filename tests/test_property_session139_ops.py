"""Property-based semantics checks for the session-139 operators.

Models: session value histogram against literal sessionization,
repeat runs against a direct streak scan, and user-day intensity
against direct counting. DuckDB-only.
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
_val = st.integers(min_value=0, max_value=4000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=7200),
            _val,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_session_value_matches_model(events):
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
                "value": [v for _, _, v in events],
            }
        ),
    )
    got = dict(
        con.execute(REGISTRY["session_value_histogram"].sql).fetchall()
    )
    per: dict[int, list] = {}
    for i, (u, s, v) in enumerate(events):
        per.setdefault(u, []).append((s * 1_000_000, i, _round_away(v * 100)))
    hist: dict[int, int] = {}
    for rows in per.values():
        rows.sort()
        sessions: list[int] = []
        prev = None
        for t_us, i, c in rows:
            if prev is None or t_us - prev > _GAP_US:
                sessions.append(0)
            sessions[-1] += c
            prev = t_us
        for c in sessions:
            b = -1 if c <= 0 else c.bit_length() - 1
            hist[b] = hist.get(b, 0) + 1
    assert got == hist


_W = ["aa", "bb", "cc"]
_text = st.lists(st.sampled_from(_W), min_size=1, max_size=12).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=12))
def test_repeat_runs_match_model(docs):
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
    got = dict(con.execute(REGISTRY["repeat_run_histogram"].sql).fetchall())
    hist: dict[int, int] = {}
    for t in docs:
        ws = t.split()
        best = cur = 1
        for a, b in zip(ws, ws[1:]):
            cur = cur + 1 if a == b else 1
            best = max(best, cur)
        b = min(best, 5)
        hist[b] = hist.get(b, 0) + 1
    assert got == hist


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=10),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_user_day_intensity_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_ST0 + datetime.timedelta(days=d) for _, d in events],
            }
        ),
    )
    got = dict(
        con.execute(
            REGISTRY["user_day_intensity_histogram"].sql
        ).fetchall()
    )
    cells: dict[tuple[int, int], int] = {}
    for u, d in events:
        cells[(u, d)] = cells.get((u, d), 0) + 1
    hist: dict[int, int] = {}
    for n in cells.values():
        b = n.bit_length() - 1
        hist[b] = hist.get(b, 0) + 1
    assert got == hist
