"""Property-based semantics checks for the session-110 operators.

Models: gap CV² against a literal per-user lag model, sales coverage
against set arithmetic (never-sold parts must count), and the
entry/exit matrix against sequential session scanning. DuckDB-only.
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


_BT0 = datetime.datetime(2024, 11, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=9000),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_interevent_cv2_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_BT0 + datetime.timedelta(seconds=s) for _, s in events],
            }
        ),
    )
    rows = con.execute(REGISTRY["interevent_cv2"].sql).fetchall()
    per: dict[int, list] = {}
    for i, (u, s) in enumerate(events):
        per.setdefault(u, []).append((s * 1_000_000, i))
    gaps = []
    for seq in per.values():
        seq.sort()
        for a, b in zip(seq, seq[1:]):
            gaps.append((b[0] - a[0]) // 1_000_000)
    if not gaps:
        # zero gaps -> the grouped census has no groups in both engines
        assert rows == []
        return
    n_gaps, mean_q6, cv2 = rows[0]
    n, s = len(gaps), sum(gaps)
    assert n_gaps == n
    assert mean_q6 == _round_away(1_000_000 * (float(s) / max(n, 1)))
    mg = s // max(n, 1)
    syc = sum(g - mg for g in gaps)
    syy = sum((g - mg) ** 2 for g in gaps)
    if n < 2 or s == 0:
        assert cv2 == 0
    else:
        var = (float(n) * syy - float(syc) * syc) / (float(n) * n)
        mean = float(s) / n
        assert cv2 == _round_away(1_000_000 * (var / (mean * mean)))


@settings(max_examples=40, deadline=None)
@given(
    sold=st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=20),
    brands=st.lists(st.sampled_from(["B1", "B2"]), min_size=6, max_size=6),
)
def test_sales_coverage_matches_model(sold, brands):
    con = duckdb.connect()
    con.register("lineitem", pd.DataFrame({"l_partkey": sold}))
    con.register(
        "part", pd.DataFrame({"p_partkey": range(6), "p_brand": brands})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["part_sales_coverage"].sql).fetchall()
    }
    sold_set = set(sold)
    model: dict[str, list[int]] = {}
    for pk, b in enumerate(brands):
        cell = model.setdefault(b, [0, 0])
        cell[0] += 1
        cell[1] += 1 if pk in sold_set else 0
    assert got == {
        b: (n, ns, (1_000_000 * ns) // n) for b, (n, ns) in model.items()
    }


_GAP_US = 1_800_000_000


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
def test_entry_exit_matrix_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _, _ in events],
                "ts": [
                    _BT0 + datetime.timedelta(seconds=s) for _, s, _ in events
                ],
                "event_type": [e for _, _, e in events],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            REGISTRY["session_entry_exit_matrix"].sql
        ).fetchall()
    }
    per: dict[int, list] = {}
    for i, (u, s, e) in enumerate(events):
        per.setdefault(u, []).append((s * 1_000_000, i, e))
    model: dict[tuple[str, str], int] = {}
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
            key = (sess[0], sess[-1])
            model[key] = model.get(key, 0) + 1
    assert got == model
