"""Property-based semantics checks for the session-103 operators.

Models: attribution windows against a literal first-view/first-purchase
model (plus window monotonicity), user entropy against per-user q6-first
sums, brand returns against direct counting. DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _ATTR_WINDOWS_H, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_AT0 = datetime.datetime(2024, 7, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=48 * 3600),
            st.sampled_from(["view", "purchase", "click"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_attribution_curve_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _, _ in events],
                "ts": [
                    _AT0 + datetime.timedelta(seconds=s) for _, s, _ in events
                ],
                "event_type": [e for _, _, e in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["attribution_window_curve"].sql
        ).fetchall()
    }
    first_view: dict[int, int] = {}
    for u, s, e in events:
        if e == "view":
            first_view[u] = min(first_view.get(u, s), s)
    first_p: dict[int, int] = {}
    for u, s, e in events:
        if e == "purchase" and u in first_view and s >= first_view[u]:
            first_p[u] = min(first_p.get(u, s), s)
    if not first_view:
        # zero viewers -> the grouped spine cross join has no groups,
        # identically in both engines
        assert got == {}
        return
    model = {}
    for w in _ATTR_WINDOWS_H:
        conv = sum(
            1
            for u, v in first_view.items()
            if u in first_p and first_p[u] - v <= w * 3600
        )
        nv = len(first_view)
        model[w] = (nv, conv, (1_000_000 * conv) // max(nv, 1))
    assert got == model
    rates = [model[w][1] for w in sorted(model)]
    assert all(a <= b for a, b in zip(rates, rates[1:]))


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_user_entropy_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "event_type": [e for _, e in events],
            }
        ),
    )
    got = dict(
        con.execute(REGISTRY["user_type_entropy_histogram"].sql).fetchall()
    )
    per: dict[int, dict[str, int]] = {}
    for u, e in events:
        per.setdefault(u, {})[e] = per.setdefault(u, {}).get(e, 0) + 1
    hist: dict[int, int] = {}
    for counts in per.values():
        tot = sum(counts.values())
        h = sum(
            _round_away(1_000_000 * (-(n / tot) * math.log(n / tot)))
            for n in counts.values()
        )
        b = min(h // 200_000, 8)
        hist[b] = hist.get(b, 0) + 1
    assert got == hist


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.sampled_from(["R", "N", "A"]),
        ),
        min_size=1,
        max_size=25,
    ),
    brands=st.lists(st.sampled_from(["B1", "B2"]), min_size=5, max_size=5),
)
def test_brand_returns_match_model(li, brands):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": [p for p, _ in li],
                "l_returnflag": [f for _, f in li],
            }
        ),
    )
    con.register(
        "part", pd.DataFrame({"p_partkey": range(5), "p_brand": brands})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["brand_return_rate"].sql).fetchall()
    }
    model: dict[str, list[int]] = {}
    for p, f in li:
        cell = model.setdefault(brands[p], [0, 0])
        cell[0] += 1
        cell[1] += 1 if f == "R" else 0
    assert got == {
        b: (n, r, (1_000_000 * r) // n) for b, (n, r) in model.items()
    }
