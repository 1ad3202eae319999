"""Property-based semantics checks for the session-122 operators.

Models: user regularity against per-user active-week/span counting,
the type×size matrix and quantity spectrum against direct aggregation.
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


_RT0 = datetime.datetime(2025, 7, 7)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=70),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_user_regularity_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_RT0 + datetime.timedelta(days=d) for _, d in events],
            }
        ),
    )
    got = dict(
        con.execute(REGISTRY["user_regularity_histogram"].sql).fetchall()
    )
    day0 = (_RT0 - datetime.datetime(1970, 1, 1)).days
    per: dict[int, set[int]] = {}
    for u, d in events:
        per.setdefault(u, set()).add((day0 + d) // 7)
    hist = {b: 0 for b in range(10)}
    for wks in per.values():
        span = max(wks) - min(wks) + 1
        share = (1_000_000 * len(wks)) // span
        hist[min(share // 100_000, 9)] += 1
    assert got == hist


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    parts=st.lists(
        st.tuples(
            st.sampled_from(["T1", "T2"]),
            st.integers(min_value=1, max_value=50),
            _price,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_type_size_matrix_matches_model(parts):
    con = duckdb.connect()
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(len(parts)),
                "p_type": [t for t, _, _ in parts],
                "p_size": [s for _, s, _ in parts],
                "p_retailprice": [p for _, _, p in parts],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(REGISTRY["part_type_size_matrix"].sql).fetchall()
    }
    model: dict[tuple[str, int], list[int]] = {}
    for t, s, p in parts:
        cell = model.setdefault((t, s // 10), [0, 0])
        cell[0] += 1
        cell[1] += _round_away(p * 100)
    assert got == {
        k: (n, _round_away(1_000_000 * (float(c) / n)))
        for k, (n, c) in model.items()
    }


@settings(max_examples=40, deadline=None)
@given(
    qtys=st.lists(
        st.integers(min_value=1, max_value=50), min_size=1, max_size=40
    )
)
def test_quantity_spectrum_matches_model(qtys):
    con = duckdb.connect()
    con.register(
        "lineitem", pd.DataFrame({"l_quantity": [float(q) for q in qtys]})
    )
    got = dict(con.execute(REGISTRY["quantity_spectrum"].sql).fetchall())
    from collections import Counter

    assert got == dict(Counter(qtys))
