"""Property-based semantics checks for the session-138 operators.

Models: purchase value by hour, customer coverage (never-buyers must
count) and the quality extremes board against direct aggregation.
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


_HT0 = datetime.datetime(2026, 1, 5)
_val = st.integers(min_value=0, max_value=4000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["view", "purchase"]),
            st.integers(min_value=0, max_value=47),
            _val,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_purchase_value_by_hour_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "event_type": [t for t, _, _ in events],
                "ts": [
                    _HT0 + datetime.timedelta(hours=h) for _, h, _ in events
                ],
                "value": [v for _, _, v in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["purchase_value_by_hour"].sql
        ).fetchall()
    }
    base_h = int((_HT0 - datetime.datetime(1970, 1, 1)).total_seconds()) // 3600
    cells: dict[int, list[int]] = {}
    for t, h, v in events:
        if t != "purchase":
            continue
        hr = (base_h + h) % 24
        cell = cells.setdefault(hr, [0, 0])
        cell[0] += 1
        cell[1] += _round_away(v * 100)
    tot = sum(c for _, c in cells.values())
    model = {
        hr: (n, c, 0 if tot == 0 else (1_000_000 * c) // tot)
        for hr, (n, c) in cells.items()
    }
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    oc=st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=20),
    segs=st.lists(st.sampled_from(["AU", "MA"]), min_size=8, max_size=8),
)
def test_customer_coverage_matches_model(oc, segs):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame({"o_orderkey": range(len(oc)), "o_custkey": oc}),
    )
    con.register(
        "customer",
        pd.DataFrame({"c_custkey": range(8), "c_mktsegment": segs}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["customer_order_coverage"].sql
        ).fetchall()
    }
    buyers = set(oc)
    model: dict[str, list[int]] = {}
    for ck, sg in enumerate(segs):
        cell = model.setdefault(sg, [0, 0])
        cell[0] += 1
        cell[1] += 1 if ck in buyers else 0
    assert got == {
        s: (n, b, (1_000_000 * b) // n) for s, (n, b) in model.items()
    }


_W = ["aa", "bb", "cc", "dd"]
_text = st.lists(st.sampled_from(_W), min_size=1, max_size=14).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=15))
def test_quality_extremes_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = con.execute(REGISTRY["quality_extremes_board"].sql).fetchall()
    rows = []
    for d, t in enumerate(docs):
        ws = t.split()
        if len(ws) < 8:
            continue
        rows.append((d, len(ws), (1_000_000 * len(set(ws))) // len(ws)))
    rows.sort(key=lambda r: (r[2], r[0]))
    want = [
        (d, n, q, r) for r, (d, n, q) in enumerate(rows[:10], start=1)
    ]
    assert got == want
