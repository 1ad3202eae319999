"""Property-based semantics checks for the session-125 operators.

Models: part-name vocabulary and peak hours against direct counting,
two-hop reach on structural invariants over injected embeddings
(reach bounded by degree expansion and by component size).
DuckDB-only.
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_NAMES = ["cold widget", "small widget", "large bolt", "blue rod", "red rod"]


@settings(max_examples=40, deadline=None)
@given(names=st.lists(st.sampled_from(_NAMES), min_size=1, max_size=20))
def test_part_name_census_matches_model(names):
    con = duckdb.connect()
    con.register(
        "part",
        pd.DataFrame({"p_partkey": range(len(names)), "p_name": names}),
    )
    got = con.execute(REGISTRY["part_name_term_census"].sql).fetchall()
    from collections import Counter

    c = Counter(w for n in names for w in n.split())
    rows = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    want = [
        (w, n, (1_000_000 * n) // len(names)) for w, n in rows
    ]
    assert got == want


_PT0 = datetime.datetime(2025, 8, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["view", "click"]),
            st.integers(min_value=0, max_value=47),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_type_peak_hour_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "event_type": [t for t, _ in events],
                "ts": [_PT0 + datetime.timedelta(hours=h) for _, h in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["type_peak_hour"].sql).fetchall()
    }
    base_h = int((_PT0 - datetime.datetime(1970, 1, 1)).total_seconds()) // 3600
    cells: dict[tuple[str, int], int] = {}
    for t, h in events:
        hr = (base_h + h) % 24
        cells[(t, hr)] = cells.get((t, hr), 0) + 1
    model = {}
    for t in {t for t, _ in events}:
        hrs = {h: n for (tt, h), n in cells.items() if tt == t}
        peak = max(hrs.values())
        hour = min(h for h, n in hrs.items() if n == peak)
        tot = sum(hrs.values())
        model[t] = (hour, peak, (1_000_000 * peak) // tot)
    assert got == model


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=5, deadline=None)
@given(data=st.data(), n=st.integers(min_value=15, max_value=22))
def test_two_hop_invariants(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    rows = con.execute(REGISTRY["ann_two_hop_histogram"].sql).fetchall()
    comp = con.execute(REGISTRY["ann_graph_components"].sql).fetchall()[0]
    n_in_graph, largest = comp[1], comp[3]
    # every in-graph node has a reach row; reach is at least its degree
    assert sum(c for _, c in rows) == n_in_graph
    for bucket, c in rows:
        assert c >= 1
        # reach can never exceed the largest component minus self
        assert (1 << bucket) <= max(largest - 1, 1) * 2
