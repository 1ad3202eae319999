"""Property-based semantics checks for the session-149 operators.

Models: Lehr's-rule power table from the live CTR baseline and the
part→nation supply-concentration histogram. (ann_recall_by_scancost
composes two memoized ANN halves whose cross-engine identity is proven
by the driver-contract replica — the generated-oracle convention for
the k-means-chained ops.) DuckDB-only (ms per example).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


@settings(max_examples=35, deadline=None)
@given(
    evs=st.lists(
        st.sampled_from(["view", "click", "purchase", "error"]),
        min_size=1,
        max_size=60,
    )
)
def test_ab_power_table_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"event_id": range(len(evs)), "event_type": evs}),
    )
    got = con.execute(REGISTRY["ab_power_table"].sql).fetchall()

    v = sum(1 for t in evs if t == "view")
    c = sum(1 for t in evs if t == "click")
    model = []
    for mde in (1, 2, 5, 10):
        if v == 0:
            base, n = 0, 0
        else:
            p = float(c) / v
            base = (1000000 * c) // v
            n = int(math.ceil(16.0 * p * (1 - p) / ((mde / 100.0) * (mde / 100.0))))
        model.append((mde, v, c, base, n))
    assert got == model


@settings(max_examples=35, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=1,
        max_size=30,
    ),
    nations=st.lists(
        st.integers(min_value=0, max_value=3), min_size=8, max_size=8
    ),
)
def test_part_nation_concentration_matches_model(li, nations):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": [p for p, _ in li],
                "l_suppkey": [s for _, s in li],
            }
        ),
    )
    con.register(
        "supplier",
        pd.DataFrame({"s_suppkey": range(8), "s_nationkey": nations}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["part_nation_concentration"].sql
        ).fetchall()
    }

    per: dict[int, list] = {}
    for p, s in li:
        cell = per.setdefault(p, [set(), 0])
        cell[0].add(nations[s])
        cell[1] += 1
    model: dict[int, list[int]] = {}
    for nset, n_items in per.values():
        cell = model.setdefault(len(nset), [0, 0])
        cell[0] += 1
        cell[1] += n_items
    assert got == {k: tuple(v) for k, v in model.items()}
