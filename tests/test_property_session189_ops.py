"""Property-based semantics checks for the session-189 operators."""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=20),  # second offset
        ),
        min_size=1,
        max_size=40,
    )
)
def test_per_second_burst_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _ in evs],
                "ts": [_D0 + datetime.timedelta(seconds=s) for _, s in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["per_second_burst_histogram"].sql
        ).fetchall()
    }

    per: dict[int, list] = {}
    for u, s in evs:
        cell = per.setdefault(s, [0, set()])
        cell[0] += 1
        cell[1].add(u)
    model: dict[int, list[int]] = {}
    for n, users in per.values():
        band = n.bit_length() - 1
        cell = model.setdefault(band, [0, 0, 0])
        cell[0] += 1
        cell[1] += n
        cell[2] = max(cell[2], len(users))
    assert got == {k: tuple(v) for k, v in model.items()}


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # orderkey
            st.integers(min_value=0, max_value=4),  # partkey
        ),
        min_size=1,
        max_size=30,
    ),
    ocust=st.lists(st.integers(min_value=0, max_value=2), min_size=6, max_size=6),
)
def test_part_repurchase_matches_model(li, ocust):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_partkey": [p for _, p in li],
            }
        ),
    )
    con.register(
        "orders",
        pd.DataFrame({"o_orderkey": range(6), "o_custkey": ocust}),
    )
    got = con.execute(REGISTRY["part_repurchase_rate"].sql).fetchall()[0]

    from collections import Counter

    cnt = Counter((ocust[o], p) for o, p in li)
    n_pairs = len(cnt)
    n_rep = sum(1 for v in cnt.values() if v >= 2)
    assert got == (
        n_pairs,
        n_rep,
        (1000000 * n_rep) // n_pairs,
        max(cnt.values()),
    )
