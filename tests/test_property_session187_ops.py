"""Property-based semantics checks for the session-187 operators.

serp_dup_collapse's dedup-window tail is modeled standalone on an
injected page (the BM25 front is driver-contract territory).
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 3, 4)  # a Monday


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=30),
            st.sampled_from(["purchase", "view"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_first_purchase_dow_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _ in evs],
                "ts": [_D0 + datetime.timedelta(days=d, hours=4) for _, d, _ in evs],
                "event_type": [t for _, _, t in evs],
            }
        ),
    )
    got = {
        r[0]: r[1]
        for r in con.execute(
            REGISTRY["first_purchase_dow_profile"].sql
        ).fetchall()
    }

    first: dict[int, int] = {}
    for u, d, t in evs:
        if t == "purchase":
            first[u] = min(first.get(u, 10**9), d)
    model = {d: 0 for d in range(7)}
    for d in first.values():
        model[d % 7] += 1  # _D0 Monday → dow = d % 7
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    page=st.lists(
        st.sampled_from(["t1", "t2", "t3", "t4"]), min_size=1, max_size=20
    )
)
def test_serp_collapse_tail_semantics(page):
    con = duckdb.connect()
    con.register(
        "h",
        pd.DataFrame({"rnk": range(1, len(page) + 1), "hh": page}),
    )
    got = con.execute(
        """WITH k AS (SELECT rnk, row_number() OVER (PARTITION BY hh ORDER BY rnk) AS occ FROM h)
SELECT CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
FROM k"""
    ).fetchall()[0]

    seen = set()
    uniq = 0
    for t in page:
        if t not in seen:
            seen.add(t)
            uniq += 1
    assert got == (len(page), uniq, len(page) - uniq)
