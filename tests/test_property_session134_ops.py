"""Property-based semantics checks for the session-134 operators.

Models: purchase histogram, n_chars integrity (mismatches INJECTED —
the healthy sandbox never exercises the counter), and the linenumber
spectrum against direct counting. DuckDB-only.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.sampled_from(["view", "purchase"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_purchase_histogram_matches_model(events):
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
        con.execute(REGISTRY["user_purchase_histogram"].sql).fetchall()
    )
    per: dict[int, int] = {}
    for u, e in events:
        per.setdefault(u, 0)
        if e == "purchase":
            per[u] += 1
    hist: dict[int, int] = {}
    for n in per.values():
        b = min(n, 4)
        hist[b] = hist.get(b, 0) + 1
    assert got == hist


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.text(alphabet="ab ", min_size=0, max_size=10),
            st.integers(min_value=-3, max_value=3),  # injected drift
        ),
        min_size=1,
        max_size=20,
    )
)
def test_nchars_integrity_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [t for t, _ in docs],
                "n_chars": [len(t) + d for t, d in docs],
            }
        ),
    )
    n, ok, bad, mx = con.execute(
        REGISTRY["nchars_integrity_audit"].sql
    ).fetchall()[0]
    assert n == len(docs)
    assert ok == sum(1 for _, d in docs if d == 0)
    assert bad == sum(1 for _, d in docs if d != 0)
    assert mx == max(abs(d) for _, d in docs)


@settings(max_examples=40, deadline=None)
@given(
    lns=st.lists(st.integers(min_value=1, max_value=7), min_size=1, max_size=30)
)
def test_linenumber_spectrum_matches_model(lns):
    con = duckdb.connect()
    con.register("lineitem", pd.DataFrame({"l_linenumber": lns}))
    got = dict(con.execute(REGISTRY["linenumber_spectrum"].sql).fetchall())
    from collections import Counter

    assert got == dict(Counter(lns))
