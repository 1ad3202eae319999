"""Property-based semantics checks for the session-92 operators.

Models: discount bands and query cost against direct counting, peak
concurrency against a literal sweep-line over modeled sessions
(including the interval-overlap invariant). DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _COST_QUERIES, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=40, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=50),
            st.integers(min_value=0, max_value=10).map(lambda k: k / 100),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_discount_bands_match_model(items):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_quantity": [float(q) for q, _ in items],
                "l_discount": [d for _, d in items],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["discount_by_quantity_band"].sql
        ).fetchall()
    }
    per: dict[int, list[int]] = {}
    for q, d in items:
        per.setdefault(q // 10, []).append(_round_away(d * 100))
    model = {
        b: (len(v), _round_away(1_000_000 * (float(sum(v)) / len(v))))
        for b, v in per.items()
    }
    assert got == model


_ALL_TERMS = sorted({t for _, ts in _COST_QUERIES for t in ts}) + ["zz"]
_textq = st.lists(st.sampled_from(_ALL_TERMS), min_size=1, max_size=8).map(
    " ".join
)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textq, min_size=1, max_size=12))
def test_query_cost_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["query_cost_estimate"].sql).fetchall()
    }
    df: dict[str, set[int]] = {}
    for d, t in enumerate(docs):
        for w in set(t.split()):
            df.setdefault(w, set()).add(d)
    n_docs = len({d for s in df.values() for d in s})
    model = {}
    for qs, terms in _COST_QUERIES:
        present = [t for t in terms if t in df]
        sum_df = sum(len(df[t]) for t in present)
        matching = len(set().union(*(df[t] for t in present)) if present else set())
        model[qs] = (
            len(present),
            sum_df,
            matching,
            (1_000_000 * matching) // n_docs,
        )
    assert got == model


_PT0 = datetime.datetime(2024, 2, 1)
_GAP_US = 1_800_000_000


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=7200),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_peak_concurrency_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_PT0 + datetime.timedelta(seconds=s) for _, s in events],
            }
        ),
    )
    peak, at_min = con.execute(
        REGISTRY["peak_concurrent_sessions"].sql
    ).fetchall()[0]
    base_us = int(
        (_PT0 - datetime.datetime(1970, 1, 1)).total_seconds()
    ) * 1_000_000
    per_user: dict[int, list] = {}
    for i, (u, s) in enumerate(events):
        per_user.setdefault(u, []).append((base_us + s * 1_000_000, i))
    intervals = []
    for rows in per_user.values():
        rows.sort()
        start = prev = None
        for t_us, _ in rows:
            if prev is None or t_us - prev > _GAP_US:
                if start is not None:
                    intervals.append((start // 60_000_000, prev // 60_000_000))
                start = t_us
            prev = t_us
        intervals.append((start // 60_000_000, prev // 60_000_000))
    deltas: dict[int, int] = {}
    for m0, m1 in intervals:
        deltas[m0] = deltas.get(m0, 0) + 1
        deltas[m1 + 1] = deltas.get(m1 + 1, 0) - 1
    cum = 0
    best = (0, None)
    for m in sorted(deltas):
        cum += deltas[m]
        if cum > best[0]:
            best = (cum, m)
    assert (peak, at_min) == best
    assert peak >= 1
