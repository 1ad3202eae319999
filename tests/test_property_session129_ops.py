"""Property-based semantics checks for the session-129 operators.

Models: supplier discount stance, month×type matrix and source token
length against direct aggregation. DuckDB-only.
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


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=10).map(lambda k: k / 100),
        ),
        min_size=5,
        max_size=30,
    )
)
def test_supplier_discount_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_suppkey": [s for s, _ in li],
                "l_discount": [d for _, d in li],
            }
        ),
    )
    got = con.execute(REGISTRY["supplier_discount_topk"].sql).fetchall()
    per: dict[int, list[int]] = {}
    for s, d in li:
        per.setdefault(s, []).append(_round_away(d * 100))
    rows = []
    for s, ds in per.items():
        if len(ds) < 5:
            continue
        rows.append(
            (s, len(ds), _round_away(1_000_000 * (float(sum(ds)) / len(ds))))
        )
    rows.sort(key=lambda r: (-r[2], r[0]))
    want = [(s, n, m, r) for r, (s, n, m) in enumerate(rows[:10], start=1)]
    assert got == want


_MT0 = datetime.datetime(2025, 1, 10)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=120),
            st.sampled_from(["view", "click"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_month_type_matrix_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "ts": [_MT0 + datetime.timedelta(days=d) for d, _ in events],
                "event_type": [e for _, e in events],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["month_type_matrix"].sql).fetchall()
    }
    model: dict[tuple[int, str], int] = {}
    for d, e in events:
        dt = _MT0 + datetime.timedelta(days=d)
        mk = dt.year * 12 + dt.month - 1
        model[(mk, e)] = model.get((mk, e), 0) + 1
    assert got == model


_text = st.lists(
    st.sampled_from(["a", "bb", "ccc", "dddd"]), min_size=0, max_size=6
).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1"]), _text),
        min_size=1,
        max_size=12,
    )
)
def test_source_token_length_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": [t for _, t in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["source_token_length"].sql).fetchall()
    }
    model = {}
    for s in {s for s, _ in docs}:
        toks = [w for ss, t in docs if ss == s for w in t.split()]
        if not toks:
            continue
        model[s] = (
            len(toks),
            _round_away(
                1_000_000 * (float(sum(len(w) for w in toks)) / len(toks))
            ),
        )
    assert got == model
