"""Property-based semantics checks for the session-163 operators.

Models: gap-∞ sequential pair support, trailing-token top-10, and the
shipment completeness census. DuckDB-only (ms per example).
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 3, 1)
_CUT = datetime.datetime(1998, 9, 2)


@settings(max_examples=35, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_seq_pair_support_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _ in evs],
                "event_type": [t for _, t, _ in evs],
                "ts": [_D0 + datetime.timedelta(hours=h) for _, _, h in evs],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(REGISTRY["seq_pair_support"].sql).fetchall()
    }

    per: dict[int, dict[str, list[int]]] = {}
    for u, t, h in evs:
        cell = per.setdefault(u, {}).setdefault(t, [10**9, -1])
        cell[0] = min(cell[0], h)
        cell[1] = max(cell[1], h)
    agg: dict[tuple[str, str], list[int]] = {}
    for u, types in per.items():
        for a in types:
            for b in types:
                if a == b:
                    continue
                cell = agg.setdefault((a, b), [0, 0])
                cell[0] += 1
                cell[1] += 1 if types[a][0] < types[b][1] else 0
    model = {
        k: (c[0], c[1], (1000000 * c[1]) // c[0]) for k, c in agg.items()
    }
    assert got == model


_word = st.sampled_from(["alpha", "beta", "gamma", "end"])


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=1, max_size=5), min_size=1, max_size=15
    )
)
def test_trailing_token_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": ["web"] * len(docs),
                "text": [" ".join(ws) for ws in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["trailing_token_census"].sql).fetchall()

    from collections import Counter

    cnt = Counter(ws[-1] for ws in docs)
    tot = len(docs)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    model = [
        (tok, i + 1, n, (1000000 * n) // tot)
        for i, (tok, n) in enumerate(ranked)
    ]
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.booleans(),  # shipped before cutoff?
        ),
        min_size=1,
        max_size=30,
    )
)
def test_partial_shipment_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_shipdate": [
                    _CUT - datetime.timedelta(days=5)
                    if shipped
                    else _CUT + datetime.timedelta(days=5)
                    for _, shipped in li
                ],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["partially_shipped_orders"].sql
        ).fetchall()
    }

    per: dict[int, list[int]] = {}
    for o, shipped in li:
        cell = per.setdefault(o, [0, 0])
        cell[0] += 1
        cell[1] += 1 if shipped else 0
    model: dict[str, list[int]] = {}
    for n, s in per.values():
        state = "none" if s == 0 else "full" if s == n else "partial"
        cell = model.setdefault(state, [0, 0])
        cell[0] += 1
        cell[1] += n
    assert got == {k: tuple(v) for k, v in model.items()}
