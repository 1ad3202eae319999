"""Property-based semantics checks for the session-132 operators.

Models: the session-threshold curve against literal per-threshold
sessionization (plus monotonicity), brand supplier diversity and the
length-gate curve against direct counting. DuckDB-only.
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


_ST0 = datetime.datetime(2025, 11, 1)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=8000),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_session_threshold_curve_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_ST0 + datetime.timedelta(seconds=s) for _, s in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["session_threshold_curve"].sql
        ).fetchall()
    }
    per: dict[int, list] = {}
    for i, (u, s) in enumerate(events):
        per.setdefault(u, []).append((s * 1_000_000, i))
    model = {}
    for m, thr in ((10, 600_000_000), (30, 1_800_000_000), (60, 3_600_000_000)):
        sessions = 0
        for rows in per.values():
            rows = sorted(rows)
            prev = None
            for t_us, _ in rows:
                if prev is None or t_us - prev > thr:
                    sessions += 1
                prev = t_us
        model[m] = (
            sessions,
            _round_away(1_000_000 * (float(len(events)) / max(sessions, 1))),
        )
    assert got == model
    ns = [model[m][0] for m in (10, 30, 60)]
    assert ns[0] >= ns[1] >= ns[2]


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=25,
    ),
    brands=st.lists(st.sampled_from(["B1", "B2"]), min_size=5, max_size=5),
)
def test_brand_diversity_matches_model(li, brands):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_suppkey": [s for s, _ in li],
                "l_partkey": [p for _, p in li],
            }
        ),
    )
    con.register(
        "part", pd.DataFrame({"p_partkey": range(5), "p_brand": brands})
    )
    got = dict(
        con.execute(REGISTRY["brand_supplier_diversity"].sql).fetchall()
    )
    per: dict[str, set[int]] = {}
    for s, p in li:
        per.setdefault(brands[p], set()).add(s)
    assert got == {b: len(s) for b, s in per.items()}


@settings(max_examples=40, deadline=None)
@given(
    lens=st.lists(
        st.integers(min_value=0, max_value=60), min_size=1, max_size=25
    )
)
def test_length_gate_curve_matches_model(lens):
    docs = [" ".join(["aa"] * n) for n in lens]
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["length_gate_curve"].sql).fetchall()
    }
    tot = sum(lens)
    model = {}
    for k in (8, 16, 32):
        kept = [n for n in lens if n >= k]
        model[k] = (
            len(kept),
            sum(kept),
            (1_000_000 * sum(kept)) // max(tot, 1),
        )
    assert got == model
    assert model[8][0] >= model[16][0] >= model[32][0]
