"""Property-based semantics checks for the session-128 operators.

Models: hour character, per-lang length stats and the arrival matrix
against direct aggregation. DuckDB-only.
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


_HT0 = datetime.datetime(2025, 10, 1)


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
def test_hour_top_type_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "event_type": [t for t, _ in events],
                "ts": [_HT0 + datetime.timedelta(hours=h) for _, h in events],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["hour_top_type"].sql).fetchall()
    }
    base_h = int((_HT0 - datetime.datetime(1970, 1, 1)).total_seconds()) // 3600
    cells: dict[tuple[int, str], int] = {}
    for t, h in events:
        hr = (base_h + h) % 24
        cells[(hr, t)] = cells.get((hr, t), 0) + 1
    model = {}
    for hr in {h for h, _ in cells}:
        tys = {t: n for (h, t), n in cells.items() if h == hr}
        top = max(tys.values())
        tt = min(t for t, n in tys.items() if n == top)
        tot = sum(tys.values())
        model[hr] = (tt, top, (1_000_000 * top) // tot)
    assert got == model


_text = st.lists(st.sampled_from(["aa", "bb"]), min_size=0, max_size=6).map(
    " ".join
)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["en", "fr"]), _text),
        min_size=1,
        max_size=15,
    )
)
def test_lang_doclen_stats_match_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "lang": [lg for lg, _ in docs],
                "text": [t for _, t in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["lang_doclen_stats"].sql).fetchall()
    }
    model = {}
    for lg in {l for l, _ in docs}:
        lens = [len(t.split()) for l, t in docs if l == lg]
        model[lg] = (
            len(lens),
            _round_away(1_000_000 * (float(sum(lens)) / len(lens))),
            min(lens),
            max(lens),
        )
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.sampled_from(["s0", "s1"]),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_source_arrival_matrix_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [d for d, _ in docs],
                "source": [s for _, s in docs],
                "text": [""] * len(docs),
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["source_arrival_matrix"].sql).fetchall()
    }
    lo = min(d for d, _ in docs)
    hi = max(d for d, _ in docs)
    model: dict[tuple[int, str], int] = {}
    for d, s in docs:
        dec = min((10 * (d - lo)) // max(hi - lo + 1, 1), 9)
        model[(dec, s)] = model.get((dec, s), 0) + 1
    assert got == model
