"""Property-based semantics checks for the session-53 operators.

Models: a df-band model over tokenized docs, and an exact sorted-list
Pareto model (equal-revenue users are interchangeable, so the histogram
decomposition must equal ANY tie-break of the sorted list). The BM25
sweep is checked through invariants over sf0.001 — the default config
must overlap itself 10/10, and every overlap is in [0, 10]. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _BM25_SWEEP, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def test_bm25_sweep_invariants_sf0001():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    rows = con.execute(REGISTRY["bm25_param_sweep"].sql).fetchall()
    assert len(rows) == len(_BM25_SWEEP)
    by_cfg = {(r[0], r[1]): r[2] for r in rows}
    assert by_cfg[(120, 75)] == 10  # the default overlaps itself fully
    assert all(0 <= v <= 10 for v in by_cfg.values())


# ---------------------------------------------------------------------------
# df_spectrum
# ---------------------------------------------------------------------------

_WORDS = ["aa", "bb", "cc", "dd", "ee"]
_text = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=10))
def test_df_spectrum_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["df_spectrum"].sql).fetchall()}
    df: dict[str, int] = {}
    cf: dict[str, int] = {}
    for t in docs:
        ws = t.split()
        for w in ws:
            cf[w] = cf.get(w, 0) + 1
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    bands: dict[int, list[int]] = {}
    for w, d in df.items():
        b = d.bit_length() - 1
        cell = bands.setdefault(b, [0, 0, 0])
        cell[0] += 1
        cell[1] += d
        cell[2] += cf[w]
    assert got == {b: tuple(c) for b, c in bands.items()}


# ---------------------------------------------------------------------------
# revenue_pareto_users — histogram decomposition == sorted-list top-k
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # user
            st.integers(min_value=-200, max_value=5000),  # cents per event
        ),
        min_size=1,
        max_size=30,
    )
)
def test_revenue_pareto_matches_sorted_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _ in evs],
                "value": [c / 100.0 for _, c in evs],
            }
        ),
    )
    got = {r[0]: r[1:] for r in con.execute(REGISTRY["revenue_pareto_users"].sql).fetchall()}
    ur: dict[int, int] = {}
    for u, c in evs:
        ur[u] = ur.get(u, 0) + c
    vals = sorted(ur.values(), reverse=True)
    n, rev = len(vals), sum(vals)
    for p_q6 in (100000, 10000):
        k = -((-(p_q6 * n)) // 1_000_000)  # ceil
        rev_top = sum(vals[:k])
        share = 0 if rev == 0 else _round_away(1_000_000.0 * rev_top / rev)
        assert got[p_q6] == (k, rev_top, share)
