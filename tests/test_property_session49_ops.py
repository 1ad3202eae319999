"""Property-based semantics checks for the session-49 operators.

Models: a Python MSTTR-25 segmental model (exact slice arithmetic), a
trailing-28-day DAU/MAU model over explicit (day, user) activity, a
first-view → first-purchase latency model, and contingency invariants for
the chi-squared significant-terms heuristic over the sf0.001 fixture
(the BM25 foreground is covered by the bm25 suites; new here is the 2×2
cell arithmetic and the over-representation gate). DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _MSTTR_W, _US_PER_DAY, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


# ---------------------------------------------------------------------------
# msttr_source
# ---------------------------------------------------------------------------

_WORDS = ["aa", "bb", "cc", "dd"]


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["sa", "sb"]),
            st.lists(st.sampled_from(_WORDS), min_size=0, max_size=60),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_msttr_matches_segment_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(ws) for _, ws in docs],
                "source": [s for s, _ in docs],
            }
        ),
    )
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(REGISTRY["msttr_source"].sql).fetchall()
    }
    per_src: dict[str, list[int]] = {}
    for s, ws in docs:
        for i in range(len(ws) // _MSTTR_W):
            nd = len(set(ws[i * _MSTTR_W : (i + 1) * _MSTTR_W]))
            per_src.setdefault(s, []).append(
                _round_away(1_000_000.0 * nd / _MSTTR_W)
            )
    model = {
        s: (len(tt), _round_away(sum(tt) / float(len(tt))))
        for s, tt in per_src.items()
    }
    assert got == model


# ---------------------------------------------------------------------------
# events_stickiness / conversion_latency_histogram
# ---------------------------------------------------------------------------


def _events_con(rows: list[tuple[int, int, int, str]]) -> duckdb.DuckDBPyConnection:
    """rows: (event_id, ts_us, user_id, event_type)."""
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime(
                    pd.Series([r[1] for r in rows], dtype="int64"), unit="us"
                ),
                "user_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
                "value": [1.0] * len(rows),
            }
        ),
    )
    return con


@settings(max_examples=40, deadline=None)
@given(
    acts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),  # day
            st.integers(min_value=0, max_value=5),  # user
        ),
        min_size=1,
        max_size=40,
    )
)
def test_stickiness_matches_window_model(acts):
    rows = [
        (i, d * _US_PER_DAY + i, u, "view") for i, (d, u) in enumerate(acts)
    ]
    con = _events_con(rows)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(REGISTRY["events_stickiness"].sql).fetchall()
    }
    by_day: dict[int, set[int]] = {}
    for d, u in acts:
        by_day.setdefault(d, set()).add(u)
    model = {}
    for d, users in by_day.items():
        mau = set()
        for dd in range(d - 27, d + 1):
            mau |= by_day.get(dd, set())
        model[d] = (
            len(users),
            len(mau),
            _round_away(1_000_000.0 * len(users) / len(mau)),
        )
    assert got == model
    # DAU <= MAU always -> stickiness in (0, 1e6]
    for dau, mau, s in got.values():
        assert dau <= mau and 0 < s <= 1_000_000


@settings(max_examples=40, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=1_000_000),  # ts_us
            st.sampled_from(["view", "purchase", "click"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_conversion_latency_matches_model(evs):
    rows = [(i, ts, u, et) for i, (u, ts, et) in enumerate(evs)]
    con = _events_con(rows)
    got = dict(
        con.execute(REGISTRY["conversion_latency_histogram"].sql).fetchall()
    )
    first_view: dict[int, int] = {}
    for u, ts, et in evs:
        if et == "view" and (u not in first_view or ts < first_view[u]):
            first_view[u] = ts
    buckets: dict[int, int] = {}
    for u, vts in first_view.items():
        p = [ts for uu, ts, et in evs if uu == u and et == "purchase" and ts >= vts]
        if not p:
            continue
        gap = min(p) - vts
        b = -1 if gap == 0 else gap.bit_length() - 1
        buckets[b] = buckets.get(b, 0) + 1
    assert got == buckets


# ---------------------------------------------------------------------------
# significant_terms_chi2 — contingency invariants over sf0.001
# ---------------------------------------------------------------------------


def test_chi2_terms_invariants_sf0001():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    rows = con.execute(REGISTRY["significant_terms_chi2"].sql).fetchall()
    assert rows, "chi2 significant terms returned no rows"
    # recover the foreground size and corpus size the op used
    from docix_spark.driver_queries import _bm25_agg_ctes, _TOPK_TERMS

    ft, n = con.execute(
        _bm25_agg_ctes(_TOPK_TERMS)
        + ", fg AS (SELECT DISTINCT doc_id FROM agg)"
        " SELECT (SELECT count(*) FROM fg), (SELECT CAST(n_docs AS BIGINT) FROM st)"
    ).fetchall()[0]
    for term, fg_df, bg_df, chi2_q6 in rows:
        a, b = fg_df, ft - fg_df
        c, d = bg_df - fg_df, n - ft - (bg_df - fg_df)
        assert a >= 3 and c >= 0 and d >= 0 and chi2_q6 >= 0
        assert a * d > b * c  # over-represented in the foreground only
    chis = [r[3] for r in rows]
    assert chis == sorted(chis, reverse=True)
