"""Property-based semantics checks for the session-48 operators.

Models: a type-7 percentile model over daily counts replicating the
oracle's float expression operation-for-operation, a per-type (ts,
event_id) argmax model for top_metrics, and an integer bucket model for
the length×quality 2-D census. match_bool_prefix is checked through
invariants over the sf0.001 fixture (the full-BM25 leg is already
property-covered by the bm25 suites; what's new here is the constant-score
prefix fusion). DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _US_PER_DAY, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _events_con(rows: list[tuple[int, int, str, float]]) -> duckdb.DuckDBPyConnection:
    """rows: (event_id, ts_us, event_type, value)."""
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime(
                    pd.Series([r[1] for r in rows], dtype="int64"), unit="us"
                ),
                "user_id": [0] * len(rows),
                "event_type": [r[2] for r in rows],
                "value": [r[3] for r in rows],
            }
        ),
    )
    return con


# ---------------------------------------------------------------------------
# percentiles_bucket_daily — type-7 percentiles of the daily-count buckets
# ---------------------------------------------------------------------------


def _type7(vals: list[int], p_q6: int) -> int:
    vs = sorted(vals)
    n = len(vs)
    rank = (p_q6 / 1_000_000.0) * (n - 1)
    lo = math.floor(rank)
    frac = rank - lo
    v_lo = vs[int(lo)]
    v_hi = vs[min(int(lo) + 1, n - 1)]
    return _round_away(1_000_000.0 * (v_lo + frac * (v_hi - v_lo)))


@settings(max_examples=50, deadline=None)
@given(days=st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=30))
def test_percentiles_bucket_matches_type7(days):
    rows = [
        (i, d * _US_PER_DAY + i * 1000, "view", 1.0) for i, d in enumerate(days)
    ]
    con = _events_con(rows)
    got = dict(con.execute(REGISTRY["percentiles_bucket_daily"].sql).fetchall())
    counts: dict[int, int] = {}
    for d in days:
        counts[d] = counts.get(d, 0) + 1
    vals = list(counts.values())
    assert got == {500000: _type7(vals, 500000), 900000: _type7(vals, 900000)}


# ---------------------------------------------------------------------------
# top_metrics_latest — per-type (ts, event_id) argmax
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000_000),  # ts_us (ties likely)
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=-500, max_value=99_999),  # cents
        ),
        min_size=1,
        max_size=25,
    )
)
def test_top_metrics_matches_argmax(evs):
    rows = [(i, ts, et, c / 100.0) for i, (ts, et, c) in enumerate(evs)]
    con = _events_con(rows)
    got = {
        r[0]: r[1:] for r in con.execute(REGISTRY["top_metrics_latest"].sql).fetchall()
    }
    model: dict[str, tuple] = {}
    for i, (ts, et, c) in enumerate(evs):
        key = (ts, i)
        if et not in model or key > model[et][:2]:
            model[et] = (ts, i, c)
    assert got == model


# ---------------------------------------------------------------------------
# len_quality_hist2d — integer bucket model
# ---------------------------------------------------------------------------

_WORDS = ["aa", "bb", "cc", "dd", "ee"]


@settings(max_examples=50, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
def test_len_quality_hist2d_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs}),
    )
    got = con.execute(REGISTRY["len_quality_hist2d"].sql).fetchall()
    cells: dict[tuple[int, int], list[int]] = {}
    for t in docs:
        ws = t.split()
        n, nd = len(ws), len(set(ws))
        if n == 0:
            lb, qb = -1, -1
        else:
            lb = n.bit_length() - 1  # floor(log2 n)
            ttr_q6 = _round_away(1_000_000.0 * nd / n)
            qb = min(4, (ttr_q6 * 5) // 1_000_000)
        c = cells.setdefault((lb, qb), [0, 0])
        c[0] += 1
        c[1] += n
    model = sorted((lb, qb, c[0], c[1]) for (lb, qb), c in cells.items())
    assert got == model


# ---------------------------------------------------------------------------
# match_bool_prefix — fusion invariants over the sf0.001 fixture
# ---------------------------------------------------------------------------


def test_match_bool_prefix_invariants_sf0001():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    rows = con.execute(REGISTRY["match_bool_prefix_search"].sql).fetchall()
    assert rows, "bool_prefix returned no rows"
    for doc_id, score_q6, nm, has_prefix in rows:
        assert has_prefix in (0, 1)
        # the constant-score prefix clause contributes exactly 1e6
        assert score_q6 >= 1_000_000 * has_prefix
        # clause count: 1..2 full terms + the prefix clause
        assert 1 <= nm <= 3
        if score_q6 == 1_000_000 and has_prefix == 1:
            assert nm == 1  # prefix-only docs carry no BM25 mass
    scores = [r[1] for r in rows]
    assert scores == sorted(scores, reverse=True)
