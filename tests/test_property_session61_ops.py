"""Property-based semantics checks for the session-61 operators.

Models: a JLH foreground/background model over doc_id deciles, an exact
weekday-mean decomposition (with the observed == seasonal + residual
identity), and a Python Hill estimator (including the small-corpus
sentinel). DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _HILL_K, _US_PER_DAY, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_W = ["aa", "bb", "cc", "dd"]
_text = st.lists(st.sampled_from(_W), min_size=0, max_size=6).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_text, min_size=10, max_size=30))
def test_trending_terms_matches_jlh_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = con.execute(REGISTRY["trending_terms"].sql).fetchall()
    n = len(docs)
    fg_df: dict[str, int] = {}
    bg_df: dict[str, int] = {}
    fg_docs = set()
    for d, t in enumerate(docs):
        dec = (d * 10) // n
        ws = set(t.split())
        for w in ws:
            bg_df[w] = bg_df.get(w, 0) + 1
            if dec == 9:
                fg_df[w] = fg_df.get(w, 0) + 1
        if dec == 9 and ws:
            fg_docs.add(d)
    ft = len(fg_docs)
    model = []
    for w, f in fg_df.items():
        if f < 3:
            continue
        fp = f / float(ft)
        bp = bg_df[w] / float(n)
        jlh = _round_away((fp - bp) * (fp / bp) * 1_000_000)
        if jlh > 0:
            model.append((w, f, bg_df[w], jlh))
    model.sort(key=lambda r: (-r[3], r[0]))
    assert got == model[:20]


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=30)
)
def test_seasonal_decompose_identity(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(days)),
                "ts": pd.to_datetime(
                    pd.Series([d * _US_PER_DAY + 7 for d in days], dtype="int64"),
                    unit="us",
                ),
                "value": [1.0] * len(days),
            }
        ),
    )
    rows = con.execute(REGISTRY["weekly_seasonal_decompose"].sql).fetchall()
    d0, d1 = min(days), max(days)
    assert [r[0] for r in rows] == list(range(d0, d1 + 1))  # zero-filled spine
    counts = {d: days.count(d) for d in set(days)}
    by_dow: dict[int, list[int]] = {}
    for d in range(d0, d1 + 1):
        by_dow.setdefault((d + 3) % 7, []).append(counts.get(d, 0))
    for day, dow, cnt, seasonal_q6, residual_q6 in rows:
        assert dow == (day + 3) % 7
        assert cnt == counts.get(day, 0)
        vals = by_dow[dow]
        assert seasonal_q6 == _round_away(1_000_000.0 * sum(vals) / len(vals))
        # exact identity in q6 space
        assert residual_q6 == _round_away(
            1_000_000.0 * cnt - 1_000_000.0 * sum(vals) / len(vals)
        )


@settings(max_examples=30, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=70)
)
def test_hill_matches_model(lens):
    docs = ["w " * n for n in lens]
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    k, x_k, sum_log, alpha = con.execute(REGISTRY["doclen_hill_tail"].sql).fetchall()[0]
    pos = sorted((n for n in lens if n > 0), reverse=True)
    if len(pos) < _HILL_K + 1:
        assert (k, x_k, sum_log, alpha) == (0, -1, 0, 0)
        return
    xk = pos[_HILL_K]
    logs = [
        _round_away(1_000_000 * math.log(x / float(xk))) for x in pos[:_HILL_K]
    ]
    s = sum(logs)
    want_alpha = 0 if s == 0 else _round_away(1_000_000.0 * _HILL_K / (s / 1_000_000.0))
    assert (k, x_k, sum_log, alpha) == (_HILL_K, xk, s, want_alpha)
