"""Property-based semantics checks for the session-115 operators.

Models: seasonal/naive MAE against a literal zero-filled-calendar
model, term position profile against per-occurrence q6-first means,
Lorenz points against direct ranked cumulation (monotone to 100%).
DuckDB-only.
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


_DT0 = datetime.datetime(2025, 3, 1)


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(
        st.integers(min_value=0, max_value=20), min_size=1, max_size=40
    )
)
def test_seasonal_naive_mae_matches_model(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(days)),
                "ts": [_DT0 + datetime.timedelta(days=d) for d in days],
            }
        ),
    )
    rows = con.execute(REGISTRY["seasonal_naive_mae"].sql).fetchall()
    lo, hi = min(days), max(days)
    xs = [days.count(d) for d in range(lo, hi + 1)]
    scored = [(xs[i], xs[i - 7], xs[i - 1]) for i in range(7, len(xs))]
    if not scored:
        n, mae_s, mae_n = rows[0]
        assert n == 0
        return
    n, mae_s, mae_n = rows[0]
    assert n == len(scored)
    s_err = sum(abs(x - p) for x, p, _ in scored)
    n_err = sum(abs(x - p1) for x, _, p1 in scored)
    assert mae_s == _round_away(1_000_000 * (float(s_err) / len(scored)))
    assert mae_n == _round_away(1_000_000 * (float(n_err) / len(scored)))


_WP = ["aa", "bb", "cc", "dd"]
_textp = st.lists(st.sampled_from(_WP), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textp, min_size=1, max_size=12))
def test_term_positions_match_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": ["s0"] * len(docs),
                "text": docs,
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["term_position_profile"].sql).fetchall()
    }
    dfc: dict[str, int] = {}
    occ: dict[str, list[int]] = {}
    for t in docs:
        ws = t.split()
        for w in set(ws):
            dfc[w] = dfc.get(w, 0) + 1
        for i, w in enumerate(ws):
            occ.setdefault(w, []).append(
                _round_away(1_000_000 * (float(i) / max(len(ws) - 1, 1)))
            )
    top = sorted(dfc, key=lambda w: (-dfc[w], w))[:10]
    model = {
        w: (dfc[w], len(occ[w]), sum(occ[w]) // len(occ[w])) for w in top
    }
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1", "s2"]),
            st.integers(min_value=0, max_value=10),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_lorenz_points_match_model(docs):
    texts = [" ".join(["aa"] * n) for _, n in docs]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": texts,
            }
        ),
    )
    got = con.execute(REGISTRY["source_lorenz_points"].sql).fetchall()
    per: dict[str, int] = {}
    for s, n in docs:
        per[s] = per.get(s, 0) + n
    tt = sum(per.values())
    ranked = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    model = []
    for r, (s, n) in enumerate(ranked, start=1):
        cum += n
        model.append((s, r, n, (1_000_000 * cum) // max(tt, 1)))
    assert got == model
    shares = [r[3] for r in got]
    assert shares == sorted(shares)
    if tt > 0:
        assert shares[-1] == 1_000_000
