"""Property-based semantics checks for the session-119 operators.

Models: the score-rank curve against a full BM25 model, centroid-matrix
invariants on injected embeddings, and the retention triangle against a
literal cohort model (age-0 row always 100%). DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _RANKEVAL_TERMS, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_WS = list(_RANKEVAL_TERMS) + ["zz", "yy"]
_texts = st.lists(st.sampled_from(_WS), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_texts, min_size=1, max_size=12))
def test_score_rank_curve_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = con.execute(REGISTRY["score_rank_curve"].sql).fetchall()
    tfs: dict[tuple[int, str], int] = {}
    dfc: dict[str, int] = {}
    dls: dict[int, int] = {}
    for d, t in enumerate(docs):
        ws = t.split()
        dls[d] = len(ws)
        for w in ws:
            tfs[(d, w)] = tfs.get((d, w), 0) + 1
        for w in set(ws):
            dfc[w] = dfc.get(w, 0) + 1
    nd = len(docs)
    avgdl = sum(dls.values()) / float(nd)
    scores = {}
    for d in range(nd):
        ss = []
        for w in _RANKEVAL_TERMS:
            if (d, w) not in tfs:
                continue
            tf = tfs[(d, w)]
            ss.append(
                math.log(1.0 + (nd - dfc[w] + 0.5) / (dfc[w] + 0.5))
                * tf * 2.2
                / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
            )
        if ss:
            scores[d] = _round_away(sum(ss) * 1_000_000)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    if not ranked:
        assert got == []
        return
    s1 = ranked[0][1]
    want = [
        (r, s, 0 if s1 == 0 else (1_000_000 * s) // s1)
        for r, (_, s) in enumerate(ranked, start=1)
    ]
    assert got == want


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=6, deadline=None)
@given(data=st.data(), n=st.integers(min_value=15, max_value=25))
def test_centroid_matrix_invariants(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    rows = con.execute(REGISTRY["ivf_centroid_matrix"].sql).fetchall()
    assert len(rows) == 28  # C(8, 2)
    for a, b, c in rows:
        assert 1 <= a < b <= 8
        assert -1_000_001 <= c <= 1_000_001


_CT0 = datetime.datetime(2025, 5, 5)


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=35),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cohort_retention_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "user_id": [u for u, _ in events],
                "ts": [_CT0 + datetime.timedelta(days=d) for _, d in events],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(
            REGISTRY["cohort_retention_matrix"].sql
        ).fetchall()
    }
    day0 = (_CT0 - datetime.datetime(1970, 1, 1)).days
    uw = {(u, (day0 + d) // 7) for u, d in events}
    c0 = {}
    for u, w in uw:
        c0[u] = min(c0.get(u, w), w)
    sizes: dict[int, int] = {}
    for u, cw in c0.items():
        sizes[cw] = sizes.get(cw, 0) + 1
    act: dict[tuple[int, int], int] = {}
    for u, w in uw:
        key = (c0[u], w - c0[u])
        act[key] = act.get(key, 0) + 1
    model = {
        (cw, age): (sizes[cw], n, (1_000_000 * n) // sizes[cw])
        for (cw, age), n in act.items()
    }
    assert got == model
    # age 0 is always 100%
    for (cw, age), (_, _, r) in model.items():
        if age == 0:
            assert r == 1_000_000
