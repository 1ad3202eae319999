"""Property-based semantics checks for the session-207 operators.

DuckDB-only. nqc_qpp and err_eval are modeled from the oracle's OWN
match-set scores (the fairness-test approach — the float BM25 leg is
shared, the op-specific math is replayed exactly in Python);
markov_steps_to_purchase gets an exact integer-recursion model over
injected event streams.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _ERR_DEN,
    _MSP_ROUNDS,
    _NDCG_TERMS,
    _RANKEVAL_TERMS,
    _bm25_agg_ctes,
)
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_VOCAB = ["dup", "spark", "alpha", "beta"]


def _agg_scores(con, terms):
    sql = _bm25_agg_ctes(terms) + "\nSELECT doc_id, score_q6 FROM agg"
    return con.execute(sql).fetchall()


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=10),
        min_size=1,
        max_size=15,
    )
)
def test_nqc_qpp_matches_own_match_set(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["nqc_qpp"].sql).fetchall()
    scores = _agg_scores(con, _RANKEVAL_TERMS)

    n = len(scores)
    s = sum(sc for _, sc in scores)
    top = sorted(scores, key=lambda r: (-r[1], r[0]))[:10]
    nt = len(top)
    s1 = sum(sc for _, sc in top)
    s2 = sum(sc * sc for _, sc in top)
    if nt == 0 or s == 0:
        nqc2 = 0
    else:
        var = (float(s2) * nt - float(s1) * s1) / (float(nt) * nt)
        mean = float(s) / n
        nqc2 = _round_away(1000000 * var / (mean * mean))
    assert got == [(n, nt, nqc2)]


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=10),
        min_size=1,
        max_size=15,
    )
)
def test_err_eval_matches_exact_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["err_eval"].sql).fetchall()
    scores = _agg_scores(con, _NDCG_TERMS)
    ranked = [d for d, _ in sorted(scores, key=lambda r: (-r[1], r[0]))[:10]]

    gains = {}
    for i, ws in enumerate(docs):
        tf = sum(1 for t in tokenize(" ".join(ws)) if t == "dup")
        if tf:
            gains[i] = {1: 1, 2: 3}.get(min(tf, 3), 7)
    model, prod, cum = [], 1, 0
    for r, d in enumerate(ranked, start=1):
        rq = gains.get(d, 0)
        stop = _round_away(1000000000 * float(rq * prod) / _ERR_DEN[r])
        cum += stop
        model.append((r, rq, prod, stop, cum))
        prod *= 8 - rq
    assert got == model
    # ERR is bounded by Σ 1/r and every stop prob is nonnegative
    assert all(r[3] >= 0 for r in got)


_T0 = datetime.datetime(2024, 12, 1)
_TYPES = ["view", "click", "purchase"]


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.sampled_from(_TYPES),
            st.integers(min_value=0, max_value=5000),
        ),
        min_size=2,
        max_size=50,
    )
)
def test_markov_steps_matches_exact_recursion(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _, _ in evs],
                "event_type": [t for _, t, _ in evs],
                "ts": [_T0 + datetime.timedelta(seconds=s) for _, _, s in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["markov_steps_to_purchase"].sql).fetchall()
    }

    seqs = {}
    for i, (u, t, s) in enumerate(evs):
        seqs.setdefault(u, []).append((s * 1000000, i, t))
    trans = {}
    for rows in seqs.values():
        rows.sort()
        for (a, b) in zip(rows, rows[1:]):
            trans[(a[2], b[2])] = trans.get((a[2], b[2]), 0) + 1
    row_tot = {}
    for (pv, _), n in trans.items():
        if pv != "purchase":
            row_tot[pv] = row_tot.get(pv, 0) + n
    p = {
        (pv, nx): (1000000 * n) // row_tot[pv]
        for (pv, nx), n in trans.items()
        if pv != "purchase"
    }
    states = sorted(row_tot)
    h = {s: 0 for s in states}
    a = {s: 0 for s in states}
    for _ in range(_MSP_ROUNDS):
        nh, na = {}, {}
        for s in states:
            hh = sum(
                p.get((s, s2), 0) * h[s2] for s2 in states if s2 != "purchase"
            ) // 1000000
            aa = sum(
                p.get((s, s2), 0) * a[s2] for s2 in states if s2 != "purchase"
            ) // 1000000
            nh[s] = 1000000 + hh
            na[s] = p.get((s, "purchase"), 0) + aa
        h, a = nh, na
    model = {s: (h[s], a[s]) for s in states}
    assert got == model
    # absorb probability is a probability; steps at least one
    for s_q6, a_q6 in got.values():
        assert s_q6 >= 1000000 and 0 <= a_q6 <= 1000001
