"""Property-based semantics checks for the session-43 operators.

Models: a weighted-pseudo-tf BM25F (±3 q6 on the float score, exact match
counts/ordering — the cross_fields convention), an exact interpolated
Kneser-Ney model (every count is a BIGINT; the probability expression is
mirrored operation-for-operation so equality is exact), a hashlib-md5
bucket model for the hashing-trick audit, and a dyadic-cents Q6 model.
DuckDB-only — ms per example.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _FEAT_BUCKETS, _KN_D, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_WORDS = ["spark", "hash", "join", "scan", "the"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20)
_corpus = st.lists(_doc, min_size=1, max_size=10)


def _con(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(d) for d in docs],
                "source": ["s"] * len(docs),
            }
        ),
    )
    return con


# ---------------------------------------------------------------------------
# bm25f_search — weighted pseudo-tf, single saturation, doc-level idf
# ---------------------------------------------------------------------------

_FW = {"title": 2.0, "body": 1.0}
_FB = {"title": 0.5, "body": 0.75}


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_bm25f_matches_weighted_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["bm25f_search"].sql).fetchall()
    fields = {}
    for i, toks in enumerate(docs):
        if toks[:8]:
            fields[(i, "title")] = Counter(toks[:8])
        if toks[8:]:
            fields[(i, "body")] = Counter(toks[8:])
    if not fields:
        assert got == []
        return
    n_docs = float(len({d for d, _ in fields}))
    dls = {k: sum(c.values()) for k, c in fields.items()}
    avgdl = {
        f: sum(v for (d, ff), v in dls.items() if ff == f)
        / sum(1 for (_, ff) in dls if ff == f)
        for f in {ff for _, ff in fields}
    }
    ddf = Counter()
    for d in {d for d, _ in fields}:
        present = set()
        for f in ("title", "body"):
            present |= set(fields.get((d, f), ()))
        for t in present:
            ddf[t] += 1
    scores: dict[int, tuple[float, int]] = {}
    for d in {d for d, _ in fields}:
        s_doc, nm = 0.0, 0
        for t in ["spark", "hash", "join"]:
            wt = 0.0
            seen = False
            for f in ("title", "body"):
                c = fields.get((d, f))
                if not c or t not in c:
                    continue
                seen = True
                wt += _FW[f] * c[t] / ((1.0 - _FB[f]) + _FB[f] * dls[(d, f)] / avgdl[f])
            if not seen:
                continue
            idf = math.log(1.0 + (n_docs - ddf[t] + 0.5) / (ddf[t] + 0.5))
            s_doc += idf * wt / (1.2 + wt)
            nm += 1
        if nm:
            scores[d] = (s_doc, nm)
    assert len(got) == min(10, len(scores))
    for doc_id, score_q6, nm, rank in got:
        ms, mnm = scores[doc_id]
        assert nm == mnm
        assert abs(score_q6 - round(ms * 1_000_000)) <= 3
    keys = [(-score, doc_id) for doc_id, score, _, _ in got]
    assert keys == sorted(keys)


# a term present in both fields saturates ONCE: its BM25F score must be
# below the sum of two independent per-field saturations (most_fields)
def test_bm25f_single_saturation_vs_most_fields():
    docs = [["spark"] * 8 + ["spark"] * 8, ["the"] * 16]
    con = _con(docs)
    f_score = con.execute(REGISTRY["bm25f_search"].sql).fetchall()[0][1]
    m_score = con.execute(REGISTRY["most_fields_search"].sql).fetchall()[0][1]
    # same doc tops both; most_fields double-counts saturation
    assert m_score > f_score > 0


# ---------------------------------------------------------------------------
# kneser_ney_bigram — exact interpolated-KN model
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_kneser_ney_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["kneser_ney_bigram"].sql).fetchall()
    bg = Counter()
    for d in docs:
        for a, b in zip(d, d[1:]):
            bg[(a, b)] += 1
    if not bg:
        assert got == []
        return
    c1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (a, b), c in bg.items():
        c1[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nbt = len(bg)
    model = []
    for (a, b), c in bg.items():
        p = (c - _KN_D) / c1[a] + (_KN_D * n1f[a] / c1[a]) * (n1b[b] / nbt)
        model.append((a, b, c, _round_away(1_000_000 * p)))
    model.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == model[:20]
    for _, _, _, p in got:
        assert 0 < p <= 1_000_000  # a seen bigram has positive bounded mass


# ---------------------------------------------------------------------------
# feature_hash_collisions — hashlib bucket model; mass conservation
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_feature_hash_collisions_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["feature_hash_collisions"].sql).fetchall()
    tc = Counter(t for d in docs for t in d)
    if not tc:
        assert got == []
        return
    buckets: dict[int, list[int]] = {}
    for t, n in tc.items():
        b = int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % _FEAT_BUCKETS
        a = buckets.setdefault(b, [0, 0])
        a[0] += 1
        a[1] += n
    model = [(b, v[0], v[1]) for b, v in buckets.items()]
    model.sort(key=lambda r: (-r[1], r[0]))
    assert got == model[:20]
    if len(model) <= 20:  # with ≤20 buckets hit, the audit sees everything
        assert sum(r[2] for r in got) == sum(tc.values())


# ---------------------------------------------------------------------------
# forecast_revenue_change — Q6 scan-agg model (grid discounts exact)
# ---------------------------------------------------------------------------

_Q6_SHIP = int(pd.Timestamp("1996-06-01").value // 1000)
_OUT_SHIP = int(pd.Timestamp("1997-06-01").value // 1000)


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.booleans(),  # in the 1996 window?
            st.sampled_from([0.04, 0.05, 0.06, 0.07, 0.08]),
            st.sampled_from([10.0, 23.75, 24.0, 30.0]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=0,
        max_size=20,
    )
)
def test_forecast_revenue_change_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_shipdate": pd.to_datetime(
                    pd.Series(
                        [(_Q6_SHIP if r[0] else _OUT_SHIP) for r in li], dtype="int64"
                    ),
                    unit="us",
                ),
                "l_discount": pd.Series([r[1] for r in li], dtype="float64"),
                "l_quantity": pd.Series([r[2] for r in li], dtype="float64"),
                "l_extendedprice": pd.Series([float(r[3]) for r in li], dtype="float64"),
            }
        ),
    )
    got = con.execute(REGISTRY["forecast_revenue_change"].sql).fetchall()
    n = rev = 0
    for inside, disc, qty, ep in li:
        if inside and 5 <= _round_away(100 * disc) <= 7 and qty < 24:
            n += 1
            rev += _round_away(100 * float(ep) * disc)
    assert got == [(n, rev)]
