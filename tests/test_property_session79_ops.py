"""Semantics checks for the session-79 operators.

wig_qpp against a full BM25 replica (exact), ann_label_purity on
structural invariants over injected embeddings (1/64-multiple
components, never all-zero — session-52 rules), url_domain_census
against a direct extraction model with injected URLs (the
pii_scrub_stats "prove the counters" convention). DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _RANKEVAL_TERMS, REGISTRY

_WIG_NORM = 7.0710678118654755e-1


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


# ---------------------------------------------------------------------------
# wig_qpp
# ---------------------------------------------------------------------------

_WM = list(_RANKEVAL_TERMS) + ["zz", "yy"]
_textm = st.lists(st.sampled_from(_WM), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textm, min_size=1, max_size=12))
def test_wig_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    n, mt, ma, wig = con.execute(REGISTRY["wig_qpp"].sql).fetchall()[0]
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
    vals = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    assert n == len(vals)
    top = [s for _, s in vals[:10]]
    allv = [s for _, s in vals]
    emt = sum(top) // max(len(top), 1)
    ema = sum(allv) // max(len(allv), 1)
    assert (mt, ma) == (emt, ema)
    assert wig == _round_away((emt - ema) * _WIG_NORM)


# ---------------------------------------------------------------------------
# ann_label_purity — structural invariants on injected embeddings
# ---------------------------------------------------------------------------

_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=8, deadline=None)
@given(data=st.data(), n=st.integers(min_value=38, max_value=45))
def test_label_purity_invariants(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    labels = [i % 3 for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": labels, "embedding": vecs}
        ),
    )
    rows = con.execute(REGISTRY["ann_label_purity"].sql).fetchall()
    qlabels = [labels[i] for i in range(n) if i % 37 == 0]
    from collections import Counter

    qcount = Counter(qlabels)
    got_q = {r[0]: r[1] for r in rows}
    assert got_q == dict(qcount)
    for label, n_q, n_nb, n_same, purity in rows:
        assert 0 <= n_same <= n_nb <= 10 * n_q
        if n_nb == 0:
            assert purity == 0
        else:
            assert purity == (1_000_000 * n_same) // n_nb
            assert 0 <= purity <= 1_000_000


# ---------------------------------------------------------------------------
# url_domain_census — injected URLs prove the extraction
# ---------------------------------------------------------------------------

_DOMAINS = ["example.com", "spark.apache.org", "a-b.co", "x9.io"]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.tuples(st.sampled_from(_DOMAINS), st.booleans()),
            min_size=0,
            max_size=4,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_url_census_matches_model(docs):
    texts = []
    for spec in docs:
        parts = ["plain words here"]
        for dom, https in spec:
            parts.append(f"see {'https' if https else 'http'}://{dom}/path now")
        texts.append(" ".join(parts))
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = con.execute(REGISTRY["url_domain_census"].sql).fetchall()
    per: dict[str, list] = {}
    for d, spec in enumerate(docs):
        for dom, _ in spec:
            per.setdefault(dom, [set(), 0])
            per[dom][0].add(d)
            per[dom][1] += 1
    model = sorted(
        ((dom, len(ds), m) for dom, (ds, m) in per.items()),
        key=lambda r: (-r[2], r[0]),
    )[:20]
    want = [(dom, r, nd, nm) for r, (dom, nd, nm) in enumerate(model, start=1)]
    assert got == want
