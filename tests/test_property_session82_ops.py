"""Property-based semantics checks for the session-82 operators.

Models: BM25-vs-PL2 top-10 overlap against full float replicas of both
models, kNN confusion-matrix invariants vs ann_label_purity's own
output, and the region census against direct counting. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _PL2_TERMS, REGISTRY

_LOG2E = 1.4426950408889634
_2PI = 6.283185307179586


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_WP = list(_PL2_TERMS) + ["zz", "yy"]
_textp = st.lists(st.sampled_from(_WP), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(docs=st.lists(_textp, min_size=1, max_size=12))
def test_overlap_matches_dual_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    k, ov = con.execute(REGISTRY["bm25_pl2_overlap"].sql).fetchall()[0]
    assert k == 10
    tfs: dict[tuple[int, str], int] = {}
    dfc: dict[str, int] = {}
    cf: dict[str, int] = {}
    dls: dict[int, int] = {}
    for d, t in enumerate(docs):
        ws = t.split()
        dls[d] = len(ws)
        for w in ws:
            tfs[(d, w)] = tfs.get((d, w), 0) + 1
            cf[w] = cf.get(w, 0) + 1
        for w in set(ws):
            dfc[w] = dfc.get(w, 0) + 1
    nd = len(docs)
    avgdl = sum(dls.values()) / float(nd)
    tot = sum(dls.values())

    def bscore(d):
        ss = []
        for w in _PL2_TERMS:
            if (d, w) not in tfs:
                continue
            tf = tfs[(d, w)]
            ss.append(
                math.log(1.0 + (nd - dfc[w] + 0.5) / (dfc[w] + 0.5))
                * tf * 2.2
                / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
            )
        return _round_away(sum(ss) * 1e6) if ss else None

    def pscore(d):
        ss = []
        for w in _PL2_TERMS:
            if (d, w) not in tfs:
                continue
            tfn = tfs[(d, w)] * (math.log(1.0 + (tot / nd) / dls[d]) * _LOG2E)
            lam = cf[w] / nd
            ss.append(
                _LOG2E
                * (
                    tfn * math.log(tfn / lam)
                    + (lam - tfn)
                    + 0.5 * math.log(_2PI * tfn)
                )
                / (tfn + 1.0)
            )
        return _round_away(sum(ss) * 1e6) if ss else None

    bs = {d: s for d in range(nd) if (s := bscore(d)) is not None}
    ps = {d: s for d in range(nd) if (s := pscore(d)) is not None}
    btop = set(sorted(bs, key=lambda d: (-bs[d], d))[:10])
    ptop = set(sorted(ps, key=lambda d: (-ps[d], d))[:10])
    assert ov == len(btop & ptop)


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=6, deadline=None)
@given(data=st.data(), n=st.integers(min_value=38, max_value=45))
def test_confusion_consistent_with_purity(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    labels = [i % 3 for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": range(n), "label": labels, "embedding": vecs}),
    )
    conf = con.execute(REGISTRY["knn_label_confusion"].sql).fetchall()
    pur = con.execute(REGISTRY["ann_label_purity"].sql).fetchall()
    n_queries_by_label = {r[0]: r[1] for r in pur}
    voted = {}
    for t, p, c in conf:
        assert c >= 1
        voted[t] = voted.get(t, 0) + c
    # every voting query's true label exists in the purity census and the
    # vote count never exceeds the label's query count
    for t, c in voted.items():
        assert c <= n_queries_by_label[t]


@settings(max_examples=40, deadline=None)
@given(
    nations=st.lists(
        st.integers(min_value=0, max_value=2), min_size=3, max_size=6
    ),
    custs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=-10000, max_value=10000).map(lambda k: k / 4),
        ),
        min_size=0,
        max_size=15,
    ),
    supps=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=-10000, max_value=10000).map(lambda k: k / 4),
        ),
        min_size=0,
        max_size=10,
    ),
)
def test_region_census_matches_model(nations, custs, supps):
    nk = list(range(len(nations)))
    custs = [(c % len(nk), b) for c, b in custs]
    supps = [(s % len(nk), b) for s, b in supps]
    con = duckdb.connect()
    con.register(
        "region",
        pd.DataFrame(
            {"r_regionkey": [0, 1, 2], "r_name": ["RA", "RB", "RC"]}
        ),
    )
    con.register(
        "nation",
        pd.DataFrame({"n_nationkey": nk, "n_regionkey": nations}),
    )
    con.register(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": range(len(custs)),
                "c_nationkey": [c for c, _ in custs],
                "c_acctbal": [b for _, b in custs],
            }
        ),
    )
    con.register(
        "supplier",
        pd.DataFrame(
            {
                "s_suppkey": range(len(supps)),
                "s_nationkey": [s for s, _ in supps],
                "s_acctbal": [b for _, b in supps],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["region_market_census"].sql).fetchall()
    }
    names = {0: "RA", 1: "RB", 2: "RC"}
    model = {}
    for rk in set(nations):
        nat = [i for i, r in enumerate(nations) if r == rk]
        cs = [(c, b) for c, b in custs if c in nat]
        ss = [(s, b) for s, b in supps if s in nat]
        model[names[rk]] = (
            len(nat),
            len(cs),
            sum(_round_away(b * 100) for _, b in cs),
            len(ss),
            sum(_round_away(b * 100) for _, b in ss),
        )
    assert got == model
