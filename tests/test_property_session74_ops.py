"""Property-based semantics checks for the session-74 operators.

Models: the clustering-coefficient histogram is rebuilt in Python from
the minhash_lsh_pairs oracle's own candidate edges (exact integer
buckets), NDCG@10 against a full BM25 + folded-integer-discount model,
and the variable-width buckets against a literal 1-D Lloyd iteration.
DuckDB-only (ms per example).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _NDCG_TERMS, _NDCG_W, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


# ---------------------------------------------------------------------------
# lsh_clustering_histogram — modeled off the oracle's own pair list
# ---------------------------------------------------------------------------

_W3 = ["aa", "bb", "cc", "dd"]
_text3 = st.lists(st.sampled_from(_W3), min_size=3, max_size=7).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(docs=st.lists(_text3, min_size=2, max_size=10))
def test_clustering_histogram_matches_pair_model(docs):
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
    pairs = con.execute(REGISTRY["minhash_lsh_pairs"].sql).fetchall()
    got = dict(con.execute(REGISTRY["lsh_clustering_histogram"].sql).fetchall())
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    hist = {b: 0 for b in range(-1, 10)}
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            hist[-1] += 1
            continue
        t = sum(
            1
            for x in nb
            for y in nb
            if x < y and y in adj.get(x, set())
        )
        bucket = min(((2_000_000 * t) // (d * (d - 1))) // 100_000, 9)
        hist[bucket] += 1
    assert got == hist
    assert sum(got.values()) == len(adj)


# ---------------------------------------------------------------------------
# ndcg_eval — full BM25 + integer-discount model
# ---------------------------------------------------------------------------

_WN = list(_NDCG_TERMS) + ["zz", "yy"]
_textn = st.lists(st.sampled_from(_WN), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textn, min_size=1, max_size=12))
def test_ndcg_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    dcg, idcg, ndcg = con.execute(REGISTRY["ndcg_eval"].sql).fetchall()[0]
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
    n_docs = len(docs)
    avgdl = sum(dls.values()) / float(n_docs)

    def bm25(d, w):
        tf = tfs[(d, w)]
        return (
            math.log(1.0 + (n_docs - dfc[w] + 0.5) / (dfc[w] + 0.5))
            * tf * 2.2
            / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
        )

    scores = {}
    for d in range(n_docs):
        s = [bm25(d, w) for w in _NDCG_TERMS if (d, w) in tfs]
        if s:
            scores[d] = _round_away(sum(s) * 1_000_000)
    top10 = sorted(scores, key=lambda d: (-scores[d], d))[:10]
    gains = {
        d: (2 ** min(tfs[(d, "dup")], 3)) - 1
        for d in range(n_docs)
        if (d, "dup") in tfs
    }
    mdcg = sum(
        gains.get(d, 0) * _NDCG_W[r] for r, d in enumerate(top10, start=1)
    )
    ideal = sorted(gains, key=lambda d: (-gains[d], d))[:10]
    midcg = sum(gains[d] * _NDCG_W[r] for r, d in enumerate(ideal, start=1))
    assert (dcg, idcg) == (mdcg, midcg)
    if midcg == 0:
        assert ndcg == 0
    else:
        assert ndcg == _round_away(1_000_000 * (float(mdcg) / midcg))
        assert 0 <= ndcg <= 1_000_000


# ---------------------------------------------------------------------------
# value_kmeans_buckets — literal Lloyd model
# ---------------------------------------------------------------------------

_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


def _assign(x, c):
    if 2 * x <= c[0] + c[1]:
        return 0
    if 2 * x <= c[1] + c[2]:
        return 1
    if 2 * x <= c[2] + c[3]:
        return 2
    return 3


@settings(max_examples=40, deadline=None)
@given(prices=st.lists(_price, min_size=1, max_size=30))
def test_kmeans_buckets_match_model(prices):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {"o_orderkey": range(len(prices)), "o_totalprice": prices}
        ),
    )
    got = con.execute(REGISTRY["value_kmeans_buckets"].sql).fetchall()
    xs = [_round_away(p * 100) for p in prices]
    lo, hi = min(xs), max(xs)
    c = [lo + ((2 * i + 1) * (hi - lo)) // 8 for i in range(4)]
    for _ in range(2):
        sums = {k: [0, 0] for k in range(4)}
        for x in xs:
            k = _assign(x, c)
            sums[k][0] += x
            sums[k][1] += 1
        c = [sums[i][0] // sums[i][1] if sums[i][1] else c[i] for i in range(4)]
    stats = {k: [0, None, None] for k in range(4)}
    for x in xs:
        k = _assign(x, c)
        stats[k][0] += 1
        stats[k][1] = x if stats[k][1] is None else min(stats[k][1], x)
        stats[k][2] = x if stats[k][2] is None else max(stats[k][2], x)
    model = [
        (
            k,
            stats[k][0],
            stats[k][1] if stats[k][1] is not None else -1,
            stats[k][2] if stats[k][2] is not None else -1,
            c[k],
        )
        for k in range(4)
    ]
    assert got == model
    # centroids stay sorted (the midpoint-threshold rule's precondition)
    assert all(a <= b for a, b in zip(c, c[1:]))
