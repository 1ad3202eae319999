"""Property-based semantics checks for the session-120 operators.

Models: SQ8 recall against a literal reconstruct-then-rank model,
cluster length ratios via union-find over the pair oracle, and the
wealth board against direct argmax with min-key ties. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=10, deadline=None)
@given(data=st.data(), n=st.integers(min_value=5, max_value=15))
def test_sq8_recall_matches_model(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    k, ov = con.execute(REGISTRY["sq8_recall"].sql).fetchall()[0]
    assert k == 10
    xq = [
        [_round_away(1_000_000 * x) for x in v] for v in vecs
    ]
    mins = [min(xq[i][d] for i in range(1, n)) for d in range(64)]
    maxs = [max(xq[i][d] for i in range(1, n)) for d in range(64)]

    def recon(i):
        out = []
        for d in range(64):
            mn, mx = mins[d], maxs[d]
            x = xq[i][d]
            if mx == mn:
                out.append(float(mn))
            else:
                code = ((x - mn) * 255) // (mx - mn)
                out.append(float(mn + (code * (mx - mn)) // 255))
        return out

    def cosq(a, b):
        dd = na = nb = 0.0
        for x, y in zip(a, b):
            dd += x * y
            na += x * x
            nb += y * y
        return _round_away(1_000_000 * dd / (math.sqrt(na) * math.sqrt(nb)))

    q = vecs[0]
    approx = sorted(
        range(1, n), key=lambda i: (-cosq(recon(i), q), i)
    )[:10]
    exact = sorted(range(1, n), key=lambda i: (-cosq(vecs[i], q), i))[:10]
    assert ov == len(set(approx) & set(exact))


_W3 = ["aa", "bb", "cc", "dd"]
_text3 = st.lists(st.sampled_from(_W3), min_size=3, max_size=9).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(docs=st.lists(_text3, min_size=2, max_size=10))
def test_cluster_length_ratio_matches_model(docs):
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
    got = dict(
        con.execute(REGISTRY["cluster_length_variance"].sql).fetchall()
    )
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters: dict[int, list[int]] = {}
    for x in parent:
        clusters.setdefault(find(x), []).append(x)
    hist: dict[int, int] = {}
    for mem in clusters.values():
        lens = [len(docs[d].split()) for d in mem]
        mn, mx = min(lens), max(lens)
        b = 9 if mx == 0 else min(((1_000_000 * mn) // mx) // 100_000, 9)
        hist[b] = hist.get(b, 0) + 1
    assert got == hist


_bal = st.integers(min_value=-8000, max_value=8000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    custs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), _bal),
        min_size=1,
        max_size=20,
    )
)
def test_wealth_board_matches_model(custs):
    con = duckdb.connect()
    con.register(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": range(len(custs)),
                "c_nationkey": [nk for nk, _ in custs],
                "c_acctbal": [b for _, b in custs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["nation_richest_customer"].sql
        ).fetchall()
    }
    per: dict[int, list] = {}
    for ck, (nk, b) in enumerate(custs):
        per.setdefault(nk, []).append((ck, _round_away(b * 100)))
    model = {}
    for nk, rows in per.items():
        top = max(b for _, b in rows)
        ck = min(c for c, b in rows if b == top)
        model[nk] = (len(rows), ck, top)
    assert got == model
