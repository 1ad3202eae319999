"""Property-based semantics checks for the session-155 operators.

Models: the MMR greedy (integer 7·relz − 3·maxcos with doc_id
tiebreaks) — exercised on the DuckDB oracle's OWN candidate pool by
injecting a corpus whose BM25 chain is live — and the nation trade
balance rollup. The Spark MMR leg's identity with the oracle is the
driver-contract replica's job; here the greedy semantics are proven
against a brute-force model reading the oracle's own un table.
DuckDB-only (ms per example).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_comp = st.integers(min_value=-32, max_value=32).map(lambda k: k / 64)
_vec = st.lists(_comp, min_size=8, max_size=8).filter(
    lambda v: any(x != 0 for x in v)
)
_words = st.lists(
    st.sampled_from(["spark", "hash", "join", "filler", "other"]),
    min_size=1,
    max_size=6,
).filter(lambda ws: any(w in ("spark", "hash", "join") for w in ws))


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(_words, min_size=2, max_size=12),
    vecs=st.data(),
)
def test_mmr_greedy_matches_model(docs, vecs):
    n = len(docs)
    emb = [vecs.draw(_vec) for _ in range(n)]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(1, n + 1),  # skip 0 (excluded by the op)
                "text": [" ".join(ws) for ws in docs],
            }
        ),
    )
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(1, n + 1),
                "embedding": [np.asarray(v, dtype=np.float32) for v in emb],
            }
        ),
    )
    got = con.execute(REGISTRY["mmr_rerank"].sql).fetchall()

    # model: read the oracle's own candidate pool (top-20 + relz + u)
    un = con.execute(
        REGISTRY["mmr_rerank"].sql.split("p0 AS MATERIALIZED")[0].rstrip().rstrip(",")
        + "\nSELECT doc_id, relz, u FROM un"
    ).fetchall()
    rel = {r[0]: r[1] for r in un}
    uvec = {r[0]: list(r[2]) for r in un}

    def cosq(a, b):
        s = 0.0
        for x, y in zip(uvec[a], uvec[b]):
            s += x * y
        return _round_away(1000000 * s)

    if not rel:
        assert got == []
        return
    first = min(
        rel, key=lambda d: (-rel[d], d)
    )
    out = [(0, first, rel[first], 0, 7 * rel[first])]
    remaining = [d for d in rel if d != first]
    mc = {d: cosq(d, first) for d in remaining}
    for i in range(1, min(8, len(rel))):
        pick = min(remaining, key=lambda d: (-(7 * rel[d] - 3 * mc[d]), d))
        out.append((i, pick, rel[pick], mc[pick], 7 * rel[pick] - 3 * mc[pick]))
        remaining.remove(pick)
        for d in remaining:
            c = cosq(d, pick)
            if c > mc[d]:
                mc[d] = c
    assert got == out


_bal = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), _bal, _bal),
        min_size=1,
        max_size=20,
    ),
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), _bal),
        min_size=1,
        max_size=10,
    ),
    snat=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
    cnat=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
)
def test_nation_trade_balance_matches_model(li, orders, snat, cnat):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_suppkey": [s for s, _, _ in li],
                "l_extendedprice": [p for _, p, _ in li],
                "l_discount": [0.0] * len(li),
            }
        ),
    )
    con.register(
        "supplier",
        pd.DataFrame({"s_suppkey": range(4), "s_nationkey": snat}),
    )
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_custkey": [c for c, _ in orders],
                "o_totalprice": [v for _, v in orders],
            }
        ),
    )
    con.register(
        "customer",
        pd.DataFrame({"c_custkey": range(4), "c_nationkey": cnat}),
    )
    con.register(
        "nation",
        pd.DataFrame({"n_nationkey": range(3), "n_name": ["NA", "NB", "NC"]}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["nation_trade_balance"].sql).fetchall()
    }

    exp: dict[int, list[int]] = {}
    for s, p, _ in li:
        nk = snat[s]
        cell = exp.setdefault(nk, [0, 0])
        cell[0] += 1
        cell[1] += _round_away(100 * p)
    imp: dict[int, list[int]] = {}
    for c, v in orders:
        nk = cnat[c]
        cell = imp.setdefault(nk, [0, 0])
        cell[0] += 1
        cell[1] += _round_away(v * 100)
    model = {}
    for i, nm in enumerate(["NA", "NB", "NC"]):
        e = exp.get(i, [0, 0])
        m = imp.get(i, [0, 0])
        model[nm] = (e[0], e[1], m[0], m[1], e[1] - m[1])
    assert got == model
