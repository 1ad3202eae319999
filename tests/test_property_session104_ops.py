"""Property-based semantics checks for the session-104 operators.

Models: dup rate by length rebuilt from the pair oracle + union-find,
query term share against a full BM25 contribution model, and the SQ
bits curve against a literal affine-code model (plus bit-monotone
SSE). DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _RANKEVAL_TERMS, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_W3 = ["aa", "bb", "cc", "dd"]
_text3 = st.lists(st.sampled_from(_W3), min_size=3, max_size=7).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(docs=st.lists(_text3, min_size=2, max_size=10))
def test_dup_rate_by_length_matches_model(docs):
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
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["dup_rate_by_length"].sql).fetchall()
    }
    members = {a for a, _ in pairs} | {b for _, b in pairs}
    model: dict[int, list[int]] = {}
    for d, t in enumerate(docs):
        n = len(t.split())
        band = -1 if n == 0 else n.bit_length() - 1
        cell = model.setdefault(band, [0, 0])
        cell[0] += 1
        cell[1] += 1 if d in members else 0
    assert got == {
        b: (nd, nc, (1_000_000 * nc) // nd) for b, (nd, nc) in model.items()
    }


_WQ = list(_RANKEVAL_TERMS) + ["zz", "yy"]
_textq = st.lists(st.sampled_from(_WQ), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textq, min_size=1, max_size=12))
def test_query_term_share_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["query_term_share"].sql).fetchall()
    }
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

    def contrib(d, w):
        tf = tfs[(d, w)]
        return (
            math.log(1.0 + (nd - dfc[w] + 0.5) / (dfc[w] + 0.5))
            * tf * 2.2
            / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
        )

    scores = {}
    for d in range(nd):
        ss = [contrib(d, w) for w in _RANKEVAL_TERMS if (d, w) in tfs]
        if ss:
            scores[d] = _round_away(sum(ss) * 1_000_000)
    page = sorted(scores, key=lambda d: (-scores[d], d))[:10]
    per_term: dict[str, int] = {}
    for d in page:
        for w in _RANKEVAL_TERMS:
            if (d, w) in tfs:
                per_term[w] = per_term.get(w, 0) + _round_away(
                    1_000_000 * contrib(d, w)
                )
    tot = sum(per_term.values())
    model = {
        w: (c, (1_000_000 * c) // max(tot, 1)) for w, c in per_term.items()
    }
    assert got == model


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=10, deadline=None)
@given(data=st.data(), n=st.integers(min_value=3, max_value=10))
def test_sq_bits_curve_matches_model(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    got = {r[0]: r[2] for r in con.execute(REGISTRY["sq_bits_curve"].sql).fetchall()}
    cols = list(zip(*[[_round_away(1_000_000 * x) for x in v] for v in vecs[1:]]))
    model = {}
    for bits, lv in ((4, 15), (6, 63), (8, 255)):
        sse = 0
        for col in cols:
            mn, mx = min(col), max(col)
            for xq in col:
                if mx == mn:
                    rec = mn
                else:
                    code = ((xq - mn) * lv) // (mx - mn)
                    rec = mn + (code * (mx - mn)) // lv
                sse += (xq - rec) ** 2
        model[bits] = sse
    assert got == model
    assert model[4] >= model[6] >= model[8]
