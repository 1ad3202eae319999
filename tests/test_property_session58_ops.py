"""Property-based semantics checks for the session-58 operators.

Models: a Python k-core peeler over the minhash-band graph, an exact
dictionary-split model for decompounding, and a per-doc char-entropy
model. DuckDB-only.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _DECOMPOUND_Q, _KCORE_K, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _docs_con(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": docs, "source": ["s"] * len(docs)}
        ),
    )
    return con


def _mh_bands(text: str) -> set[str]:
    ws = text.lower().split()
    sh = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    if not sh:
        return set()
    mh = [min(hashlib.md5(f"{k}:{s}".encode()).hexdigest() for s in sh) for k in range(4)]
    return {mh[0] + mh[1], mh[2] + mh[3]}


_dup_text = st.lists(
    st.sampled_from(["aa bb cc dd", "aa bb cc", "ee ff gg", "hh ii jj kk"]),
    min_size=1,
    max_size=2,
).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_dup_text, min_size=2, max_size=9))
def test_kcore_matches_peel_model(docs):
    con = _docs_con(docs)
    got = con.execute(REGISTRY["lsh_kcore"].sql).fetchall()[0]
    bands = [_mh_bands(t) for t in docs]
    edges = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            if bands[i] & bands[j]:
                edges.add((i, j))
    nodes = {x for e in edges for x in e}
    cur_e, cur_n = set(edges), set(nodes)
    while True:
        deg: dict[int, int] = {}
        for a, b in cur_e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {x for x in cur_n if deg.get(x, 0) >= _KCORE_K}
        new_e = {(a, b) for a, b in cur_e if a in keep and b in keep}
        if new_e == cur_e and keep == cur_n:
            break
        cur_e, cur_n = new_e, keep
    assert got == (len(cur_n), len(cur_e), len(nodes), len(edges), 0)
    # core degrees all >= k
    deg = {}
    for a, b in cur_e:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert all(d >= _KCORE_K for d in deg.values())


_DC_VOCAB = ["spark", "join", "s", "parkjoin", "sparkjo", "in", "park"]
_dc_text = st.lists(st.sampled_from(_DC_VOCAB), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_dc_text, min_size=1, max_size=6))
def test_decompound_matches_model(docs):
    con = _docs_con(docs)
    got = con.execute(REGISTRY["decompound_query"].sql).fetchall()
    cf: dict[str, int] = {}
    for t in docs:
        for w in t.split():
            cf[w] = cf.get(w, 0) + 1
    cands = []
    for i in range(1, len(_DECOMPOUND_Q)):
        lf, rt = _DECOMPOUND_Q[:i], _DECOMPOUND_Q[i:]
        if lf in cf and rt in cf:
            cands.append((i, lf, rt, cf[lf], cf[rt], cf[lf] * cf[rt]))
    cands.sort(key=lambda r: (-r[5], r[0]))
    assert got == cands[:3]


_ent_text = st.text(
    alphabet="abcxyz ", min_size=0, max_size=25
)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_ent_text, min_size=1, max_size=8))
def test_low_entropy_matches_model(docs):
    con = _docs_con(docs)
    got = con.execute(REGISTRY["low_entropy_docs"].sql).fetchall()
    model = []
    for d, t in enumerate(docs):
        t = t.lower()
        if not t:
            continue
        counts: dict[str, int] = {}
        for c in t:
            counts[c] = counts.get(c, 0) + 1
        n = len(t)
        h = sum(
            _round_away(-1_000_000 * (c / float(n)) * math.log(c / float(n)))
            for c in counts.values()
        )
        model.append((d, n, h))
    model.sort(key=lambda r: (r[2], r[0]))
    assert got == model[:10]
    # single-character docs have exactly zero entropy
    for d, n, h in got:
        if n > 0 and len(set(docs[d].lower())) == 1:
            assert h == 0
