"""Property-based semantics checks for the session-117 operators.

Models: ranking AUC against a brute-force pairwise comparison (the
MWU identity it relies on), cluster source spread via union-find over
the pair oracle, props-k banding against direct extraction.
DuckDB-only.
"""

from __future__ import annotations

import json
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _RANKEVAL_TERMS, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_WA = list(_RANKEVAL_TERMS) + ["zz", "yy"]
_texta = st.lists(st.sampled_from(_WA), min_size=1, max_size=8).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_texta, min_size=1, max_size=12))
def test_ranking_auc_matches_bruteforce(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    n_rel, n_irr, auc = con.execute(REGISTRY["ranking_auc"].sql).fetchall()[0]
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
    rel = {d for d in scores if (d, "dup") in tfs}
    irr = set(scores) - rel
    assert (n_rel, n_irr) == (len(rel), len(irr))
    if not rel or not irr:
        assert auc == 0
        return
    u2 = 0
    for r in rel:
        for i in irr:
            if scores[r] > scores[i]:
                u2 += 2
            elif scores[r] == scores[i]:
                u2 += 1
    want = _round_away(
        1_000_000 * (float(u2) / (2.0 * len(rel) * len(irr)))
    )
    assert auc == want


_W3 = ["aa", "bb", "cc", "dd"]
_text3 = st.lists(st.sampled_from(_W3), min_size=3, max_size=7).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1", "s2"]), _text3),
        min_size=2,
        max_size=10,
    )
)
def test_cluster_spread_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": [t for _, t in docs],
            }
        ),
    )
    pairs = con.execute(REGISTRY["minhash_lsh_pairs"].sql).fetchall()
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["cluster_source_spread"].sql).fetchall()
    }
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
    model: dict[int, list[int]] = {}
    for mem in clusters.values():
        srcs = len({docs[d][0] for d in mem})
        cell = model.setdefault(srcs, [0, 0])
        cell[0] += 1
        cell[1] += len(mem)
    assert got == {k: tuple(v) for k, v in model.items()}


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["view", "click"]),
            st.one_of(st.none(), st.integers(min_value=-3, max_value=100)),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_props_k_histogram_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "event_type": [t for t, _ in events],
                "props": [
                    json.dumps({} if k is None else {"k": k})
                    for _, k in events
                ],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["props_k_histogram"].sql).fetchall()
    }
    model: dict[tuple[str, int], int] = {}
    for t, k in events:
        if k is None:
            band = -2
        elif k <= 0:
            band = -1
        else:
            band = k.bit_length() - 1
        model[(t, band)] = model.get((t, band), 0) + 1
    assert got == model
