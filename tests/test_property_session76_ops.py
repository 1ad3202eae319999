"""Property-based semantics checks for the session-76 operators.

Models: AP@10 via the exact lcm-2520 integer identity against a literal
float AP computation, RM3 weights against a per-(doc,term) q6-first
model over a full BM25 replica, and the datasheet against direct
counting. DuckDB-only.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _RANKEVAL_TERMS, _RM3_TERMS, REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _bm25_scores(docs, terms):
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
    scores = {}
    for d in range(n_docs):
        ss = []
        for w in terms:
            if (d, w) not in tfs:
                continue
            tf = tfs[(d, w)]
            ss.append(
                math.log(1.0 + (n_docs - dfc[w] + 0.5) / (dfc[w] + 0.5))
                * tf * 2.2
                / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
            )
        if ss:
            scores[d] = _round_away(sum(ss) * 1_000_000)
    return scores, tfs, dls


_WM = list(set(_RANKEVAL_TERMS) | set(_RM3_TERMS)) + ["zz", "yy"]
_textm = st.lists(st.sampled_from(sorted(_WM)), min_size=1, max_size=8).map(
    " ".join
)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textm, min_size=1, max_size=12))
def test_map_eval_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    n_rel, nr10, ap_q6 = con.execute(REGISTRY["map_eval"].sql).fetchall()[0]
    scores, tfs, _ = _bm25_scores(docs, _RANKEVAL_TERMS)
    top10 = sorted(scores, key=lambda d: (-scores[d], d))[:10]
    rel = {d for d in range(len(docs)) if (d, "dup") in tfs}
    assert n_rel == len(rel)
    cum = 0
    ap2520 = 0
    hits = 0
    for k, d in enumerate(top10, start=1):
        if d in rel:
            cum += 1
            hits += 1
            ap2520 += (2520 * cum) // k
    assert nr10 == hits
    if not rel:
        assert ap_q6 == 0
    else:
        want = _round_away(
            1_000_000 * (float(ap2520) / (2520 * min(len(rel), 10)))
        )
        assert ap_q6 == want
        # the lcm identity: scaled-integer AP equals the float AP exactly
        float_ap = sum(
            (i + 1) / (k + 1)
            for i, (k, d) in enumerate(
                (k, d) for k, d in enumerate(top10) if d in rel
            )
        )
        assert ap2520 == round(2520 * float_ap)


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textm, min_size=1, max_size=12))
def test_rm3_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = con.execute(REGISTRY["rm3_expansion_terms"].sql).fetchall()
    scores, tfs, dls = _bm25_scores(docs, _RM3_TERMS)
    fb = sorted(scores, key=lambda d: (-scores[d], d))[:10]
    s = sum(scores[d] for d in fb)
    weights: dict[str, int] = {}
    for d in fb:
        for (dd, w), tf in tfs.items():
            if dd != d or w in _RM3_TERMS:
                continue
            if s == 0:
                wq6 = 0
            else:
                wq6 = _round_away(
                    1_000_000 * ((float(scores[d]) / s) * (float(tf) / dls[d]))
                )
            weights[w] = weights.get(w, 0) + wq6
    model = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = [(w, r, wq) for r, (w, wq) in enumerate(model, start=1)]
    assert got == want


_SRC = ["s0", "s1"]
_textd = st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=5).map(
    " ".join
)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(_SRC), _textd), min_size=1, max_size=14
    )
)
def test_datasheet_matches_model(docs):
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
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["dataset_datasheet"].sql).fetchall()
    }
    model = {}
    for src in {s for s, _ in docs}:
        mine = [t for s, t in docs if s == src]
        toks = [w for t in mine for w in t.split()]
        n_docs = len(mine)
        n_tok = len(toks)
        n_types = len(set(toks))
        n_dup = n_docs - len({hashlib.md5(t.encode()).hexdigest() for t in mine})
        mean = _round_away(1_000_000 * (float(n_tok) / n_docs))
        ttr = 0 if n_tok == 0 else (1_000_000 * n_types) // n_tok
        model[src] = (n_docs, n_tok, n_dup, mean, ttr)
    assert got == model
