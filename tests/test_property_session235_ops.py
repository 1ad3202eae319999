"""Session-235 check: cc_convergence_curve vs an exact union-find-free
plain-propagation model, plus the convergence invariants that justify
pointer doubling."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _CCC_ROUNDS
from docix_spark.analysis.tokenizer import tokenize

# docs built as overlapping shingle CHAINS so the LSH graph has real
# diameter: doc k shares a 3-gram band with doc k+1 w.h.p.
_W = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=5),
)
def test_cc_convergence_curve_matches_model(n, seed):
    # chain corpus: doc i = words[i..i+3] — adjacent docs share their
    # 3-gram set, so LSH bands collide along a path graph
    docs = [" ".join(_W[(i + seed) % 8] for i in range(k, k + 4)) for k in range(n)]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(1, n + 1),
                "source": ["s0"] * n,
                "text": docs,
            }
        ),
    )
    got = con.execute(REGISTRY["cc_convergence_curve"].sql).fetchall()
    assert len(got) == _CCC_ROUNDS

    # rebuild the candidate graph exactly as the oracle does
    import hashlib

    def shingles(text):
        t = tokenize(text)
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sig = {}
    for d, text in enumerate(docs, start=1):
        sh = shingles(text)
        if not sh:
            continue
        mh = lambda p: min(hashlib.md5(f"{p}:{s}".encode()).hexdigest() for s in sh)
        sig[d] = (mh(0) + mh(1), mh(2) + mh(3))
    edges = set()
    ids = sorted(sig)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if sig[a][0] == sig[b][0] or sig[a][1] == sig[b][1]:
                edges.add((a, b))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = ids
    lbl = {d: d for d in nodes}
    model = []
    for r in range(1, _CCC_ROUNDS + 1):
        nxt = {
            d: min([lbl[d]] + [lbl[x] for x in adj.get(d, ())]) for d in nodes
        }
        changed = sum(1 for d in nodes if nxt[d] != lbl[d])
        model.append((r, changed, len(set(nxt.values()))))
        lbl = nxt
    assert got == model
    # invariants: labels only coarsen (n_labels nonincreasing) and a
    # round with zero changes stays converged forever
    nl = [x[2] for x in got]
    assert nl == sorted(nl, reverse=True)
    for i in range(1, len(got)):
        if got[i - 1][1] == 0:
            assert got[i][1] == 0
