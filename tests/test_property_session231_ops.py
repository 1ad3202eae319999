"""Session-231 operator checks (multiprobe_signlsh_curve,
ivm_delta_cost_model). DuckDB-only: exact models on injected tables plus
nesting/monotonicity invariants."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _IVM_BATCH_PCTS,
    _MP_VERIFY_T,
)
from docix_spark.analysis.tokenizer import tokenize

_WORDS = ["alpha", "beta", "gamma", "x"]


@settings(max_examples=25, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-8, max_value=8).map(lambda k: k / 8.0),
            min_size=16, max_size=16,
        ),
        min_size=2, max_size=16,
    )
)
def test_multiprobe_signlsh_matches_model(vecs):
    con = duckdb.connect()
    arr = [np.array(v + [0.0] * 0, dtype=np.float32) for v in vecs]
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": range(1, len(vecs) + 1), "embedding": arr}),
    )
    got = con.execute(REGISTRY["multiprobe_signlsh_curve"].sql).fetchall()

    X = [np.asarray(a, dtype=np.float32).astype(np.float64) for a in arr]

    def code(v, j):
        return sum((1 << i) for i in range(4) if v[4 * j + i] > 0)

    rmin = {}
    n = len(X)
    for ia in range(n):
        for ib in range(ia + 1, n):
            best = None
            for j in range(4):
                ca, cb = code(X[ia], j), code(X[ib], j)
                h = bin(ca ^ cb).count("1")
                if h <= 1:
                    best = 0 if (h == 0 and best != 0) and True else best
                    if h == 0:
                        best = 0
                    elif best is None:
                        best = 1
            if best is not None:
                rmin[(ia, ib)] = best

    def verified(ia, ib):
        va, vb = X[ia], X[ib]
        na, nb = np.sqrt((va * va).sum()), np.sqrt((vb * vb).sum())
        if na == 0 or nb == 0:
            return False  # zero-norm: cos undefined; engines yield NULL>=T false
        c = int(round(1_000_000 * float(np.dot(va, vb)) / (na * nb)))
        return c >= _MP_VERIFY_T

    model = []
    for radius in (0, 1):
        cand = [k for k, r in rmin.items() if r <= radius]
        ver = sum(1 for k in cand if verified(*k))
        prec = (1_000_000 * ver) // len(cand) if cand else 0
        model.append((radius, len(cand), ver, prec))
    assert got == model
    # nesting: radius-1 candidate/verified counts dominate radius-0
    assert got[1][1] >= got[0][1] and got[1][2] >= got[0][2]


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8),
        min_size=1, max_size=30,
    )
)
def test_ivm_delta_cost_model_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(1, len(docs) + 1), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["ivm_delta_cost_model"].sql).fetchall()

    tf = Counter()
    for i, ws in enumerate(docs, start=1):
        for t in set(tokenize(" ".join(ws))):
            tf[(i, t)] += 1
    full = len(tf) + len({t for _, t in tf})

    def hp(d):
        return int(hashlib.md5(f"ivm:{d}".encode()).hexdigest()[:4], 16) % 100

    model = []
    for p in _IVM_BATCH_PCTS:
        batch = {d for d in range(1, len(docs) + 1) if hp(d) < p}
        dp = [(d, t) for (d, t) in tf if d in batch]
        nd = len({d for d, _ in dp})
        tt = len({t for _, t in dp})
        model.append(
            (p, nd, len(dp), tt, full, (1_000_000 * (full - len(dp) - tt)) // full)
        )
    assert got == model
    # batches nest -> delta costs monotone, savings antitone
    dps = [r[2] for r in got]
    assert dps == sorted(dps)
    savs = [r[5] for r in got]
    assert savs == sorted(savs, reverse=True)
