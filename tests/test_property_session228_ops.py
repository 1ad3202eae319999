"""Property-based semantics checks for the session-228 operators
(shard_fanout_compare, sq8_clip_calibration, winnow_density_audit).

DuckDB-only, exact Python models with integer arithmetic mirrored
(trunc-toward-zero division, md5-lex minima, float32 round-trip for the
embedding column)."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _FANOUT_QUERIES,
    _FANOUT_S,
)
from docix_spark.analysis.tokenizer import tokenize

_WORDS = ["spark", "hash", "join", "dup", "the", "loop", "x9"]


def _h16(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
        min_size=1,
        max_size=16,
    )
)
def test_shard_fanout_compare_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(1, len(docs) + 1), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["shard_fanout_compare"].sql).fetchall()

    # postings: distinct (doc, term)
    postings = set()
    for i, ws in enumerate(docs, start=1):
        for t in set(tokenize(" ".join(ws))):
            postings.add((i, t))
    model = []
    for q, terms in sorted(_FANOUT_QUERIES):
        qp = [(d, t) for d, t in postings if t in terms]
        if not qp:
            continue  # query with zero postings emits no row (inner join)
        for layout, key in (("doc", lambda d, t: _h16(f"fd:{d}") % _FANOUT_S),
                            ("term", lambda d, t: _h16(f"ft:{t}") % _FANOUT_S)):
            loads = {}
            for d, t in qp:
                loads[key(d, t)] = loads.get(key(d, t), 0) + 1
            total = sum(loads.values())
            mx = max(loads.values())
            model.append(
                (q, layout, len(loads), total, mx,
                 (1_000_000 * _FANOUT_S * mx) // total)
            )
    assert got == model
    for _, _, touched, total, mx, imb in got:
        assert 1 <= touched <= _FANOUT_S
        assert mx * touched >= total  # max bound
        assert imb >= 1_000_000  # max >= mean of touched>=... vs /S mean
    # term layout can't touch more shards than the query has terms
    for q, terms in _FANOUT_QUERIES:
        row = [r for r in got if r[0] == q and r[1] == "term"]
        if row:
            assert row[0][2] <= len(terms)


def _trunc_div(a, b):
    # both engines truncate integer division toward zero
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@settings(max_examples=30, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-64, max_value=64).map(lambda k: k / 64.0),
            min_size=3, max_size=3,
        ),
        min_size=2, max_size=24,
    )
)
def test_sq8_clip_calibration_matches_model(vecs):
    # components multiples of 1/64 — exact in float32 AND float64
    con = duckdb.connect()
    arr = [np.array(v, dtype=np.float32) for v in vecs]
    con.register(
        "embeddings",
        pd.DataFrame({"vec_id": range(1, len(vecs) + 1), "embedding": arr}),
    )
    got = con.execute(REGISTRY["sq8_clip_calibration"].sql).fetchall()

    X = np.array([np.asarray(a, dtype=np.float32).astype(np.float64) for a in arr])
    model = []
    for dim in range(X.shape[1]):
        xs = [int(round(x * 1_000_000)) for x in X[:, dim]]
        n = len(xs)
        mn, mx = min(xs), max(xs)
        s1 = sum(_trunc_div(x, 1000) for x in xs)
        s2 = sum(_trunc_div(x, 1000) ** 2 for x in xs)
        sigma = int(round(1000 * (n * s2 - s1 * s1) ** 0.5 / n))
        mu = _trunc_div(1000 * s1, n)
        lo0, hi0 = max(mn, mu - 2 * sigma), min(mx, mu + 2 * sigma)
        lo, hi = (lo0, hi0) if hi0 > lo0 else (mn, mx)

        def recon(x, a, b):
            if b == a:
                return a
            return a + _trunc_div(_trunc_div((x - a) * 255, b - a) * (b - a), 255)

        sse_mm = sum((x - recon(x, mn, mx)) ** 2 for x in xs)
        xc = [min(max(x, lo), hi) for x in xs]
        sse_cl = sum((x - recon(c, lo, hi)) ** 2 for x, c in zip(xs, xc))
        ncl = sum(1 for x in xs if x < lo or x > hi)
        model.append((dim, sse_mm, sse_cl, ncl))
    assert got == model
    # min/max codec never clips: reconstruction error bounded by one step
    for dim, sse_mm, sse_cl, ncl in got:
        assert sse_mm >= 0 and sse_cl >= 0 and 0 <= ncl <= len(vecs)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s0", "s1"]),
            st.lists(st.sampled_from(_WORDS), min_size=1, max_size=20),
        ),
        min_size=1, max_size=12,
    )
)
def test_winnow_density_audit_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(1, len(docs) + 1),
                "source": [s for s, _ in docs],
                "text": [" ".join(ws) for _, ws in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["winnow_density_audit"].sql).fetchall()

    per = {}
    for src, ws in docs:
        toks = tokenize(" ".join(ws))
        if len(toks) < 8:
            continue
        hs = [
            hashlib.md5(" ".join(toks[i : i + 4]).encode()).hexdigest()
            for i in range(len(toks) - 3)
        ]
        fps = {min(hs[j : j + 5]) for j in range(len(hs) - 4)}
        nd, g0, f0 = per.get(src, (0, 0, 0))
        per[src] = (nd + 1, g0 + len(hs), f0 + len(fps))
    model = [
        (src, nd, g, f, (1_000_000 * f) // g, 333333)
        for src, (nd, g, f) in sorted(per.items())
    ]
    assert got == model
    for _, _, g, f, dens, _ in got:
        # every w-window selects one min -> at least 1 fp; density <= 1
        assert 1 <= f <= g and 0 < dens <= 1_000_000
