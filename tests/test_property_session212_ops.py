"""Property-based semantics checks for the session-212 operators.

DuckDB-only (oracle SQL vs exact Python models): equi-depth selectivity
with boundary/interpolation conventions replayed, the GPD
method-of-moments pipeline, and b-bit minhash with exact bit parities.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _BBIT_PERMS, _RSH_RANGES
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=40, deadline=None)
@given(
    cents=st.lists(
        st.integers(min_value=500, max_value=10000000), min_size=1, max_size=60
    )
)
def test_equidepth_selectivity_matches_model(cents):
    con = duckdb.connect()
    con.register(
        "lineitem", pd.DataFrame({"l_extendedprice": [c / 100 for c in cents]})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["equidepth_selectivity_estimate"].sql
        ).fetchall()
    }

    s = sorted(cents)
    n = len(s)
    bounds = [s[((n - 1) * k) // 16] for k in range(17)]
    segs = [
        (k, bounds[k], bounds[k + 1])
        for k in range(16)
        if bounds[k] < bounds[k + 1]
    ]

    def g(x):
        if x <= bounds[0]:
            return 0
        if x >= bounds[16]:
            return 1000000
        for k, bk, bk1 in segs:
            if bk <= x < bk1:
                return (k * 1000000 + (1000000 * (x - bk)) // (bk1 - bk)) // 16
        raise AssertionError("uncovered point")

    model = {}
    for rid, lo, hi in _RSH_RANGES:
        exact = sum(1 for c in cents if lo <= c <= hi)
        est = n * (g(hi + 1) - g(lo)) // 1000000
        model[rid] = (exact, est, est - exact)
    assert got == model


_T0 = datetime.datetime(2025, 4, 1)


@settings(max_examples=40, deadline=None)
@given(
    cents=st.lists(
        st.integers(min_value=100, max_value=5000000), min_size=1, max_size=60
    )
)
def test_gpd_tail_fit_matches_model(cents):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_type": ["purchase"] * len(cents),
                "value": [c / 100 for c in cents],
                "ts": [_T0 + datetime.timedelta(seconds=i) for i in range(len(cents))],
            }
        ),
    )
    got = con.execute(REGISTRY["gpd_tail_fit"].sql).fetchall()
    assert len(got) == 1

    s = sorted(cents)
    n = len(s)
    x = (n - 1) * 900000
    r = x // 1000000
    v_lo, v_hi = s[r], s[min(r + 1, n - 1)]
    u = _round_away(1000000.0 * (v_lo + ((x % 1000000) / 1000000.0) * (v_hi - v_lo)))
    ys = [(1000000 * c - u) // 100000000 for c in cents if 1000000 * c > u]
    m = len(ys)
    s1, s2 = sum(ys), sum(y * y for y in ys)
    mean = _round_away(1000000 * float(s1) / max(m, 1))
    bad = m < 2 or (float(s2) * m - float(s1) * s1) <= 0
    if bad:
        xi = sig = 0
    else:
        mu = float(s1) / m
        var = (float(s2) * m - float(s1) * s1) / (float(m) * m)
        xiv = (1 - (mu * mu) / var) / 2
        xi = _round_away(1000000 * xiv)
        sig = _round_away(1000000 * mu * (1 - xiv))
    assert got[0] == (u, m, mean, xi, sig)


_WORDS = ["aa", "bb", "cc", "dd"]


def _shingles(words):
    return (
        {" ".join(words[i : i + 3]) for i in range(len(words) - 2)}
        if len(words) >= 3
        else set()
    )


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10),
        min_size=1,
        max_size=8,
    )
)
def test_bbit_minhash_matches_model(docs):
    texts = [" ".join(ws) for ws in docs]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(texts)), "text": texts, "source": "s"}
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["bbit_minhash_estimate"].sql).fetchall()
    }

    shs = [_shingles(tokenize(t)) for t in texts]
    sigs = []
    for sh in shs:
        if not sh:
            sigs.append(None)
            continue
        bits = []
        for p in range(_BBIT_PERMS):
            mn = min(hashlib.md5(f"bb:{p}:{s}".encode()).hexdigest() for s in sh)
            bits.append(int(mn[31], 16) % 2)
        sigs.append(bits)
    cells = {d: [0, 0, 0, 0] for d in range(10)}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(shs[i] & shs[j])
            if inter == 0:
                continue
            un = len(shs[i] | shs[j])
            dec = min(9, (10 * inter) // un)
            nc = sum(1 for p in range(_BBIT_PERMS) if sigs[i][p] == sigs[j][p])
            jhat = (2 * nc - _BBIT_PERMS) * (1000000 // _BBIT_PERMS)
            jex = (1000000 * inter) // un
            c = cells[dec]
            c[0] += 1
            c[1] += jhat
            c[2] += jex
            c[3] += abs(jhat - jex)

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    model = {
        d: (
            c[0],
            tdiv(c[1], max(c[0], 1)),
            tdiv(c[2], max(c[0], 1)),
            c[3] // max(c[0], 1),
        )
        for d, c in cells.items()
    }
    assert got == model
    # identical shingle sets always produce a perfect 16/16 collision
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if shs[i] and shs[i] == shs[j]:
                assert sigs[i] == sigs[j]
