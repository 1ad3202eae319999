"""Property-based semantics checks for the session-199 operators.

DuckDB-only (oracle SQL vs exact Python models).
lfu_cache_hit_curve: exact LFU hit mass replayed against a brute-force
sorted-by-frequency model; kmins_user_estimate: exact hash/register
model incl. the under-fill fallback; sampling_weight_ess: the q3 weight
pipeline with the ESS float expressions mirrored in identical order.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=120)
)
def test_lfu_cache_hit_curve_matches_bruteforce(keys):
    con = duckdb.connect()
    con.register("lineitem", pd.DataFrame({"l_partkey": keys}))
    got = con.execute(REGISTRY["lfu_cache_hit_curve"].sql).fetchall()

    freq = {}
    for k in keys:
        freq[k] = freq.get(k, 0) + 1
    # brute force: any LFU cache keeps the s highest-frequency keys; mass
    # is choice-free because boundary ties share one frequency
    fs = sorted(freq.values(), reverse=True)
    total = sum(fs)
    model = []
    for s in (16, 64, 256, 1024):
        hit = sum(fs[:s])
        model.append((s, hit, total, (1000000 * hit) // max(total, 1)))
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    users=st.lists(st.integers(min_value=0, max_value=5000), min_size=0, max_size=200)
)
def test_kmins_estimate_matches_model(users):
    con = duckdb.connect()
    if users:
        con.register(
            "events", pd.DataFrame({"user_id": users})
        )
    else:
        con.register(
            "events", pd.DataFrame({"user_id": pd.Series([], dtype="int64")})
        )
    got = con.execute(REGISTRY["kmins_user_estimate"].sql).fetchall()
    assert len(got) == 1

    regs = {}
    for u in set(users):
        h = int(hashlib.md5(f"km:{u}".encode()).hexdigest()[:13], 16)
        reg, v = h % 32, h // 32
        regs[reg] = min(regs.get(reg, v), v)
    n_users, n_filled = len(set(users)), len(regs)
    sv = sum(regs.values())
    if n_filled < 32:
        est = n_users
    else:
        est = _round_away(float(32 * 31 * (1 << 47)) / float(max(sv, 1)))
    err = (1000000 * abs(est - n_users)) // max(n_users, 1)
    assert got[0] == (n_users, n_filled, est, err)


_WORDS = ["alpha", "beta", "gamma", "delta", "spark"]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30),
        min_size=1,
        max_size=25,
    )
)
def test_sampling_weight_ess_matches_model(docs):
    texts = [" ".join(ws) for ws in docs]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"text": texts}))
    got = con.execute(REGISTRY["sampling_weight_ess"].sql).fetchall()
    assert len(got) == 1

    w3s = []
    for t in texts:
        n = len(tokenize(t))
        w3s.append(_round_away(1000000 * math.pow(n, 0.7)) // 1000)
    n_docs = len(w3s)
    s1, s2, mx = sum(w3s), sum(w * w for w in w3s), max(w3s) if w3s else 0
    if s2 == 0:
        ess_docs, ess_ratio = 0, 0
    else:
        ess_docs = _round_away((float(s1) * s1) / s2)
        ess_ratio = _round_away(1000000 * (float(s1) * s1) / (float(n_docs) * s2))
    max_share = (1000000 * mx) // max(s1, 1)
    assert got[0] == (n_docs, ess_docs, ess_ratio, max_share)
    # ESS is bounded by n and equals n exactly when all weights are equal
    if w3s and len(set(w3s)) == 1 and w3s[0] > 0:
        assert got[0][1] == n_docs and got[0][2] == 1000000
