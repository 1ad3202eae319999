"""Property-based semantics checks for the session-218 operators.

DuckDB-only (oracle SQL vs exact Python models): drawdown against a
sequential replay, the A/A pooled z² pipeline, and the random-baseline
metrics vs a hash-ranked model.
"""

from __future__ import annotations

import datetime
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


_T0 = datetime.datetime(2025, 9, 1)


@settings(max_examples=40, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),
            st.sampled_from(["purchase", "view"]),
            st.integers(min_value=0, max_value=50000),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_revenue_drawdown_matches_replay(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "ts": [_T0 + datetime.timedelta(days=d) for d, _, _ in evs],
                "event_type": [t for _, t, _ in evs],
                "value": [c / 100 for _, _, c in evs],
            }
        ),
    )
    got = con.execute(REGISTRY["revenue_drawdown"].sql).fetchall()
    assert len(got) == 1

    base = int(_T0.timestamp()) // 86400
    lo = min(d for d, _, _ in evs)
    hi = max(d for d, _, _ in evs)
    daily = {x: 0 for x in range(lo, hi + 1)}
    for d, t, c in evs:
        if t == "purchase":
            daily[d] += _round_away(c / 100 * 100)
    peak, best = 0, None
    for x in range(lo, hi + 1):
        peak = max(peak, daily[x])
        dd = (1000000 * (peak - daily[x])) // max(peak, 1)
        cand = (dd, -(base + x), daily[x], peak)
        if best is None or cand > best:
            best = cand
    model = (hi - lo + 1, -best[1], best[2], best[3], best[0])
    assert got[0] == model


@settings(max_examples=40, deadline=None)
@given(
    users=st.lists(
        st.tuples(st.integers(min_value=0, max_value=4000), st.booleans()),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_aa_test_readout_matches_model(users):
    rows = []
    for uid, conv in users:
        rows.append((uid, "view"))
        if conv:
            rows.append((uid, "purchase"))
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [u for u, _ in rows],
                "event_type": [t for _, t in rows],
                "ts": [_T0 + datetime.timedelta(seconds=i) for i in range(len(rows))],
            }
        ),
    )
    got = con.execute(REGISTRY["aa_test_readout"].sql).fetchall()
    assert len(got) == 1

    n = [0, 0]
    c = [0, 0]
    for uid, conv in users:
        arm = int(hashlib.md5(f"aa:{uid}".encode()).hexdigest()[:4], 16) % 2
        n[arm] += 1
        c[arm] += 1 if conv else 0
    n0, c0, n1, c1 = n[0], c[0], n[1], c[1]
    if n0 == 0 or n1 == 0 or c0 + c1 == 0 or c0 + c1 == n0 + n1:
        z2 = 0
    else:
        p0, p1 = c0 / n0, c1 / n1
        pp = (c0 + c1) / (n0 + n1)
        z2 = _round_away(
            1000000 * ((p0 - p1) ** 2) / (pp * (1 - pp) * (1 / n0 + 1 / n1))
        )
    assert got[0] == (n0, c0, n1, c1, z2)


_VOCAB = ["dup", "spark", "alpha", "beta"]


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=8),
        min_size=1,
        max_size=15,
    )
)
def test_random_baseline_eval_random_leg_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["random_baseline_eval"].sql).fetchall()
    assert len(got) == 1
    bm25_p10, random_p10, lift, bm25_mrr, random_mrr = got[0]

    rel = {
        i for i, ws in enumerate(docs) if "dup" in tokenize(" ".join(ws))
    }
    ranked = sorted(
        range(len(docs)),
        key=lambda i: (hashlib.md5(f"rb:{i}".encode()).hexdigest(), i),
    )[:10]
    rp10 = sum(1 for d in ranked if d in rel)
    rmrr = 0
    for rk, d in enumerate(ranked, start=1):
        if d in rel:
            rmrr = 2520 // rk
            break
    assert (random_p10, random_mrr) == (rp10, rmrr)
    assert lift == bm25_p10 - random_p10
    assert 0 <= bm25_p10 <= 10 and 0 <= bm25_mrr <= 2520
