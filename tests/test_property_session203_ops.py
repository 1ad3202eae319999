"""Property-based semantics checks for the session-203 operators.

DuckDB-only. user_count_nb_fit and fd_binwidth_advisor run against exact
Python models; rank_biased_overlap (whose legs are two full float
retrieval models — cross-engine value equality is the contract test's
job) is checked for its exact structural invariants: depth-monotone
overlap, internal consistency of every derived column against x_d, and
the folded weight table.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY, _RBO_W


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_WORDS = ["spark", "dup", "alpha", "beta", "gamma"]


@settings(max_examples=15, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
        min_size=1,
        max_size=15,
    )
)
def test_rank_biased_overlap_invariants(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["rank_biased_overlap"].sql).fetchall()
    assert [r[0] for r in got] == list(range(1, 11))
    xs = [r[1] for r in got]
    # overlap-at-depth is nondecreasing, bounded by d, steps by <= 2
    # (each depth admits at most one new doc per ranking)
    prev = 0
    cum = 0
    for d, (depth, x_d, agree, w, rbo) in enumerate(got, start=1):
        assert 0 <= x_d <= d
        assert x_d >= prev and x_d - prev <= 2
        assert agree == (1000000 * x_d) // d
        assert w == _RBO_W[d - 1]
        cum += w * x_d
        assert rbo == cum // 1000
        prev = x_d
    # RBO@10 is bounded by the truncated weight mass (agreement == 1)
    assert got[-1][4] <= sum(_RBO_W) * 10 // 1000


_T0 = datetime.datetime(2024, 9, 1)


@settings(max_examples=40, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=25)
)
def test_user_count_nb_fit_matches_model(counts):
    rows = []
    for uid, c in enumerate(counts):
        for k in range(c):
            rows.append((uid, k))
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [u for u, _ in rows],
                "ts": [_T0 + datetime.timedelta(seconds=k) for _, k in rows],
            }
        ),
    )
    got = con.execute(REGISTRY["user_count_nb_fit"].sql).fetchall()
    assert len(got) == 1

    n = len(counts)
    s1 = sum(counts)
    s2 = sum(c * c for c in counts)
    mu = float(s1) / n
    var = (float(s2) * n - float(s1) * s1) / (float(n) * n)
    over = 1 if float(n) * s2 > float(s1) * s1 + float(n) * s1 else 0
    if over:
        r = _round_away(1000000 * (mu * mu) / (var - mu))
        p = _round_away(1000000 * mu / var)
    else:
        r = p = 0
    assert got[0] == (
        n,
        _round_away(1000000 * mu),
        _round_away(1000000 * var),
        over,
        r,
        p,
    )


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60)
)
def test_fd_binwidth_advisor_matches_model(vals):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"n_chars": vals}))
    got = con.execute(REGISTRY["fd_binwidth_advisor"].sql).fetchall()
    assert len(got) == 1

    s = sorted(vals)
    n, mn, mx = len(s), min(s), max(s)

    def q(p_q6):
        x = (n - 1) * p_q6
        r = x // 1000000
        v_lo, v_hi = s[r], s[min(r + 1, n - 1)]
        return _round_away(
            1000000.0 * (v_lo + ((x % 1000000) / 1000000.0) * (v_hi - v_lo))
        )

    iqr = q(750000) - q(250000)
    w = _round_away(2.0 * iqr / math.cbrt(float(n)))
    if w >= 1:
        nb = (1000000 * (mx - mn) + w - 1) // w
    else:
        nb = -1
    fixed = (1000000 * (mx - mn + 1)) // 32
    assert got[0] == (n, iqr, w, nb, fixed)
