"""Property-based semantics checks for the session-213 operators.

DuckDB-only (oracle SQL vs exact Python models): the two-way SS
decomposition against a brute-force residual computation, Cronbach's
alpha from the q3 item pipeline, and the best-split changepoint against
an exhaustive Welch scan.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_T0 = datetime.datetime(2025, 5, 1)
_TYPES = ["view", "click", "purchase"]


@settings(max_examples=40, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4), st.sampled_from(_TYPES)
        ),
        min_size=1,
        max_size=60,
    )
)
def test_user_type_additive_fit_matches_bruteforce(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "user_id": [u for u, _ in evs],
                "event_type": [t for _, t in evs],
                "ts": [_T0 + datetime.timedelta(seconds=i) for i in range(len(evs))],
            }
        ),
    )
    got = con.execute(REGISTRY["user_type_additive_fit"].sql).fetchall()
    assert len(got) == 1

    users = sorted({u for u, _ in evs})
    types = sorted({t for _, t in evs})
    y = {(u, t): 0 for u in users for t in types}
    for u, t in evs:
        y[(u, t)] += 1
    nu, nt = len(users), len(types)
    g = sum(y.values())
    gm = g / (nu * nt)
    rm = {u: sum(y[(u, t)] for t in types) / nt for u in users}
    cm = {t: sum(y[(u, t)] for u in users) / nu for t in types}
    ss_tot = sum((v - gm) ** 2 for v in y.values())
    ss_rows = nt * sum((rm[u] - gm) ** 2 for u in users)
    ss_cols = nu * sum((cm[t] - gm) ** 2 for t in types)
    ss_res = ss_tot - ss_rows - ss_cols
    if ss_tot <= 1e-12:
        model = (nu, nt, 0, 0, 0)
    else:
        model = (
            nu,
            nt,
            _round_away(1000000 * ss_rows / ss_tot),
            _round_away(1000000 * ss_cols / ss_tot),
            _round_away(1000000 * ss_res / ss_tot),
        )
    # brute-force float sums can sit a hair from the engines' exact-
    # integer formulation right at a .5 rounding boundary — allow +-1
    assert got[0][:2] == model[:2]
    for a, b in zip(got[0][2:], model[2:]):
        assert abs(a - b) <= 1
    # shares partition (up to rounding)
    assert abs(sum(got[0][2:]) - (0 if model[2:] == (0, 0, 0) else 1000000)) <= 2


_WORDS = ["aa", "bb", "cc", "dd"]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
        min_size=1,
        max_size=15,
    )
)
def test_cronbach_alpha_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["quality_cronbach_alpha"].sql).fetchall()
    assert len(got) == 1

    items = []
    for ws in docs:
        ts = tokenize(" ".join(ws))
        tf = {}
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
        nd, nt_ = len(tf), len(ts)
        i1 = (1000 * nd) // nt_
        i2 = (1000 * sum(1 for v in tf.values() if v == 1)) // nd
        i3 = 1000 - (1000 * max(tf.values())) // nt_
        items.append((i1, i2, i3))
    n = len(items)
    s = [sum(it[k] for it in items) for k in range(3)]
    q = [sum(it[k] * it[k] for it in items) for k in range(3)]
    stt = sum(sum(it) for it in items)
    qtt = sum(sum(it) ** 2 for it in items)
    if n < 2 or float(qtt) * n == float(stt) * stt:
        alpha = 0
    else:
        num = sum(float(q[k]) * n - float(s[k]) * s[k] for k in range(3))
        den = float(qtt) * n - float(stt) * stt
        alpha = _round_away(1000000 * (3.0 / 2) * (1 - num / den))
    assert got[0] == (n, alpha)


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(st.integers(min_value=0, max_value=20), min_size=4, max_size=60)
)
def test_best_split_matches_exhaustive(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"ts": [_T0 + datetime.timedelta(days=d) for d in days]}),
    )
    got = con.execute(REGISTRY["best_split_changepoint"].sql).fetchall()

    lo, hi = min(days), max(days)
    counts = [sum(1 for d in days if d == x) for x in range(lo, hi + 1)]
    base = int(_T0.timestamp()) // 86400
    cands = []
    for i in range(len(counts)):
        na, nb = i + 1, len(counts) - i - 1
        if na < 2 or nb < 2:
            continue
        a, b2 = counts[: i + 1], counts[i + 1 :]
        sa, sb = sum(a), sum(b2)
        ssa, ssb = sum(x * x for x in a), sum(x * x for x in b2)
        if na * ssa == sa * sa and nb * ssb == sb * sb:
            t2 = 0
        else:
            num = (sa / na - sb / nb) ** 2
            den = (na * ssa - sa * sa) / (na * na * (na - 1)) + (
                nb * ssb - sb * sb
            ) / (nb * nb * (nb - 1))
            t2 = _round_away(1000000 * num / den)
        cands.append((t2, -(base + lo + i), na, nb, sa, sb))
    if not cands:
        assert got == [] or got[0][0] is None
        return
    t2, nd, na, nb, sa, sb = max(cands)
    model = (
        -nd,
        na,
        nb,
        (1000000 * sa) // na,
        (1000000 * sb) // nb,
        t2,
    )
    assert got == [model]
