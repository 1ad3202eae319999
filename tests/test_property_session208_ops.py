"""Property-based semantics checks for the session-208 operators.

DuckDB-only (oracle SQL vs exact Python models): Good-Turing adjusted
counts from a brute-force count-of-counts, the conformal interval's
quantile + coverage, and the k-anonymity class census.
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


_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=15),
        min_size=1,
        max_size=15,
    )
)
def test_good_turing_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(docs)), "text": [" ".join(ws) for ws in docs]}
        ),
    )
    got = con.execute(REGISTRY["good_turing_counts"].sql).fetchall()

    cf = {}
    for ws in docs:
        for t in tokenize(" ".join(ws)):
            cf[t] = cf.get(t, 0) + 1
    nr = {}
    for r in cf.values():
        nr[r] = nr.get(r, 0) + 1
    n_tokens = sum(cf.values())
    n1 = nr.get(1, 0)
    p0 = (1000000 * n1) // max(n_tokens, 1)
    model = []
    for r in range(1, 9):
        a, b = nr.get(r, 0), nr.get(r + 1, 0)
        rs = 0 if a == 0 else _round_away(1000000 * float((r + 1) * b) / a)
        model.append((r, a, b, rs, p0))
    assert got == model


_T0 = datetime.datetime(2025, 1, 6)  # a Monday


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60)
)
def test_conformal_interval_matches_model(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"ts": [_T0 + datetime.timedelta(days=d) for d in days]}),
    )
    got = con.execute(REGISTRY["conformal_daily_interval"].sql).fetchall()
    assert len(got) == 1

    base = int(_T0.timestamp()) // 86400
    lo, hi = min(days), max(days)
    counts = {x: 0 for x in range(lo, hi + 1)}
    for d in days:
        counts[d] += 1
    cells = [(base + x, c) for x, c in sorted(counts.items())]
    by_dow = {}
    for dn, c in cells:
        by_dow.setdefault((dn + 3) % 7, []).append(c)
    means = {
        dow: (1000000 * sum(cs)) // len(cs) for dow, cs in by_dow.items()
    }
    ars = sorted(
        abs(1000000 * c - means[(dn + 3) % 7]) for dn, c in cells
    )
    n = len(ars)
    x = (n - 1) * 900000
    r = x // 1000000
    v_lo, v_hi = ars[r], ars[min(r + 1, n - 1)]
    q90 = _round_away(v_lo + ((x % 1000000) / 1000000.0) * (v_hi - v_lo))
    covered = sum(1 for a in ars if a <= q90)
    assert got[0] == (n, q90, covered, (1000000 * covered) // max(n, 1))
    # conformal guarantee direction: coverage at least ~90% in-sample
    assert covered >= math.floor(0.9 * n)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "wiki"]),
            st.sampled_from(["en", "fr"]),
            st.integers(min_value=1, max_value=300),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_k_anonymity_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "source": [s for s, _, _ in docs],
                "lang": [l for _, l, _ in docs],
                "n_chars": [n for _, _, n in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["k_anonymity_census"].sql).fetchall()
    }

    cls = {}
    for s, l, n in docs:
        lb = min(15, max(n, 1).bit_length() - 1)
        cls[(s, l, lb)] = cls.get((s, l, lb), 0) + 1
    n = len(docs)
    model = {}
    for k in (2, 5, 10):
        viol = sum(sz for sz in cls.values() if sz < k)
        model[k] = (len(cls), min(cls.values()), viol, (1000000 * viol) // max(n, 1))
    assert got == model
