"""Property-based semantics checks for the session-209 operators.

DuckDB-only (oracle SQL vs exact Python models): Hare-apportioned Neyman
allocation (slots sum EXACTLY to the budget), Madow systematic PPS
(coverage + multiplicity invariants vs a brute-force model), and the
three-scale Fano factor.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _NEYMAN_BUDGET,
    _PPS_STRIDES,
)
from docix_spark.analysis.tokenizer import tokenize


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_WORDS = ["aa", "bb", "cc"]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "wiki", "books"]),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_neyman_allocation_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "source": [s for s, _ in docs],
                "text": [" ".join(_WORDS[i % 3] for i in range(k)) for _, k in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["neyman_allocation"].sql).fetchall()
    }

    strata = {}
    for (s, _), (_, text) in zip(docs, (
        (None, " ".join(_WORDS[i % 3] for i in range(k))) for _, k in docs
    )):
        x = len(tokenize(text))
        st_ = strata.setdefault(s, [0, 0, 0])
        st_[0] += 1
        st_[1] += x
        st_[2] += x * x
    w0, sd = {}, {}
    for s, (n, s1, s2) in strata.items():
        var = max((float(s2) * n - float(s1) * s1) / (float(n) * n), 0.0)
        sd[s] = _round_away(1000000 * math.sqrt(var))
        w0[s] = _round_away(float(n) * math.sqrt(var))
    tw = sum(w0.values())
    base, rem = {}, {}
    for s in strata:
        base[s] = (_NEYMAN_BUDGET * w0[s]) // tw if tw else 0
        rem[s] = (_NEYMAN_BUDGET * w0[s]) % tw if tw else 0
    k = _NEYMAN_BUDGET - sum(base.values()) if tw else 0
    order = sorted(strata, key=lambda s: (-rem[s], s))
    alloc = dict(base)
    for i, s in enumerate(order, start=1):
        if i <= k:
            alloc[s] += 1
    model = {
        s: (strata[s][0], sd[s], w0[s], alloc[s]) for s in strata
    }
    assert got == model
    if tw:
        assert sum(a[3] for a in got.values()) == _NEYMAN_BUDGET


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["web", "wiki"]),
            st.integers(min_value=0, max_value=15),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_systematic_pps_matches_bruteforce(docs):
    texts = [" ".join(_WORDS[i % 3] for i in range(k)) for _, k in docs]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": texts,
            }
        ),
    )
    got = con.execute(REGISTRY["systematic_pps_sample"].sql).fetchall()

    per_source = {}
    for i, ((s, _), t) in enumerate(zip(docs, texts)):
        per_source.setdefault(s, []).append((i, len(tokenize(t))))
    model = []
    for s in sorted(per_source):
        rows = sorted(per_source[s])
        wtot = sum(n for _, n in rows)
        cum = 0
        spans = []
        for i, n in rows:
            spans.append((i, n, cum))
            cum += n
        for k in range(_PPS_STRIDES):
            for i, n, cb in spans:
                if (
                    2 * _PPS_STRIDES * cb < (2 * k + 1) * wtot
                    and (2 * k + 1) * wtot <= 2 * _PPS_STRIDES * (cb + n)
                ):
                    model.append((s, k, i, n))
    assert sorted(got) == sorted(model)
    # every source with tokens yields exactly one pick per stride
    for s, rows in per_source.items():
        if sum(n for _, n in rows) > 0:
            ks = [r[1] for r in got if r[0] == s]
            assert sorted(ks) == list(range(_PPS_STRIDES))


_T0 = datetime.datetime(2025, 2, 1)


@settings(max_examples=30, deadline=None)
@given(
    mins=st.lists(
        st.integers(min_value=0, max_value=4000), min_size=1, max_size=60
    )
)
def test_fano_factor_scales_matches_model(mins):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"ts": [_T0 + datetime.timedelta(minutes=m) for m in mins]}),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["fano_factor_scales"].sql).fetchall()
    }

    base_us = int(_T0.timestamp()) * 1000000
    model = {}
    for name, width in [
        ("a_minute", 60000000),
        ("b_hour", 3600000000),
        ("c_day", 86400000000),
    ]:
        ivs = [(base_us + m * 60000000) // width for m in mins]
        lo, hi = min(ivs), max(ivs)
        counts = [ivs.count(x) for x in range(lo, hi + 1)]
        ni = len(counts)
        s1 = sum(counts)
        s2 = sum(c * c for c in counts)
        mean = _round_away(1000000 * float(s1) / ni)
        var = (float(s2) * ni - float(s1) * s1) / (float(ni) * ni)
        fano = 0 if s1 == 0 else _round_away(1000000 * var / (float(s1) / ni))
        model[name] = (ni, mean, fano)
    assert got == model
