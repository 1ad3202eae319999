"""Property-based semantics checks for the session-182 operators."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_word = st.sampled_from(["a", "b", "c", "d", "e"])


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=1, max_size=10), min_size=1, max_size=15
    )
)
def test_quality_gate_kappa_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(ws) for ws in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["quality_gate_kappa"].sql).fetchall()[0]

    per = [(len(ws), len(set(ws))) for ws in docs]
    st_ = sum(t for _, t in per)
    sn = sum(n for n, _ in per)
    nd = len(per)
    a = b = c = d = 0
    for n_tok, n_terms in per:
        hi_ttr = n_terms * sn >= n_tok * st_
        hi_len = n_tok * nd >= sn
        if hi_ttr and hi_len:
            a += 1
        elif hi_ttr:
            b += 1
        elif hi_len:
            c += 1
        else:
            d += 1
    n = nd
    pe_num = float(a + b) * (a + c) + float(c + d) * (b + d)
    denom = float(n) * n - pe_num
    if n == 0 or denom == 0:
        kappa = 0
    else:
        kappa = _round_away(1000000 * ((float(a + d) * n - pe_num) / denom))
    assert got == (a, b, c, d, n, kappa)


@settings(max_examples=30, deadline=None)
@given(
    bals=st.lists(
        st.integers(min_value=-4000, max_value=40000).map(lambda k: k / 4),
        min_size=1,
        max_size=12,
    ),
    active=st.sets(st.integers(min_value=0, max_value=15)),
)
def test_supplier_coverage_matches_model(bals, active):
    con = duckdb.connect()
    con.register(
        "supplier",
        pd.DataFrame(
            {"s_suppkey": range(len(bals)), "s_acctbal": bals}
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame({"l_suppkey": sorted(active) or [10**9]}),
    )
    got = con.execute(REGISTRY["supplier_sales_coverage"].sql).fetchall()[0]

    act = set(active) if active else {10**9}
    n_act = len(act)
    idle = sum(
        _round_away(b * 100)
        for i, b in enumerate(bals)
        if i not in act
    )
    assert got == (
        len(bals),
        n_act,
        (1000000 * n_act) // len(bals),
        idle,
    )
