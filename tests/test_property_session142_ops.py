"""Property-based semantics checks for the session-142 operators.

Models: nation balance rollup (zero-filled spine), ship-span banding,
and the component histogram with float32 round-trip. DuckDB-only.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_bal = st.integers(min_value=-4000, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    custs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), _bal),
        min_size=0,
        max_size=15,
    ),
    supps=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), _bal),
        min_size=0,
        max_size=10,
    ),
)
def test_nation_balances_match_model(custs, supps):
    con = duckdb.connect()
    con.register(
        "nation",
        pd.DataFrame(
            {"n_nationkey": range(4), "n_name": ["NA", "NB", "NC", "ND"]}
        ),
    )
    con.register(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": range(len(custs)),
                "c_nationkey": [n for n, _ in custs],
                "c_acctbal": [b for _, b in custs],
            }
        )
        if custs
        else pd.DataFrame(
            {"c_custkey": [0], "c_nationkey": [99], "c_acctbal": [0.0]}
        ),
    )
    con.register(
        "supplier",
        pd.DataFrame(
            {
                "s_suppkey": range(len(supps)),
                "s_nationkey": [n for n, _ in supps],
                "s_acctbal": [b for _, b in supps],
            }
        )
        if supps
        else pd.DataFrame(
            {"s_suppkey": [0], "s_nationkey": [99], "s_acctbal": [0.0]}
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["nation_account_balances"].sql
        ).fetchall()
    }
    names = ["NA", "NB", "NC", "ND"]
    model = {}
    for i, nm in enumerate(names):
        cs = [b for n, b in custs if n == i]
        ss = [b for n, b in supps if n == i]
        model[nm] = (
            len(cs),
            sum(_round_away(b * 100) for b in cs),
            len(ss),
            sum(_round_away(b * 100) for b in ss),
        )
    assert got == model


_DT0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=200),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_ship_span_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_shipdate": [
                    _DT0 + datetime.timedelta(days=d) for _, d in li
                ],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["order_ship_span_histogram"].sql
        ).fetchall()
    }
    per: dict[int, list[int]] = {}
    for o, d in li:
        per.setdefault(o, []).append(d)
    model: dict[int, list[int]] = {}
    for ds in per.values():
        span = max(ds) - min(ds)
        b = 0 if span == 0 else 1 if span <= 7 else 2 if span <= 30 else 3 if span <= 90 else 4
        cell = model.setdefault(b, [0, 0])
        cell[0] += 1
        cell[1] += len(ds)
    assert got == {k: tuple(v) for k, v in model.items()}


_comp = st.integers(min_value=-64, max_value=64).map(lambda k: k / 64)


@settings(max_examples=30, deadline=None)
@given(
    vecs=st.lists(
        st.lists(_comp, min_size=4, max_size=4), min_size=1, max_size=12
    )
)
def test_component_histogram_matches_model(vecs):
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [
                    np.asarray(v, dtype=np.float32) for v in vecs
                ],
            }
        ),
    )
    got = dict(
        con.execute(
            REGISTRY["embedding_component_histogram"].sql
        ).fetchall()
    )
    hist: dict[int, int] = {}
    for v in vecs:
        for x in v:
            b = _round_away(float(np.float32(x)) * 100)
            hist[b] = hist.get(b, 0) + 1
    assert got == hist
