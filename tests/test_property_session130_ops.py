"""Property-based semantics checks for the session-130 operators.

Models: round-number bias, query-term PMI and key density against
direct computation. DuckDB-only.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_price = st.one_of(
    st.integers(min_value=1, max_value=400),  # whole dollars
    st.integers(min_value=1, max_value=40000).map(lambda k: k / 4),
)


@settings(max_examples=40, deadline=None)
@given(prices=st.lists(_price, min_size=1, max_size=30))
def test_round_bias_matches_model(prices):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {"o_orderkey": range(len(prices)), "o_totalprice": [float(p) for p in prices]}
        ),
    )
    n, wd, wh, share = con.execute(
        REGISTRY["round_value_bias"].sql
    ).fetchall()[0]
    cents = [_round_away(float(p) * 100) for p in prices]
    ewd = sum(1 for c in cents if c % 100 == 0)
    ewh = sum(1 for c in cents if c % 10000 == 0)
    assert (n, wd, wh) == (len(cents), ewd, ewh)
    assert share == (1_000_000 * ewd) // len(cents)


_W = ["dup", "spark", "zz"]
_text = st.lists(st.sampled_from(_W), min_size=1, max_size=6).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(docs=st.lists(_text, min_size=1, max_size=12))
def test_query_pmi_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    da, db, dab, n, pmi = con.execute(
        REGISTRY["query_term_pmi"].sql
    ).fetchall()[0]
    sets = [set(t.split()) for t in docs]
    eda = sum(1 for s in sets if "dup" in s)
    edb = sum(1 for s in sets if "spark" in s)
    edab = sum(1 for s in sets if "dup" in s and "spark" in s)
    assert (da, db, dab, n) == (eda, edb, edab, len(docs))
    if edab == 0 or eda == 0 or edb == 0:
        assert pmi == 0
    else:
        assert pmi == _round_away(
            1_000_000 * math.log((float(edab) * len(docs)) / (float(eda) * edb))
        )


@settings(max_examples=40, deadline=None)
@given(
    ck=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=15, unique=True),
    ok=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=15, unique=True),
)
def test_key_density_matches_model(ck, ok):
    con = duckdb.connect()
    con.register("customer", pd.DataFrame({"c_custkey": ck}))
    con.register("orders", pd.DataFrame({"o_orderkey": ok}))
    con.register("part", pd.DataFrame({"p_partkey": range(5)}))
    con.register("supplier", pd.DataFrame({"s_suppkey": range(3)}))
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["key_density_census"].sql).fetchall()
    }

    def leg(keys):
        span = max(keys) - min(keys) + 1
        return (
            len(keys),
            min(keys),
            max(keys),
            (1_000_000 * len(keys)) // max(span, 1),
        )

    assert got == {
        "customer.c_custkey": leg(ck),
        "orders.o_orderkey": leg(ok),
        "part.p_partkey": leg(list(range(5))),
        "supplier.s_suppkey": leg(list(range(3))),
    }
