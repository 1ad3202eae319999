"""Property-based semantics checks for the session-45 operators.

Models: the decomposed Dirichlet QL score in Python (±3 q6 float tolerance,
exact match counts — the cross_fields convention; empty docs carry no dl
row and drop on both sides), dyadic-cents profit for the Q9 adaptation,
and exact integer models for the Q20 excess-share and Q21 sole-supplier
screens. DuckDB-only — ms per example.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import _QL_MU, REGISTRY

_WORDS = ["spark", "hash", "join", "scan", "the"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20)
_corpus = st.lists(_doc, min_size=1, max_size=10)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


def _con(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(d) for d in docs],
                "source": ["s"] * len(docs),
            }
        ),
    )
    return con


# ---------------------------------------------------------------------------
# dirichlet_ql_search — decomposed QL model; unmatched docs rank by prior
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_dirichlet_ql_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["dirichlet_ql_search"].sql).fetchall()
    nonempty = {i: Counter(d) for i, d in enumerate(docs) if d}
    big_t = sum(len(d) for d in docs)
    cf = Counter(t for d in docs for t in d if t in ("spark", "hash", "join"))
    scores: dict[int, tuple[float, int]] = {}
    for i, c in nonempty.items():
        ms, nm = 0.0, 0
        for t in ("spark", "hash", "join"):
            if c.get(t):
                ms += math.log(1.0 + (c[t] * big_t) / (_QL_MU * cf[t]))
                nm += 1
        score = ms + 3 * math.log(_QL_MU / (len(docs[i]) + _QL_MU))
        scores[i] = (score, nm)
    assert len(got) == min(10, len(scores))
    for doc_id, score_q6, nm, rank in got:
        ms, mnm = scores[doc_id]
        assert nm == mnm
        assert abs(score_q6 - _round_away(1_000_000 * ms)) <= 3
    keys = [(-s, d) for d, s, _, _ in got]
    assert keys == sorted(keys)
    # NOTE: the decomposed rank-equivalent score drops the constant
    # Σ ln p(w|C), so unlike a true log-likelihood it CAN be positive —
    # only ordering and the per-doc value (vs the model) are meaningful.


# ---------------------------------------------------------------------------
# product_profit_by_nation_year — dyadic-cents profit model
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # partkey
            st.integers(min_value=0, max_value=3),  # suppkey
            st.integers(min_value=0, max_value=7),  # orderkey
            st.sampled_from([1.0, 2.5, 10.0]),  # quantity (dyadic)
            st.integers(min_value=0, max_value=400),  # extendedprice
        ),
        min_size=0,
        max_size=20,
    ),
    retail=st.lists(st.integers(min_value=1, max_value=90), min_size=4, max_size=4),
    supp_nat=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
    years=st.lists(st.integers(min_value=1995, max_value=1997), min_size=8, max_size=8),
)
def test_product_profit_matches_model(li, retail, supp_nat, years):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": pd.Series([r[0] for r in li], dtype="int64"),
                "l_suppkey": pd.Series([r[1] for r in li], dtype="int64"),
                "l_orderkey": pd.Series([r[2] for r in li], dtype="int64"),
                "l_quantity": pd.Series([r[3] for r in li], dtype="float64"),
                "l_extendedprice": pd.Series([float(r[4]) for r in li], dtype="float64"),
                "l_discount": pd.Series([0.0] * len(li), dtype="float64"),
            }
        ),
    )
    con.register(
        "part",
        pd.DataFrame(
            {"p_partkey": range(4), "p_retailprice": pd.Series([float(r) for r in retail], dtype="float64")}
        ),
    )
    con.register(
        "supplier",
        pd.DataFrame({"s_suppkey": range(4), "s_nationkey": pd.Series(supp_nat, dtype="int64")}),
    )
    con.register(
        "nation",
        pd.DataFrame({"n_nationkey": [0, 1, 2], "n_name": ["N_A", "N_B", "N_C"]}),
    )
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(8),
                "o_orderdate": pd.to_datetime([f"{y}-05-05" for y in years]),
            }
        ),
    )
    got = con.execute(REGISTRY["product_profit_by_nation_year"].sql).fetchall()
    agg: dict[tuple, int] = {}
    names = {0: "N_A", 1: "N_B", 2: "N_C"}
    for pk, sk, ok, q, ep in li:
        profit = 100 * ep - _round_away(60 * q * float(retail[pk]))
        k = (names[supp_nat[sk]], years[ok])
        agg[k] = agg.get(k, 0) + profit
    assert got == [(n, y, p) for (n, y), p in sorted(agg.items())]


# ---------------------------------------------------------------------------
# excess_share_suppliers — 50%-of-part-total screen
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # partkey
            st.integers(min_value=0, max_value=3),  # suppkey
            st.sampled_from([1.0, 2.0, 10.5]),  # quantity
        ),
        min_size=1,
        max_size=20,
    )
)
def test_excess_share_suppliers_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": pd.Series([r[0] for r in li], dtype="int64"),
                "l_suppkey": pd.Series([r[1] for r in li], dtype="int64"),
                "l_quantity": pd.Series([r[2] for r in li], dtype="float64"),
            }
        ),
    )
    got = con.execute(REGISTRY["excess_share_suppliers"].sql).fetchall()
    sq: dict[tuple, int] = {}
    for pk, sk, q in li:
        sq[(pk, sk)] = sq.get((pk, sk), 0) + _round_away(100 * q)
    pt: dict[int, int] = {}
    for (pk, _), v in sq.items():
        pt[pk] = pt.get(pk, 0) + v
    dom = Counter(sk for (pk, sk), v in sq.items() if 2 * v > pt[pk])
    model = sorted(dom.items(), key=lambda r: (-r[1], r[0]))
    assert got == model[:20]
    # a part has at most one >50% owner
    owners: dict[int, int] = {}
    for (pk, sk), v in sq.items():
        if 2 * v > pt[pk]:
            owners[pk] = owners.get(pk, 0) + 1
    assert all(v == 1 for v in owners.values())


# ---------------------------------------------------------------------------
# sole_supplier_orders — n_items ≥ 2 ∧ one distinct supplier
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.integers(min_value=0, max_value=3)),
        min_size=1,
        max_size=20,
    )
)
def test_sole_supplier_orders_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": pd.Series([r[0] for r in li], dtype="int64"),
                "l_suppkey": pd.Series([r[1] for r in li], dtype="int64"),
            }
        ),
    )
    got = con.execute(REGISTRY["sole_supplier_orders"].sql).fetchall()
    orders: dict[int, list[int]] = {}
    for ok, sk in li:
        orders.setdefault(ok, []).append(sk)
    sole = Counter(
        sks[0] for sks in orders.values() if len(sks) >= 2 and len(set(sks)) == 1
    )
    model = sorted(sole.items(), key=lambda r: (-r[1], r[0]))
    assert got == model[:20]
