"""Property-based semantics checks for the session-42 operators.

Models: a per-field-df summed BM25 for most_fields (±3 q6 tolerance on the
float score, exact on match counts and ordering — the session-12
cross_fields convention), an exact positional-exclusion model for span_not,
dyadic-cents models for the Q19 disjunction and Q2 argmin, a bilateral
flow-matrix model for Q7, and a relative-threshold screen for Q11.
DuckDB-only — ms per example.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import (
    REGISTRY,
    _Q7_NATION_A,
    _Q7_NATION_B,
    _SPAN_NOT_W,
)


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_WORDS = ["spark", "hash", "join", "scan", "the"]
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20)
_corpus = st.lists(_doc, min_size=1, max_size=10)


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
# most_fields_search — per-field-df summed BM25 model
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_most_fields_matches_summed_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["most_fields_search"].sql).fetchall()
    fields = {}
    for i, toks in enumerate(docs):
        if toks[:8]:
            fields[(i, "title")] = Counter(toks[:8])
        if toks[8:]:
            fields[(i, "body")] = Counter(toks[8:])
    if not fields:
        assert got == []
        return
    n_docs = float(len({d for d, _ in fields}))
    dls = {k: sum(c.values()) for k, c in fields.items()}
    avgdl = {
        f: sum(v for (d, ff), v in dls.items() if ff == f)
        / sum(1 for (_, ff) in dls if ff == f)
        for f in {ff for _, ff in fields}
    }
    df = Counter()
    for (_, f), c in fields.items():
        for t in c:
            df[(f, t)] += 1
    scores: dict[int, tuple[float, int]] = {}
    for d in {d for d, _ in fields}:
        s_doc, nm = 0.0, 0
        for t in ["spark", "hash", "join"]:
            for f in ("title", "body"):
                c = fields.get((d, f))
                if not c or t not in c:
                    continue
                tf = float(c[t])
                idf = math.log(1.0 + (n_docs - df[(f, t)] + 0.5) / (df[(f, t)] + 0.5))
                s_doc += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[(d, f)] / avgdl[f]))
                nm += 1
        if nm:
            scores[d] = (s_doc, nm)
    assert len(got) == min(10, len(scores))
    for doc_id, score_q6, nm, rank in got:
        ms, mnm = scores[doc_id]
        assert nm == mnm
        assert abs(score_q6 - round(ms * 1_000_000)) <= 3
    keys = [(-score, doc_id) for doc_id, score, _, _ in got]
    assert keys == sorted(keys)


# ---------------------------------------------------------------------------
# span_not_match — exact positional-exclusion model
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(docs=_corpus)
def test_span_not_matches_model(docs):
    con = _con(docs)
    got = con.execute(REGISTRY["span_not_match"].sql).fetchall()
    model = []
    for i, toks in enumerate(docs):
        a = [j for j, t in enumerate(toks) if t == "spark"]
        b = [j for j, t in enumerate(toks) if t == "hash"]
        if not a:
            continue
        clean = sum(
            1 for pa in a if not any(abs(pb - pa) <= _SPAN_NOT_W for pb in b)
        )
        model.append((i, len(a), clean))
    model.sort(key=lambda r: (-r[2], r[0]))
    assert got == model[:20]
    for _, n_total, n_clean in got:
        assert 0 <= n_clean <= n_total


# ---------------------------------------------------------------------------
# disjunctive_predicate_revenue — Q19 OR-of-ANDs model (dyadic quantities)
# ---------------------------------------------------------------------------

_BRANDS = ["Brand#12", "Brand#23", "Brand#3", "Brand#9"]
_CLAUSES = {
    "Brand#12": (100, 1100, 1, 5),
    "Brand#23": (1000, 2000, 1, 10),
    "Brand#3": (2000, 3000, 1, 15),
}


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # partkey
            st.sampled_from([0.5, 5.0, 11.0, 15.25, 25.0, 40.0]),  # quantity
            st.integers(min_value=0, max_value=300),  # price dollars
        ),
        min_size=0,
        max_size=20,
    ),
    parts=st.lists(
        st.tuples(st.sampled_from(_BRANDS), st.integers(min_value=1, max_value=20)),
        min_size=6,
        max_size=6,
    ),
)
def test_disjunctive_predicate_revenue_matches_model(li, parts):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": pd.Series([r[0] for r in li], dtype="int64"),
                "l_quantity": pd.Series([r[1] for r in li], dtype="float64"),
                "l_extendedprice": pd.Series([float(r[2]) for r in li], dtype="float64"),
                "l_discount": pd.Series([0.0] * len(li), dtype="float64"),
            }
        ),
    )
    con.register(
        "part",
        pd.DataFrame(
            {
                "p_partkey": range(6),
                "p_brand": [p[0] for p in parts],
                "p_size": pd.Series([p[1] for p in parts], dtype="int32"),
            }
        ),
    )
    got = con.execute(REGISTRY["disjunctive_predicate_revenue"].sql).fetchall()
    n = rev = 0
    for pk, q, ep in li:
        brand, size = parts[pk]
        cl = _CLAUSES.get(brand)
        qc = _round_away(100 * q)
        if cl and cl[0] <= qc <= cl[1] and cl[2] <= size <= cl[3]:
            n += 1
            rev += 100 * ep
    assert got == [(n, rev)]


# ---------------------------------------------------------------------------
# nation_pair_trade_volume — bilateral flow matrix model
# ---------------------------------------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),  # orderkey
            st.integers(min_value=0, max_value=3),  # suppkey
            st.integers(min_value=0, max_value=400),  # price
        ),
        min_size=0,
        max_size=20,
    ),
    cust_nat=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
    supp_nat=st.lists(st.integers(min_value=0, max_value=2), min_size=4, max_size=4),
    years=st.lists(st.integers(min_value=1995, max_value=1997), min_size=8, max_size=8),
    ocust=st.lists(st.integers(min_value=0, max_value=3), min_size=8, max_size=8),
)
def test_nation_pair_trade_volume_matches_model(li, cust_nat, supp_nat, years, ocust):
    names = {0: _Q7_NATION_A, 1: _Q7_NATION_B, 2: "NATION_X"}
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": pd.Series([r[0] for r in li], dtype="int64"),
                "l_suppkey": pd.Series([r[1] for r in li], dtype="int64"),
                "l_extendedprice": pd.Series([float(r[2]) for r in li], dtype="float64"),
                "l_discount": pd.Series([0.0] * len(li), dtype="float64"),
            }
        ),
    )
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(8),
                "o_custkey": pd.Series(ocust, dtype="int64"),
                "o_orderdate": pd.to_datetime([f"{y}-03-03" for y in years]),
            }
        ),
    )
    con.register(
        "customer",
        pd.DataFrame({"c_custkey": range(4), "c_nationkey": pd.Series(cust_nat, dtype="int64")}),
    )
    con.register(
        "supplier",
        pd.DataFrame({"s_suppkey": range(4), "s_nationkey": pd.Series(supp_nat, dtype="int64")}),
    )
    con.register(
        "nation",
        pd.DataFrame({"n_nationkey": [0, 1, 2], "n_name": [names[k] for k in range(3)]}),
    )
    got = con.execute(REGISTRY["nation_pair_trade_volume"].sql).fetchall()
    agg: dict[tuple, list[int]] = {}
    for ok, sk, ep in li:
        sn, cn = names[supp_nat[sk]], names[cust_nat[ocust[ok]]]
        if {sn, cn} == {_Q7_NATION_A, _Q7_NATION_B}:
            k = (sn, cn, years[ok])
            a = agg.setdefault(k, [0, 0])
            a[0] += 1
            a[1] += 100 * ep
    assert got == [(k[0], k[1], k[2], v[0], v[1]) for k, v in sorted(agg.items())]


# ---------------------------------------------------------------------------
# min_cost_supplier_per_part — argmin with suppkey tiebreak
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # partkey
            st.integers(min_value=0, max_value=3),  # suppkey
            st.sampled_from([10, 20, 20, 50]),  # price dollars (ties likely)
        ),
        min_size=1,
        max_size=20,
    )
)
def test_min_cost_supplier_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": pd.Series([r[0] for r in li], dtype="int64"),
                "l_suppkey": pd.Series([r[1] for r in li], dtype="int64"),
                "l_extendedprice": pd.Series([float(r[2]) for r in li], dtype="float64"),
            }
        ),
    )
    con.register(
        "part",
        pd.DataFrame({"p_partkey": range(5), "p_name": [f"part_{i}" for i in range(5)]}),
    )
    con.register(
        "supplier",
        pd.DataFrame({"s_suppkey": range(4), "s_name": [f"Supplier#{i}" for i in range(4)]}),
    )
    got = con.execute(REGISTRY["min_cost_supplier_per_part"].sql).fetchall()
    best: dict[int, tuple[int, int]] = {}
    for pk, sk, ep in li:
        c = (100 * ep, sk)
        if pk not in best or c < best[pk]:
            best[pk] = c
    model = [
        (pk, f"part_{pk}", pc, sk, f"Supplier#{sk}")
        for pk, (pc, sk) in sorted(best.items())
    ][:20]
    assert got == model


# ---------------------------------------------------------------------------
# part_revenue_concentration — relative-threshold screen
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(st.integers(min_value=0, max_value=6), st.integers(min_value=0, max_value=900)),
        min_size=1,
        max_size=25,
    )
)
def test_part_revenue_concentration_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": pd.Series([r[0] for r in li], dtype="int64"),
                "l_extendedprice": pd.Series([float(r[1]) for r in li], dtype="float64"),
                "l_discount": pd.Series([0.0] * len(li), dtype="float64"),
            }
        ),
    )
    got = con.execute(REGISTRY["part_revenue_concentration"].sql).fetchall()
    pr: dict[int, int] = {}
    for pk, ep in li:
        pr[pk] = pr.get(pk, 0) + 100 * ep
    tot = sum(pr.values())
    model = [
        (pk, r, (1_000_000 * r) // tot)
        for pk, r in pr.items()
        if 100_000 * r > 65 * tot
    ]
    model.sort(key=lambda x: (-x[1], x[0]))
    assert got == model[:25]
    for _, _, share in got:
        assert share >= 600  # every survivor holds > 0.065% ≈ 650 q6 units
