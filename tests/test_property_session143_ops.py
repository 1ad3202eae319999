"""Property-based semantics checks for the session-143 operators.

Models: Q3-shape unshipped backlog (two-sided date predicate + top-10),
Q10-shape returned-revenue customers, and the Roaring container size
model (multi-chunk doc_ids injected — the sandbox corpus never crosses
a 65536 boundary). DuckDB-only (ms per example).

Prices are dyadic (k/4) and discounts are 64ths so every
``round(100·p·(1−d))`` argument is an exactly-representable double and
the half-away-from-zero round is ulp-unambiguous in both engines and in
the model (the session-39 rule).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


def _round_away(v: float) -> int:
    return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))


_CUT = datetime.datetime(1998, 7, 1)
_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)
_disc = st.integers(min_value=0, max_value=6).map(lambda k: k / 64)


def _disc_cents(p: float, d: float) -> int:
    return _round_away(100 * p * (1 - d))


@settings(max_examples=30, deadline=None)
@given(
    custs=st.lists(st.sampled_from(["BUILDING", "MACHINERY"]), min_size=1, max_size=6),
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=-40, max_value=40),
        ),
        min_size=1,
        max_size=10,
    ),
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=-40, max_value=40),
            _price,
            _disc,
        ),
        min_size=1,
        max_size=30,
    ),
)
def test_unshipped_backlog_matches_model(custs, orders, items):
    con = duckdb.connect()
    con.register(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": range(len(custs)),
                "c_mktsegment": custs,
            }
        ),
    )
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_custkey": [c for c, _ in orders],
                "o_orderdate": [
                    _CUT + datetime.timedelta(days=d) for _, d in orders
                ],
                "o_orderpriority": ["1-URGENT"] * len(orders),
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _, _, _ in items],
                "l_shipdate": [
                    _CUT + datetime.timedelta(days=d) for _, d, _, _ in items
                ],
                "l_extendedprice": [p for _, _, p, _ in items],
                "l_discount": [d for _, _, _, d in items],
            }
        ),
    )
    got = con.execute(REGISTRY["unshipped_orders_topk"].sql).fetchall()

    rev: dict[int, int] = {}
    for ok, (ck, od) in enumerate(orders):
        if od >= 0 or ck >= len(custs) or custs[ck] != "BUILDING":
            continue
        r = sum(
            _disc_cents(p, d)
            for o, sd, p, d in items
            if o == ok and sd > 0
        )
        n = sum(1 for o, sd, _, _ in items if o == ok and sd > 0)
        if n:
            rev[ok] = r
    model = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r[0], r[3]) for r in got] == model
    for r in got:
        ck, od = orders[r[0]]
        dt = _CUT + datetime.timedelta(days=od)
        assert r[1] == int(
            (dt - datetime.datetime(1970, 1, 1)).total_seconds() * 1e6
        )
        assert r[2] == "1-URGENT"


@settings(max_examples=30, deadline=None)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=-200, max_value=200),
        ),
        min_size=1,
        max_size=10,
    ),
    items=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.sampled_from(["R", "N", "A"]),
            _price,
            _disc,
        ),
        min_size=1,
        max_size=30,
    ),
)
def test_returned_revenue_matches_model(orders, items):
    con = duckdb.connect()
    d0 = datetime.datetime(1996, 1, 1)
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_custkey": [c for c, _ in orders],
                "o_orderdate": [
                    d0 + datetime.timedelta(days=d) for _, d in orders
                ],
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _, _, _ in items],
                "l_returnflag": [f for _, f, _, _ in items],
                "l_extendedprice": [p for _, _, p, _ in items],
                "l_discount": [d for _, _, _, d in items],
            }
        ),
    )
    con.register(
        "customer",
        pd.DataFrame(
            {
                "c_custkey": range(5),
                "c_name": [f"cust{i}" for i in range(5)],
                "c_nationkey": [i % 2 for i in range(5)],
            }
        ),
    )
    con.register(
        "nation",
        pd.DataFrame({"n_nationkey": [0, 1], "n_name": ["NA", "NB"]}),
    )
    got = con.execute(REGISTRY["returned_revenue_customers"].sql).fetchall()

    agg: dict[int, list[int]] = {}
    for o, f, p, d in items:
        if f != "R" or o >= len(orders):
            continue
        ck, od = orders[o]
        if not (0 <= od < 182):  # [1996-01-01, 1996-07-01)
            continue
        cell = agg.setdefault(ck, [0, 0])
        cell[0] += 1
        cell[1] += _disc_cents(p, d)
    model = sorted(
        ((ck, n, r) for ck, (n, r) in agg.items()),
        key=lambda t: (-t[2], t[0]),
    )[:20]
    assert [(r[0], r[3], r[4]) for r in got] == model
    for r in got:
        assert r[1] == f"cust{r[0]}" and r[2] == ["NA", "NB"][r[0] % 2]


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=300000),
            st.lists(
                st.sampled_from(["alpha", "beta", "gamma", "delta"]),
                min_size=1,
                max_size=6,
            ),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    )
)
def test_roaring_estimate_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": [i for i, _ in docs],
                "text": [" ".join(ws) for _, ws in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["postings_roaring_estimate"].sql).fetchall()
    }

    per_term: dict[str, set[int]] = {}
    for i, ws in docs:
        for w in set(ws):
            per_term.setdefault(w, set()).add(i)
    model: dict[int, list[int]] = {}
    for ids in per_term.values():
        df = len(ids)
        chunks: dict[int, int] = {}
        for i in ids:
            chunks[i // 65536] = chunks.get(i // 65536, 0) + 1
        byts = sum(8 + (2 * n if n <= 4096 else 8192) for n in chunks.values())
        band = df.bit_length() - 1
        cell = model.setdefault(band, [0, 0, 0, 0])
        cell[0] += 1
        cell[1] += df
        cell[2] += len(chunks)
        cell[3] += byts
    expect = {
        b: (c[0], c[1], c[2], c[3], (1000000 * c[3]) // c[1])
        for b, c in model.items()
    }
    assert got == expect
