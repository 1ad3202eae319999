"""Property-based semantics checks for the session-95 operators.

Models: FK integrity against direct orphan counting (orphans INJECTED
— the healthy sandbox would never exercise the counter), unit-price
dispersion against per-part distinct prices, and the min-df curve
against a literal dictionary cut. DuckDB-only.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # orderkey (some orphans)
            st.integers(min_value=0, max_value=6),  # partkey
            st.integers(min_value=0, max_value=6),  # suppkey
        ),
        min_size=1,
        max_size=25,
    ),
    oc=st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=10),
)
def test_fk_census_matches_model(li, oc):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _, _ in li],
                "l_partkey": [p for _, p, _ in li],
                "l_suppkey": [s for _, _, s in li],
            }
        ),
    )
    con.register(
        "orders",
        pd.DataFrame({"o_orderkey": range(10), "o_custkey": oc + [0] * (10 - len(oc))}),
    )
    con.register("part", pd.DataFrame({"p_partkey": range(5)}))
    con.register("supplier", pd.DataFrame({"s_suppkey": range(5), "s_nationkey": [0, 1, 2, 9, 9]}))
    con.register("customer", pd.DataFrame({"c_custkey": range(6), "c_nationkey": [0, 1, 2, 2, 9, 9]}))
    con.register("nation", pd.DataFrame({"n_nationkey": range(3)}))
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["fk_integrity_census"].sql).fetchall()
    }
    custkeys = (oc + [0] * (10 - len(oc)))[:10]
    model = {
        "lineitem.l_orderkey->orders": (
            len(li),
            sum(1 for o, _, _ in li if o >= 10),
        ),
        "lineitem.l_partkey->part": (
            len(li),
            sum(1 for _, p, _ in li if p >= 5),
        ),
        "lineitem.l_suppkey->supplier": (
            len(li),
            sum(1 for _, _, s in li if s >= 5),
        ),
        "orders.o_custkey->customer": (
            10,
            sum(1 for c in custkeys if c >= 6),
        ),
        "customer.c_nationkey->nation": (6, 2),
        "supplier.s_nationkey->nation": (5, 2),
    }
    assert got == model


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),  # partkey
            st.integers(min_value=1, max_value=10),  # quantity
            st.integers(min_value=1, max_value=8000).map(lambda k: k / 4),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_unit_price_dispersion_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_partkey": [p for p, _, _ in li],
                "l_quantity": [float(q) for _, q, _ in li],
                "l_extendedprice": [e for _, _, e in li],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["unit_price_dispersion"].sql).fetchall()
    }
    import math

    per: dict[int, list[int]] = {}
    for p, q, e in li:
        v = 100 * e / q
        cents = int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))
        per.setdefault(p, []).append(cents)
    model: dict[int, list[int]] = {}
    for prices in per.values():
        np_ = len(set(prices))
        b = 1 if np_ == 1 else (2 if np_ == 2 else 3)
        cell = model.setdefault(b, [0, 0])
        cell[0] += 1
        cell[1] += len(prices)
    assert got == {b: tuple(v) for b, v in model.items()}


_WD = ["aa", "bb", "cc", "dd", "ee", "ff"]
_textd = st.lists(st.sampled_from(_WD), min_size=1, max_size=6).map(" ".join)


def _vbytes(x: int) -> int:
    return (x.bit_length() + 6) // 7


@settings(max_examples=30, deadline=None)
@given(docs=st.lists(_textd, min_size=1, max_size=12))
def test_mindf_curve_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["mindf_prune_curve"].sql).fetchall()
    }
    post: dict[str, list[int]] = {}
    for d, t in enumerate(docs):
        for w in set(t.split()):
            post.setdefault(w, []).append(d)
    bytes_tot = sum(
        sum(_vbytes(d + 1) for d in ids) for ids in post.values()
    )
    model = {}
    for k in (1, 2, 4):
        dropped = {w: ids for w, ids in post.items() if len(ids) <= k}
        bs = sum(sum(_vbytes(d + 1) for d in ids) for ids in dropped.values())
        model[k] = (
            len(dropped),
            sum(len(ids) for ids in dropped.values()),
            bs,
            (1_000_000 * bs) // max(bytes_tot, 1),
        )
    assert got == model
    # cuts nest: raising min_df never drops fewer terms
    assert model[1][0] <= model[2][0] <= model[4][0]
