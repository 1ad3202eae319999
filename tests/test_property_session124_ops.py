"""Property-based semantics checks for the session-124 operators.

Models: ANN-graph components on structural invariants over injected
embeddings, the supplier×brand lanes and balance/order correlation
against direct models. DuckDB-only.
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


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=5, deadline=None)
@given(data=st.data(), n=st.integers(min_value=15, max_value=22))
def test_ann_components_invariants(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    n_nodes, n_in, n_comp, largest, n_single = con.execute(
        REGISTRY["ann_graph_components"].sql
    ).fetchall()[0]
    assert n_nodes == n - 1
    assert n_in + n_single == n_nodes
    assert 0 <= n_single
    if n_in > 0:
        assert 1 <= n_comp <= n_in
        assert 2 <= largest <= n_in  # an edge touches two nodes
    # every node emits up to 3 edges, so the graph is never empty here
    assert n_in >= 2


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # suppkey
            st.integers(min_value=0, max_value=4),  # partkey
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=30,
    ),
    brands=st.lists(st.sampled_from(["B1", "B2"]), min_size=5, max_size=5),
)
def test_supplier_brand_matrix_matches_model(li, brands):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_suppkey": [s for s, _, _ in li],
                "l_partkey": [p for _, p, _ in li],
                "l_quantity": [float(q) for _, _, q in li],
            }
        ),
    )
    con.register(
        "part", pd.DataFrame({"p_partkey": range(5), "p_brand": brands})
    )
    got = con.execute(REGISTRY["supplier_brand_matrix"].sql).fetchall()
    cells: dict[tuple[int, str], list[int]] = {}
    for s, p, q in li:
        cell = cells.setdefault((s, brands[p]), [0, 0])
        cell[0] += 1
        cell[1] += q
    rows = sorted(
        ((s, b, n, tq) for (s, b), (n, tq) in cells.items()),
        key=lambda r: (-r[3], r[0], r[1]),
    )[:15]
    want = [
        (s, b, r, n, tq) for r, (s, b, n, tq) in enumerate(rows, start=1)
    ]
    assert got == want


_bal = st.integers(min_value=-8000, max_value=8000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    custs=st.lists(_bal, min_size=1, max_size=15),
    orders=st.lists(st.integers(min_value=0, max_value=20), min_size=0, max_size=25),
)
def test_balance_order_corr_matches_model(custs, orders):
    orders = [o % len(custs) for o in orders]
    con = duckdb.connect()
    con.register(
        "customer",
        pd.DataFrame(
            {"c_custkey": range(len(custs)), "c_acctbal": custs}
        ),
    )
    con.register(
        "orders",
        pd.DataFrame({"o_orderkey": range(len(orders)), "o_custkey": orders}),
    )
    n, corr = con.execute(REGISTRY["balance_order_corr"].sql).fetchall()[0]
    def tdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    xs = [tdiv(_round_away(b * 100), 100) for b in custs]
    ys = [orders.count(c) for c in range(len(custs))]
    nn = len(xs)
    assert n == nn
    sx, sy = sum(xs), sum(ys)
    mx = tdiv(sx, max(nn, 1))
    my = sy // max(nn, 1)
    sxc = sum(x - mx for x in xs)
    syc = sum(y - my for y in ys)
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    cov = float(nn) * sxy - float(sxc) * syc
    vx = float(nn) * sxx - float(sxc) * sxc
    vy = float(nn) * syy - float(syc) * syc
    if nn < 2 or vx == 0.0 or vy == 0.0:
        assert corr == 0
    else:
        mag = _round_away(1_000_000 * (cov * cov / (vx * vy)))
        assert corr == (-mag if cov < 0.0 else mag)
