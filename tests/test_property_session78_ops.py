"""Semantics checks for the session-78 operators.

embedding_isotropy gets the planted-direction treatment (all variance on
one axis must read ~100%, the power-iteration pytest convention);
pq_code_histogram is checked on structural invariants (per-subspace code
budget, exact share arithmetic against the known vector count);
orders_month_seasonality against a direct model. Vector components are
multiples of 1/64 (exact in float32 AND float64 — the session-52 rule)
and never all-zero (zero norms make NaN cosines by construction).
DuckDB-only.
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


def _reg_emb(con, vecs):
    con.register(
        "embeddings",
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "label": [0] * len(vecs),
                "embedding": vecs,
            }
        ),
    )


def test_isotropy_planted_direction_reads_full_share():
    con = duckdb.connect()
    vecs = [[(k % 7 + 1) / 64.0] + [0.0] * 63 for k in range(24)]
    _reg_emb(con, vecs)
    n_vecs, share = con.execute(REGISTRY["embedding_isotropy"].sql).fetchall()[0]
    assert n_vecs == 24
    assert 990_000 <= share <= 1_000_003


def test_isotropy_two_axis_split_is_partial():
    con = duckdb.connect()
    # half the mass on axis 0, half on axis 1 -> top direction holds ~50%
    vecs = []
    for k in range(24):
        v = [0.0] * 64
        v[k % 2] = (k % 5 + 1) / 64.0
        vecs.append(v)
    _reg_emb(con, vecs)
    n_vecs, share = con.execute(REGISTRY["embedding_isotropy"].sql).fetchall()[0]
    assert n_vecs == 24
    assert 0 <= share <= 1_000_003
    assert share < 990_000  # no single direction explains everything


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)  # never all-zero
    return v


@settings(max_examples=10, deadline=None)
@given(data=st.data(), n=st.integers(min_value=20, max_value=30))
def test_pq_histogram_invariants(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    _reg_emb(con, vecs)
    rows = con.execute(REGISTRY["pq_code_histogram"].sql).fetchall()
    assert [r[0] for r in rows] == list(range(8))
    tot = n - 1  # every non-query vector gets exactly one code per subspace
    for m, used, top_cid, top_n, share in rows:
        assert 1 <= used <= 16
        assert 1 <= top_cid <= 16
        assert 1 <= top_n <= tot
        assert top_n * used >= tot  # the max bucket is at least the mean
        assert share == (1_000_000 * top_n) // tot


_MT0 = datetime.datetime(1995, 1, 15)
_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=700), _price),
        min_size=1,
        max_size=30,
    )
)
def test_month_seasonality_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_orderdate": [
                    _MT0 + datetime.timedelta(days=d) for d, _ in orders
                ],
                "o_totalprice": [p for _, p in orders],
            }
        ),
    )
    got = con.execute(REGISTRY["orders_month_seasonality"].sql).fetchall()
    agg = {m: [0, 0] for m in range(1, 13)}
    for d, p in orders:
        mon = (_MT0 + datetime.timedelta(days=d)).month
        agg[mon][0] += 1
        agg[mon][1] += _round_away(p * 100)
    tot = sum(c for _, c in agg.values())
    model = [
        (m, agg[m][0], agg[m][1], 0 if tot == 0 else (1_000_000 * agg[m][1]) // tot)
        for m in range(1, 13)
    ]
    assert got == model
