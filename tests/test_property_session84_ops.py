"""Property-based semantics checks for the session-84 operators.

Models: the status×month matrix and char-class profile against direct
counting, and the ANN margin histogram's structural invariants over
injected embeddings. DuckDB-only.
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


_MT0 = datetime.datetime(1995, 1, 15)
_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=700),
            st.sampled_from(["O", "F", "P"]),
            _price,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_status_month_matrix_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_orderdate": [
                    _MT0 + datetime.timedelta(days=d) for d, _, _ in orders
                ],
                "o_orderstatus": [s for _, s, _ in orders],
                "o_totalprice": [p for _, _, p in orders],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2:]
        for r in con.execute(
            REGISTRY["order_status_month_matrix"].sql
        ).fetchall()
    }
    model: dict[tuple[int, str], list[int]] = {}
    for d, s, p in orders:
        mon = (_MT0 + datetime.timedelta(days=d)).month
        cell = model.setdefault((mon, s), [0, 0])
        cell[0] += 1
        cell[1] += _round_away(p * 100)
    assert got == {k: tuple(v) for k, v in model.items()}


_chars = st.text(
    alphabet="abZ9 .!é", min_size=0, max_size=20
)  # letters, digit, space, punct, non-ascii


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s0", "s1"]), _chars),
        min_size=1,
        max_size=12,
    )
)
def test_charclass_profile_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": [s for s, _ in docs],
                "text": [t for _, t in docs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["charclass_profile_source"].sql).fetchall()
    }
    model = {}
    for src in {s for s, _ in docs}:
        txts = [t for s, t in docs if s == src]
        n = sum(len(t) for t in txts)
        alpha = sum(1 for t in txts for c in t if c.isascii() and c.isalpha())
        digit = sum(1 for t in txts for c in t if c.isdigit())
        space = sum(1 for t in txts for c in t if c == " ")
        if n == 0:
            model[src] = (0, 0, 0, 0, 0)
        else:
            model[src] = (
                n,
                (1_000_000 * alpha) // n,
                (1_000_000 * digit) // n,
                (1_000_000 * space) // n,
                (1_000_000 * (n - alpha - digit - space)) // n,
            )
    assert got == model


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=6, deadline=None)
@given(data=st.data(), n=st.integers(min_value=38, max_value=45))
def test_margin_histogram_invariants(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    rows = con.execute(REGISTRY["ann_margin_histogram"].sql).fetchall()
    n_queries = len([i for i in range(n) if i % 37 == 0])
    total = sum(c for _, c in rows)
    assert total <= n_queries
    for bucket, c in rows:
        assert 0 <= bucket <= 20  # cosine margins live in [0, 2]
        assert c >= 1
