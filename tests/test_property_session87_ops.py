"""Semantics checks for the session-87 operators.

embedding_pca2_share gets planted-rank tests (rank-1 data must put ~0
in the second direction; orthogonal two-axis data must split and sum
to ~100%); the weekday profile and props census against direct models.
DuckDB-only.
"""

from __future__ import annotations

import datetime
import json
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


def test_pca2_rank1_data_has_no_second_direction():
    con = duckdb.connect()
    vecs = [[(k % 7 + 1) / 64.0] + [0.0] * 63 for k in range(24)]
    _reg_emb(con, vecs)
    n, v1, v2 = con.execute(REGISTRY["embedding_pca2_share"].sql).fetchall()[0]
    assert n == 24
    assert v1 >= 990_000
    assert v2 <= 10_000


def test_pca2_two_axis_data_splits_and_sums():
    con = duckdb.connect()
    vecs = []
    for k in range(24):
        v = [0.0] * 64
        if k % 2 == 0:
            v[0] = (k % 7 + 2) / 64.0  # heavier axis
        else:
            v[1] = (k % 5 + 1) / 64.0
        vecs.append(v)
    _reg_emb(con, vecs)
    n, v1, v2 = con.execute(REGISTRY["embedding_pca2_share"].sql).fetchall()[0]
    assert n == 24
    assert v1 >= v2 > 0
    # rank-2 data: the two shares must account for everything
    assert 980_000 <= v1 + v2 <= 1_000_006


_MT0 = datetime.datetime(1995, 1, 15)
_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(st.integers(min_value=0, max_value=60), _price),
        min_size=1,
        max_size=25,
    )
)
def test_orders_weekday_matches_model(orders):
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
    got = con.execute(REGISTRY["orders_weekday_profile"].sql).fetchall()
    day0 = (_MT0 - datetime.datetime(1970, 1, 1)).days
    agg = {d: [0, 0] for d in range(7)}
    for d, p in orders:
        dow = (day0 + d + 3) % 7
        agg[dow][0] += 1
        agg[dow][1] += _round_away(p * 100)
    tot = sum(rc for _, rc in agg.values())
    model = [
        (d, agg[d][0], agg[d][1], 0 if tot == 0 else (1_000_000 * agg[d][1]) // tot)
        for d in range(7)
    ]
    assert got == model


_KEYS = ["k", "x", "extra"]


@settings(max_examples=40, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.sampled_from(["view", "click"]),
            st.lists(st.sampled_from(_KEYS), min_size=0, max_size=3, unique=True),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_props_census_matches_model(events):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(events)),
                "event_type": [t for t, _ in events],
                "props": [
                    json.dumps({k: 1 for k in ks}) for _, ks in events
                ],
            }
        ),
    )
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(REGISTRY["props_key_census"].sql).fetchall()
    }
    model: dict[tuple[str, str], int] = {}
    for t, ks in events:
        for k in ks:
            model[(t, k)] = model.get((t, k), 0) + 1
    assert got == model
