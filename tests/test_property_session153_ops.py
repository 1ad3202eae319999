"""Property-based semantics checks for the session-153 operators.

Models: df shift under exact-dedup survivorship, open-order aging
bands, and the single-NDV vs 16-bucket-histogram join estimates vs the
exact per-key product sum. DuckDB-only (ms per example).
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_word = st.sampled_from(["alpha", "beta", "gamma", "dup"])


@settings(max_examples=35, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=1, max_size=5),
        min_size=1,
        max_size=12,
    )
)
def test_dedup_df_shift_matches_model(docs):
    texts = [" ".join(ws) for ws in docs]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    got = con.execute(REGISTRY["dedup_df_shift_topk"].sql).fetchall()

    first: dict[str, int] = {}
    for i, t in enumerate(texts):
        first.setdefault(t, i)
    surv = set(first.values())
    df_all: dict[str, int] = {}
    df_surv: dict[str, int] = {}
    for i, ws in enumerate(docs):
        for w in set(ws):
            df_all[w] = df_all.get(w, 0) + 1
            if i in surv:
                df_surv[w] = df_surv.get(w, 0) + 1
    rows = [
        (w, df_all[w], df_surv.get(w, 0), df_all[w] - df_surv.get(w, 0))
        for w in df_all
        if df_all[w] - df_surv.get(w, 0) > 0
    ]
    model = sorted(rows, key=lambda r: (-r[3], r[0]))[:20]
    assert got == model


_D0 = datetime.datetime(1997, 5, 1)


@settings(max_examples=35, deadline=None)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=900),
            st.sampled_from(["O", "F", "P"]),
            st.integers(min_value=1, max_value=40000).map(lambda k: k / 4),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_open_order_age_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(len(orders)),
                "o_orderdate": [
                    _D0 + datetime.timedelta(days=d) for d, _, _ in orders
                ],
                "o_orderstatus": [s for _, s, _ in orders],
                "o_totalprice": [v for _, _, v in orders],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["open_order_age_histogram"].sql
        ).fetchall()
    }

    maxd = max(d for d, _, _ in orders)
    model: dict[int, list[int]] = {}
    for d, s, v in orders:
        if s != "O":
            continue
        age = maxd - d
        band = 0 if age <= 30 else 1 if age <= 90 else 2 if age <= 365 else 3
        cents = round(v * 100)
        cell = model.setdefault(band, [0, 0])
        cell[0] += 1
        cell[1] += cents
    assert got == {k: tuple(v) for k, v in model.items()}


@settings(max_examples=35, deadline=None)
@given(
    okeys=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=15,
        unique=True,
    ),
    lkeys=st.lists(
        st.integers(min_value=0, max_value=14), min_size=1, max_size=40
    ),
)
def test_join_histogram_estimate_matches_model(okeys, lkeys):
    lvals = [okeys[i % len(okeys)] for i in lkeys]
    con = duckdb.connect()
    con.register("orders", pd.DataFrame({"o_orderkey": okeys}))
    con.register("lineitem", pd.DataFrame({"l_orderkey": lvals}))
    got = con.execute(REGISTRY["join_histogram_estimate"].sql).fetchall()[0]

    mn, mx = min(okeys), max(okeys)
    w = (mx - mn) // 16 + 1

    def bucket_stats(vals):
        out: dict[int, list] = {}
        for v in vals:
            b = (v - mn) // w
            cell = out.setdefault(b, [0, set()])
            cell[0] += 1
            cell[1].add(v)
        return out

    lb, ob = bucket_stats(lvals), bucket_stats(okeys)
    est_hist = sum(
        (lb[b][0] * ob[b][0]) // max(len(lb[b][1]), len(ob[b][1]), 1)
        for b in lb
        if b in ob
    )
    n_l, n_r = len(lvals), len(okeys)
    ndv_l, ndv_r = len(set(lvals)), len(set(okeys))
    est_single = (n_l * n_r) // max(ndv_l, ndv_r, 1)
    cl: dict[int, int] = {}
    for v in lvals:
        cl[v] = cl.get(v, 0) + 1
    actual = sum(cl.get(k, 0) for k in okeys)
    assert got == (n_l, n_r, est_single, est_hist, actual)
