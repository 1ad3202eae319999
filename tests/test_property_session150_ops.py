"""Property-based semantics checks for the session-150 operators.

Models: surprisal×TTR Pearson (q3-floored integer stats + the shared
guarded float expression), monthly ship-lag trend, and the priority
value profile. DuckDB-only (ms per example).
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


_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=1, max_size=10),
        min_size=1,
        max_size=10,
    )
)
def test_ppl_quality_corr_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "text": [" ".join(ws) for ws in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["ppl_quality_corr"].sql).fetchall()[0]

    cf: dict[str, int] = {}
    for ws in docs:
        for w in ws:
            cf[w] = cf.get(w, 0) + 1
    big_t = float(sum(cf.values()))
    nlp = {w: _round_away(-math.log(c / big_t) * 1000000) for w, c in cf.items()}
    xs, ys = [], []
    for ws in docs:
        tf: dict[str, int] = {}
        for w in ws:
            tf[w] = tf.get(w, 0) + 1
        n_tok = len(ws)
        mean_nlp = sum(c * nlp[w] for w, c in tf.items()) // n_tok
        ttr = _round_away(1e6 * len(tf) / n_tok)
        xs.append(mean_nlp // 1000)
        ys.append(ttr // 1000)
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    if n < 2 or n * sxx == sx * sx or n * syy == sy * sy:
        corr = 0
    else:
        corr = _round_away(
            1000000
            * (float(n) * sxy - float(sx) * sy)
            / (
                math.sqrt(float(n) * sxx - float(sx) * sx)
                * math.sqrt(float(n) * syy - float(sy) * sy)
            )
        )
    assert got == (n, corr)


_D0 = datetime.datetime(1996, 11, 20)


@settings(max_examples=30, deadline=None)
@given(
    orders=st.lists(
        st.integers(min_value=0, max_value=120), min_size=1, max_size=8
    ),
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=90),
        ),
        min_size=1,
        max_size=25,
    ),
)
def test_ship_lag_by_month_matches_model(orders, li):
    odates = [_D0 + datetime.timedelta(days=d) for d in orders]
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame({"o_orderkey": range(len(orders)), "o_orderdate": odates}),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_shipdate": [
                    odates[o] + datetime.timedelta(days=lag)
                    if o < len(orders)
                    else _D0
                    for o, lag in li
                ],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["ship_lag_by_month"].sql).fetchall()
    }

    agg: dict[int, list[int]] = {}
    for o, lag in li:
        if o >= len(orders):
            continue
        od = odates[o]
        ym = od.year * 100 + od.month
        cell = agg.setdefault(ym, [0, 0])
        cell[0] += 1
        cell[1] += lag
    model = {
        ym: (n, s, (1000000 * s) // n) for ym, (n, s) in agg.items()
    }
    assert got == model


_price = st.integers(min_value=1, max_value=400000).map(lambda k: k / 4)
_prio = st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"])


@settings(max_examples=30, deadline=None)
@given(
    orders=st.lists(st.tuples(_prio, _price), min_size=1, max_size=25)
)
def test_priority_value_profile_matches_model(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderpriority": [p for p, _ in orders],
                "o_totalprice": [v for _, v in orders],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["priority_value_profile"].sql
        ).fetchall()
    }
    model: dict[str, list[int]] = {}
    for p, v in orders:
        c = _round_away(v * 100)
        cell = model.setdefault(p, [0, 0, None, None])
        cell[0] += 1
        cell[1] += c
        cell[2] = c if cell[2] is None else min(cell[2], c)
        cell[3] = c if cell[3] is None else max(cell[3], c)
    assert got == {p: tuple(v) for p, v in model.items()}
