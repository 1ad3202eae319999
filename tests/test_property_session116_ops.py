"""Property-based semantics checks for the session-116 operators.

Models: halves drift against exact integer centroids, weekday-adjusted
anomaly against a literal deseasonalise-then-z² model, priority ship
lag against direct aggregation. DuckDB-only.
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


_comp = st.integers(min_value=0, max_value=8)


@st.composite
def _vec(draw, i=0):
    v = [draw(_comp) / 64.0 for _ in range(64)]
    v[i % 64] = max(v[i % 64], 1 / 64.0)
    return v


@settings(max_examples=15, deadline=None)
@given(data=st.data(), n=st.integers(min_value=4, max_value=12))
def test_halves_drift_matches_model(data, n):
    vecs = [data.draw(_vec(i)) for i in range(n)]
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": range(n), "label": [0] * n, "embedding": vecs}
        ),
    )
    n_even, n_odd, cos = con.execute(
        REGISTRY["embedding_halves_drift"].sql
    ).fetchall()[0]
    cents = {0: [0] * 64, 1: [0] * 64}
    counts = {0: 0, 1: 0}
    for vid in range(1, n):
        h = vid % 2
        counts[h] += 1
        for i, x in enumerate(vecs[vid]):
            cents[h][i] += _round_away(1_000_000 * x)
    assert (n_even, n_odd) == (counts[0], counts[1])
    nab = naa = nbb = 0.0
    for x, y in zip(cents[0], cents[1]):
        nab += float(x) * y
        naa += float(x) * x
        nbb += float(y) * y
    if naa == 0.0 or nbb == 0.0:
        assert cos == 0
    else:
        assert cos == _round_away(
            1_000_000 * nab / (math.sqrt(naa) * math.sqrt(nbb))
        )


_DT0 = datetime.datetime(2025, 4, 7)  # a Monday


@settings(max_examples=40, deadline=None)
@given(
    days=st.lists(
        st.integers(min_value=0, max_value=20), min_size=2, max_size=40
    )
)
def test_weekday_adjusted_anomaly_matches_model(days):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(days)),
                "ts": [_DT0 + datetime.timedelta(days=d) for d in days],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["weekday_adjusted_anomaly"].sql
        ).fetchall()
    }
    day0 = (_DT0 - datetime.datetime(1970, 1, 1)).days
    lo, hi = min(days), max(days)
    series = [(day0 + d, days.count(d)) for d in range(lo, hi + 1)]
    from collections import defaultdict

    dowsum = defaultdict(lambda: [0, 0])
    for dn, x in series:
        dw = (dn + 3) % 7
        dowsum[dw][0] += x
        dowsum[dw][1] += 1
    mean_q6 = {
        dw: _round_away(1_000_000.0 * s / c) for dw, (s, c) in dowsum.items()
    }
    rs = [
        (dn, x, _round_away((1_000_000 * x - mean_q6[(dn + 3) % 7]) / 1_000_000.0))
        for dn, x in series
    ]
    nd = len(rs)
    sr = sum(r for _, _, r in rs)
    mr = -((-sr) // nd) if sr < 0 else sr // nd
    src = sum(r - mr for _, _, r in rs)
    srr = sum((r - mr) ** 2 for _, _, r in rs)
    denom = float(nd) * srr - float(src) * src
    model = {}
    for dn, x, r in rs:
        if nd < 2 or denom == 0.0:
            z2 = 0
        else:
            var = denom / (float(nd) * nd)
            z2 = _round_away(1_000_000 * ((float(r - mr) * (r - mr)) / var))
        model[dn] = (x, z2)
    assert got == model


_ST0 = datetime.datetime(1996, 1, 1)


@settings(max_examples=40, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=90),
        ),
        min_size=1,
        max_size=30,
    ),
    prio=st.lists(
        st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
        min_size=9,
        max_size=9,
    ),
    odays=st.lists(
        st.integers(min_value=0, max_value=60), min_size=9, max_size=9
    ),
)
def test_ship_lag_by_priority_matches_model(li, prio, odays):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(9),
                "o_orderpriority": prio,
                "o_orderdate": [
                    _ST0 + datetime.timedelta(days=d) for d in odays
                ],
            }
        ),
    )
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [o for o, _ in li],
                "l_shipdate": [
                    _ST0 + datetime.timedelta(days=odays[o] + d)
                    for o, d in li
                ],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["ship_lag_by_priority"].sql).fetchall()
    }
    per: dict[str, list[int]] = {}
    for o, d in li:
        per.setdefault(prio[o], []).append(d)
    model = {
        p: (
            len(ls),
            _round_away(1_000_000 * (float(sum(ls)) / len(ls))),
            max(ls),
        )
        for p, ls in per.items()
    }
    assert got == model
