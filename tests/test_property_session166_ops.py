"""Property-based semantics checks for the session-166 operators.

Models: temporal FK audit with injected time-travelers, and the
cosine-band clamp arithmetic. lsh_candidate_recall and
semdedup_threshold_histogram ride the memoized LSH/k-means fronts
(driver-contract territory); the recall FRACTION algebra is modeled
standalone. DuckDB-only (ms per example).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=35, deadline=None)
@given(
    li=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=-10, max_value=60),  # ship lag days
        ),
        min_size=1,
        max_size=30,
    ),
    odays=st.lists(
        st.integers(min_value=0, max_value=100), min_size=6, max_size=6
    ),
)
def test_ship_before_order_matches_model(li, odays):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(6),
                "o_orderdate": [
                    _D0 + datetime.timedelta(days=d) for d in odays
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
                    _D0 + datetime.timedelta(days=odays[o] + lag)
                    for o, lag in li
                ],
            }
        ),
    )
    got = con.execute(REGISTRY["ship_before_order_census"].sql).fetchall()[0]

    lags = [lag for _, lag in li]
    n = len(lags)
    nv = sum(1 for x in lags if x < 0)
    assert got == (n, nv, (1000000 * nv) // n, min(lags))


@settings(max_examples=35, deadline=None)
@given(cos=st.lists(st.integers(min_value=-1000000, max_value=1000000), min_size=1, max_size=40))
def test_cosine_band_clamp_semantics(cos):
    con = duckdb.connect()
    con.register("pr", pd.DataFrame({"cos_q6": cos}))
    got = {
        r[0]: r[1]
        for r in con.execute(
            """SELECT CASE WHEN cos_q6 >= 1000000 THEN 9
                   WHEN cos_q6 < -1000000 THEN -10
                   ELSE CAST(floor(cos_q6 / 100000.0) AS BIGINT) END AS band,
       CAST(count(*) AS BIGINT)
FROM pr GROUP BY band ORDER BY band"""
        ).fetchall()
    }
    model: dict[int, int] = {}
    for c in cos:
        if c >= 1000000:
            b = 9
        elif c < -1000000:
            b = -10
        else:
            b = math.floor(c / 100000.0)
        model[b] = model.get(b, 0) + 1
    assert got == model


@settings(max_examples=35, deadline=None)
@given(
    nt=st.integers(min_value=0, max_value=40),
    nf_frac=st.integers(min_value=0, max_value=100),
)
def test_recall_fraction_algebra(nt, nf_frac):
    nf = min(nt, (nt * nf_frac) // 100)
    con = duckdb.connect()
    got = con.execute(
        f"""SELECT CASE WHEN {nt} = 0 THEN CAST(0 AS BIGINT)
             ELSE CAST(({nf} * 1000000) // {nt} AS BIGINT) END"""
    ).fetchall()[0][0]
    assert got == (0 if nt == 0 else (nf * 1000000) // nt)
