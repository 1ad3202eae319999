"""Property-based semantics checks for the session-169 operators.

Models: the two-plan join-order estimate, and peak-day concentration
(exact-ceil top decile). semdedup_centroid_shift rides the k-means
prelude (driver-contract territory); its centroid-cosine algebra is
checked standalone. DuckDB-only (ms per example).
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


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(st.integers(min_value=0, max_value=8), min_size=1, max_size=30),
    orders=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=1,
        max_size=12,
    ),
    custs=st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=6),
)
def test_join_order_cost_matches_model(li, orders, custs):
    con = duckdb.connect()
    con.register("lineitem", pd.DataFrame({"l_orderkey": li}))
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": [o for o, _ in orders],
                "o_custkey": [c for _, c in orders],
            }
        ),
    )
    con.register("customer", pd.DataFrame({"c_custkey": custs}))
    got = {
        r[0]: r[1]
        for r in con.execute(
            REGISTRY["join_order_cost_compare"].sql
        ).fetchall()
    }

    def est(nl, nr, dl, dr):
        return _round_away(float(nl) * float(nr) / max(dl, dr, 1))

    lio = est(len(li), len(orders), len(set(li)), len({o for o, _ in orders}))
    oc = est(
        len(orders),
        len(custs),
        len({c for _, c in orders}),
        len(set(custs)),
    )
    assert got == {
        "lineitem_orders_first": lio,
        "orders_customer_first": oc,
    }


_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=35, deadline=None)
@given(
    days=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_peak_concentration_matches_model(days):
    rows = []
    eid = 0
    for d, k in days:
        for _ in range(k):
            rows.append((eid, _D0 + datetime.timedelta(days=d, hours=eid % 20)))
            eid += 1
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame({"event_id": [r[0] for r in rows], "ts": [r[1] for r in rows]}),
    )
    got = con.execute(REGISTRY["peak_day_concentration"].sql).fetchall()[0]

    per: dict[int, int] = {}
    for d, k in days:
        per[d] = per.get(d, 0) + k
    nd = len(per)
    tot = sum(per.values())
    k = (nd + 9) // 10
    ordered = sorted(per.items(), key=lambda kv: (-kv[1], kv[0]))
    top = sum(n for _, n in ordered[:k])
    assert got == (nd, k, top, tot, (1000000 * top) // tot)


@settings(max_examples=30, deadline=None)
@given(
    sf=st.lists(st.integers(min_value=-500, max_value=500), min_size=4, max_size=4),
    sk=st.lists(st.integers(min_value=-500, max_value=500), min_size=4, max_size=4),
)
def test_centroid_cosine_algebra(sf, sk):
    con = duckdb.connect()
    con.register(
        "j",
        pd.DataFrame({"sf": sf, "sk": sk}),
    )
    got = con.execute(
        """WITH a AS (SELECT CAST(sum(sf * sk) AS BIGINT) AS dp,
             CAST(sum(sf * sf) AS BIGINT) AS nf,
             CAST(sum(sk * sk) AS BIGINT) AS nk FROM j)
SELECT CASE WHEN nf = 0 OR nk = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(round(1000000 * (dp / (sqrt(CAST(nf AS DOUBLE))
                 * sqrt(CAST(nk AS DOUBLE))))) AS BIGINT) END FROM a"""
    ).fetchall()[0][0]

    dp = sum(x * y for x, y in zip(sf, sk))
    nf = sum(x * x for x in sf)
    nk = sum(y * y for y in sk)
    if nf == 0 or nk == 0:
        model = 0
    else:
        model = _round_away(1000000 * (dp / (math.sqrt(float(nf)) * math.sqrt(float(nk)))))
    assert got == model
