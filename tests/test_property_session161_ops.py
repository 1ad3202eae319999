"""Property-based semantics checks for the session-161 operators.

Models: the 2-D skyline against a brute-force dominance model (ties in
both dims keep all co-located points), and the source-entropy leg of
the diversity-gain op. DuckDB-only (ms per example).
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


_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=40, deadline=None)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=30),  # value units
            st.integers(min_value=0, max_value=30),  # day offset
        ),
        min_size=1,
        max_size=30,
    )
)
def test_skyline_matches_bruteforce(orders):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_totalprice": [v / 1.0 for v, _ in orders],
                "o_orderdate": [
                    _D0 + datetime.timedelta(days=d) for _, d in orders
                ],
            }
        ),
    )
    got = con.execute(
        REGISTRY["orders_value_recency_skyline"].sql
    ).fetchall()

    base_day = (_D0 - datetime.datetime(1970, 1, 1)).days
    pts = [(v * 100, base_day + d) for v, d in orders]

    def dominated(p, q):
        return (
            q[0] >= p[0]
            and q[1] >= p[1]
            and (q[0] > p[0] or q[1] > p[1])
        )

    from collections import Counter

    cnt = Counter(pts)
    sky = [
        (c, d, n)
        for (c, d), n in cnt.items()
        if not any(dominated((c, d), q) for q in cnt if q != (c, d))
    ]
    sky.sort(key=lambda t: -t[0])
    assert got == sky


@settings(max_examples=30, deadline=None)
@given(
    srcs=st.lists(
        st.sampled_from(["web", "code", "news"]), min_size=1, max_size=8
    )
)
def test_diversity_entropy_leg_semantics(srcs):
    # standalone check of the per-leg entropy SQL shape used by
    # mmr_diversity_gain (q6-per-source-first, COALESCE on empty)
    con = duckdb.connect()
    con.register("pg", pd.DataFrame({"source": srcs}))
    got = con.execute(
        """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM pg GROUP BY source)
SELECT CAST(count(*) AS BIGINT),
       CAST(COALESCE(sum(CAST(round(1000000 * (CAST(n AS DOUBLE) / t.tot)
            * ln(CAST(t.tot AS DOUBLE) / n)) AS BIGINT)), 0) AS BIGINT)
FROM s, (SELECT CAST(sum(n) AS BIGINT) AS tot FROM s) t"""
    ).fetchall()[0]

    from collections import Counter

    cnt = Counter(srcs)
    tot = len(srcs)
    ent = sum(
        _round_away(1000000 * (n / tot) * math.log(tot / n))
        for n in cnt.values()
    )
    assert got == (len(cnt), ent)
