"""Property-based semantics checks for the session-183 operators."""

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


_D0 = datetime.datetime(1996, 3, 4)  # a Monday
_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(st.integers(min_value=0, max_value=20), _price),
        min_size=1,
        max_size=25,
    )
)
def test_ship_dow_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_shipdate": [
                    _D0 + datetime.timedelta(days=d) for d, _ in li
                ],
                "l_extendedprice": [p for _, p in li],
                "l_discount": [0.0] * len(li),
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["ship_dow_profile"].sql).fetchall()
    }

    model = {d: [0, 0] for d in range(7)}
    for d, p in li:
        dow = d % 7  # _D0 is Monday, 0 = Monday
        model[dow][0] += 1
        model[dow][1] += _round_away(100 * p)
    assert got == {d: tuple(c) for d, c in model.items()}


_word = st.sampled_from(["a", "b", "c"])


@settings(max_examples=30, deadline=None)
@given(
    docs=st.lists(
        st.lists(_word, min_size=1, max_size=6), min_size=1, max_size=12
    )
)
def test_bigram_hapax_matches_model(docs):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(docs)),
                "source": ["web"] * len(docs),
                "text": [" ".join(ws) for ws in docs],
            }
        ),
    )
    got = con.execute(REGISTRY["bigram_hapax_share"].sql).fetchall()

    from collections import Counter

    cnt = Counter(
        f"{ws[i]} {ws[i+1]}" for ws in docs for i in range(len(ws) - 1)
    )
    if not cnt:
        assert got == [] or got[0][0] is None or got[0][0] == 0
        return
    nb = sum(cnt.values())
    nd = len(cnt)
    nh = sum(1 for v in cnt.values() if v == 1)
    assert got[0] == (
        nb,
        nd,
        nh,
        (1000000 * nh) // nd,
        (1000000 * nh) // nb,
    )
