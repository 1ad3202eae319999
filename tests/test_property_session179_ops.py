"""Property-based semantics checks for the session-179 operators."""

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


@settings(max_examples=35, deadline=None)
@given(
    ud=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=300),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_dormancy_spells_match_model(ud):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(ud)),
                "user_id": [u for u, _ in ud],
                "ts": [_D0 + datetime.timedelta(days=d, hours=3) for _, d in ud],
            }
        ),
    )
    got = {
        r[0]: r[1]
        for r in con.execute(
            REGISTRY["dormancy_spell_histogram"].sql
        ).fetchall()
    }

    per: dict[int, set[int]] = {}
    for u, d in ud:
        per.setdefault(u, set()).add(d)
    model: dict[int, int] = {}
    for days in per.values():
        sd = sorted(days)
        for i in range(1, len(sd)):
            gap = sd[i] - sd[i - 1]
            if gap > 28:
                b = gap.bit_length() - 1
                model[b] = model.get(b, 0) + 1
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    names=st.lists(
        st.sampled_from(["steel bolt", "brass nut", "tiny gear", "odd one"]),
        min_size=1,
        max_size=20,
    )
)
def test_catalog_collisions_match_model(names):
    con = duckdb.connect()
    con.register(
        "part",
        pd.DataFrame({"p_partkey": range(len(names)), "p_name": names}),
    )
    got = con.execute(REGISTRY["catalog_name_collisions"].sql).fetchall()

    from collections import Counter

    cnt = Counter(names)
    model = sorted(
        ((n, c) for n, c in cnt.items() if c > 1),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert got == model


_price = st.integers(min_value=1, max_value=40000).map(lambda k: k / 4)


@settings(max_examples=30, deadline=None)
@given(
    li=st.lists(
        st.tuples(_price, st.sampled_from(["R", "N", "A"])),
        min_size=1,
        max_size=30,
    )
)
def test_return_value_share_matches_model(li):
    con = duckdb.connect()
    con.register(
        "lineitem",
        pd.DataFrame(
            {
                "l_extendedprice": [p for p, _ in li],
                "l_discount": [0.0] * len(li),
                "l_returnflag": [f for _, f in li],
            }
        ),
    )
    got = con.execute(REGISTRY["return_value_share"].sql).fetchall()[0]

    rows = [(_round_away(100 * p), f == "R") for p, f in li]
    n = len(rows)
    nr = sum(1 for _, r in rows if r)
    tc = sum(c for c, _ in rows)
    rc = sum(c for c, r in rows if r)
    assert got == (
        n,
        nr,
        (1000000 * nr) // n,
        tc,
        rc,
        (1000000 * rc) // tc,
    )
