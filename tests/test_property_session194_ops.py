"""Property-based semantics checks for the session-194 operators."""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from docix_spark.driver_queries import REGISTRY

_D0 = datetime.datetime(1996, 3, 1)


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10),
            st.sampled_from(["view", "click", "error"]),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_type_share_volatility_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "ts": [_D0 + datetime.timedelta(days=d, hours=4) for d, _ in evs],
                "event_type": [t for _, t in evs],
            }
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(
            REGISTRY["type_share_volatility"].sql
        ).fetchall()
    }

    from collections import Counter

    cells = Counter((d, t) for d, t in evs)
    day_tot = Counter()
    for (d, _), n in cells.items():
        day_tot[d] += n
    shares: dict[str, list[int]] = {}
    for (d, t), n in cells.items():
        shares.setdefault(t, []).append((1000000 * n) // day_tot[d])
    model = {
        t: (len(s), min(s), max(s), max(s) - min(s))
        for t, s in shares.items()
    }
    assert got == model


@settings(max_examples=30, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_first_day_share_matches_model(evs):
    con = duckdb.connect()
    con.register(
        "events",
        pd.DataFrame(
            {
                "event_id": range(len(evs)),
                "user_id": [u for u, _ in evs],
                "ts": [_D0 + datetime.timedelta(days=d, hours=3) for _, d in evs],
            }
        ),
    )
    got = {
        r[0]: r[1]
        for r in con.execute(
            REGISTRY["first_day_share_histogram"].sql
        ).fetchall()
    }

    per: dict[int, list[int]] = {}
    for u, d in evs:
        per.setdefault(u, []).append(d)
    model: dict[int, int] = {}
    for days in per.values():
        n = len(days)
        if n < 3:
            continue
        d0 = min(days)
        k = sum(1 for d in days if d == d0)
        dec = min((10 * k) // n, 9)
        model[dec] = model.get(dec, 0) + 1
    assert got == model
